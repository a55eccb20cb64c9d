package graft.pipeline

import org.apache.spark.sql.DataFrame

object PartitionUtil {
  /** Ensure a DataFrame has at least the cluster's default parallelism
    * in partitions before CPU-heavy per-row / all-pairs work.
    *
    * At 100 TB inputs arrive in thousands of file splits and this is a
    * no-op (no shuffle inserted); the repartition only fires for inputs
    * small enough to land in fewer splits than there are cores — the
    * case where an all-pairs join would otherwise run on 2 of 32
    * threads. */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
