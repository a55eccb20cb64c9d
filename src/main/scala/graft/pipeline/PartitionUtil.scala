package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Skew-resistant aggregation: pre-aggregate on (key, salt) so one
    * hot key spreads over `buckets` reducers, then combine. The salt
    * never affects the result — partials re-aggregate — so any cheap
    * per-row value works. `aggs` must be re-aggregatable (sum/count/
    * min/max); this is the manual form of what AQE's skew handling
    * can't do for aggregations. */
  def saltedAggregate(df: DataFrame, key: String, buckets: Int,
                      aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partials = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1 + "_p"),
        aggs.tail.map { case (n, c) => c.as(n + "_p") }: _*)
    partials.groupBy(col(key))
      .agg(reagg(aggs.head._1, aggs.head._2), aggs.tail.map { case (n, c) => reagg(n, c) }: _*)
  }

  /** Choose the re-aggregation of a partial: counts re-sum, everything
    * else reapplies (sum/min/max are associative). */
  private def reagg(name: String, original: Column): Column = {
    val expr = original.toString.toLowerCase
    if (expr.startsWith("count")) sum(col(name + "_p")).as(name)
    else if (expr.startsWith("min")) min(col(name + "_p")).as(name)
    else if (expr.startsWith("max")) max(col(name + "_p")).as(name)
    else sum(col(name + "_p")).as(name)
  }

  /** Skew-resistant equi-join: the big (possibly skewed) side gets a
    * salt column; the small side is replicated once per salt value.
    * A hot key's rows land on `buckets` tasks instead of one. Input
    * row multiplication is |small|·buckets — keep the replicated side
    * small (it usually rides along with a broadcast anyway; this path
    * is for when the small side exceeds the broadcast threshold but a
    * hot key still melts a sort-merge task). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val smallS = small.withColumn("_salt", explode(typedLit((0L until buckets.toLong).toSeq)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
