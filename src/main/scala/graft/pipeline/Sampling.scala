package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training corpora.
  *
  * All sampling here is content-hash bucketing, not RNG: a row is in
  * or out based on `md5(content) % 100`, so samples are reproducible
  * across runs, engines, partitionings and cluster sizes, and a
  * re-run after appending data keeps every previously-selected row
  * (the property train/val/test splits need — `rand()` has none of
  * these). Same convention as the q57 split.
  */
object Sampling {

  /** Hash bucket in [0, 100) from the row's content column. */
  def hashBucket(content: Column): Column =
    pmod(conv(substring(md5(content.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(100L))

  /** Stratified deterministic sample: per-stratum percentage rates
    * (0..100), `defaultRate` for strata not in `rates`. Pure filter —
    * no shuffle, no RNG, fully pushdown-friendly: at 100 TB this is a
    * scan with a cheap predicate, nothing more. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, contentCol: Column,
                           rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(contentCol))
      .filter(col("bucket") < rate)
  }
}
