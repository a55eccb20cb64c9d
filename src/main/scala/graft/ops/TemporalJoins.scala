package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in physical operator
  * for: as-of (most-recent-prior) joins and interval/range joins.
  *
  * Both are expressed as compositions of shuffle-friendly primitives —
  * union+window for as-of, bucketized equi-join for range — rather
  * than inequality joins, which Catalyst can only plan as a broadcast
  * nested loop / cartesian product. That keeps shuffle volume linear
  * in the input and survives a 100 TB scale-up; see docs/SCALE.md.
  */
object TemporalJoins {

  /** As-of join: for each probe row, the single build row with the
    * greatest `buildTs` <= `probeTs` for the same `key` (DuckDB/kdb
    * `ASOF JOIN` semantics, inclusive). Unmatched probe rows keep null
    * payload columns (left-outer flavor).
    *
    * `build` must carry exactly (key, buildTs, payload...) columns and
    * be UNIQUE per (key, buildTs) — pre-aggregate if it isn't (at equal
    * timestamps the winner would otherwise be nondeterministic).
    * Payload column names must not collide with probe column names.
    *
    * Plan shape: tag both inputs, union, one hash-partition exchange on
    * `key`, sort within partitions by (ts, side), and a running
    * `last(payload, ignoreNulls)` window frame. ONE shuffle of
    * |probe|+|build| narrow rows, no join node at all — an inequality
    * join here would be a cartesian per key group, and a dense
    * time-bucket equi-join would shuffle the build side once per empty
    * bucket. Build rows sort before probe rows at equal timestamps
    * (side 0 < 1), which yields the inclusive `>=` match.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String,
               probeTs: String = "ts", buildTs: String = "ts"): DataFrame = {
    val payloadCols = build.columns.filter(c => c != key && c != buildTs).toSeq
    require(payloadCols.nonEmpty, "build side needs at least one payload column")
    val probeCols = probe.columns.toSeq
    require(payloadCols.intersect(probeCols).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with probe columns")

    val b = build.select(build(key).as("__k"), build(buildTs).as("__t"),
      struct(payloadCols.map(build(_)): _*).as("__m"), lit(0).as("__side"))
    val p = probe.select(probe(key).as("__k"), probe(probeTs).as("__t"),
      struct(probeCols.map(probe(_)): _*).as("__row"), lit(1).as("__side"))
    val mType = b.schema("__m").dataType
    val rType = p.schema("__row").dataType
    val u = b.withColumn("__row", lit(null).cast(rType))
      .unionByName(p.withColumn("__m", lit(null).cast(mType)))

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(c => col(s"__row.$c")) ++
              payloadCols.map(c => col(s"__match.$c")): _*)
  }

  /** Interval containment join without an equi-key: pairs
    * (intervalId, pointId) where `startCol <= pointCol < endCol`.
    * All three are epoch-micros (or any monotone long) columns.
    *
    * Each interval explodes to the `bucketWidth`-sized buckets it
    * covers; each point computes its single bucket; candidates come
    * from the bucket EQUI-join and the exact range predicate filters
    * them. A point's bucket intersects an interval's bucket list at
    * most once, so no dedup is needed. Shuffle volume is
    * O(|intervals| · ceil(len/bucketWidth) + |points|) — pick
    * bucketWidth ≈ the typical interval length (explosion factor ~2).
    * Catalyst's own plan for the raw inequality predicate is a
    * BroadcastNestedLoopJoin — quadratic at corpus scale.
    */
  def rangeBucketJoin(intervals: DataFrame, points: DataFrame,
                      intervalId: String, startCol: String, endCol: String,
                      pointId: String, pointCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val iv = intervals.select(col(intervalId), col(startCol).as("__s"),
        col(endCol).as("__e"))
      .filter(col("__e") > col("__s"))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col("__s")), bucketOf(col("__e") - 1))))
    val pt = points.select(col(pointId), col(pointCol).as("__p"))
      .withColumn("__bucket", bucketOf(col("__p")))
    iv.join(pt, Seq("__bucket"))
      .filter(col("__p") >= col("__s") && col("__p") < col("__e"))
      .select(col(intervalId), col(pointId))
  }

  /** N-stage conversion funnel (MATCH_RECOGNIZE-shaped sequence
    * detection from plain relational ops): per key, stage 1 is the
    * earliest event of `stages.head`; each later stage is the earliest
    * event of its type STRICTLY after the previous stage's time.
    * Returns one row per key that reached stage 1, with a nullable
    * `t_<stage>` timestamp per stage (null = never reached — and by
    * construction, once a stage is null all later stages are null).
    *
    * Scale shape: one conditional-min aggregation per stage and one
    * equi-join per stage boundary, ALL keyed on `keyCol` — every
    * aggregation output is already hash-partitioned on the join key,
    * so the joins introduce no additional exchange; nothing sorts or
    * windows the raw event stream. */
  def conversionFunnel(events: DataFrame, stages: Seq[String],
                       keyCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "conversionFunnel: need at least one stage")
    require(stages.distinct == stages, "conversionFunnel: duplicate stage types")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_${stages.head}"))
    val perStage = stages.tail.scanLeft(first) { (prev, st) =>
      val prevTs = prev.columns.last
      events.filter(col(typeCol) === st)
        .join(prev.select(col(keyCol), col(prevTs)), Seq(keyCol))
        .filter(col(tsCol) > col(prevTs))
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_$st"))
    }
    perStage.tail.foldLeft(perStage.head)((l, r) => l.join(r, Seq(keyCol), "left"))
  }
}
