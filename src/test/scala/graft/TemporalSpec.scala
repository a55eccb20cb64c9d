package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TemporalJoins
import graft.pipeline.{Sampling, TextFunctions}

/** Temporal joins + deterministic sampling + redaction: exact expected
  * values on hand-built fixtures, plus the partition-invariance and
  * parameter-invariance properties the operators promise.
  */
class TemporalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  // (id, key, ts) probe rows and (key, ts, payload) build rows
  private def asofFixture = {
    import spark.implicits._
    val probe = Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
      (4L, "b", 500L), (5L, "c", 10L))
      .toDF("id", "k", "t")
    val build = Seq(
      ("a", 100L, "a@100"), ("a", 150L, "a@150"),
      ("b", 400L, "b@400"), ("b", 600L, "b@600"))
      .toDF("k", "t", "tag")
    (probe, build)
  }

  test("asofJoin picks greatest build ts <= probe ts, inclusive, null when none") {
    val (probe, build) = asofFixture
    val out = TemporalJoins.asofJoin(probe, build, key = "k", probeTs = "t", buildTs = "t")
      .orderBy("id").collect()
    out.map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3))).toSeq shouldBe Seq(
      (1L, "a@100"),  // equal ts matches (inclusive)
      (2L, "a@150"),  // most recent prior, not first
      (3L, null),     // before any build row
      (4L, "b@400"),  // later build row (600) ignored
      (5L, null))     // key with no build rows
  }

  test("asofJoin is partition-invariant") {
    val (probe, build) = asofFixture
    val base = TemporalJoins.asofJoin(probe, build, "k", "t", "t")
      .orderBy("id").collect().toSeq
    val shuffled = TemporalJoins.asofJoin(
      probe.repartition(7), build.repartition(5), "k", "t", "t")
      .orderBy("id").collect().toSeq
    shuffled shouldBe base
  }

  test("rangeBucketJoin equals the brute-force inequality join for any bucket width") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 300L), (4L, 400L, 401L))
      .toDF("iv_id", "s", "e")
    val points = (0L until 500L by 7L).map(t => (t, t)).toDF("pt_id", "pt")
    val brute = intervals.join(points, col("pt") >= col("s") && col("pt") < col("e"))
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 10L, 64L, 1000L)) {
      val got = TemporalJoins.rangeBucketJoin(intervals, points,
        "iv_id", "s", "e", "pt_id", "pt", bucketWidth = w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"bucketWidth=$w: ") { got shouldBe brute }
    }
  }

  test("rangeBucketJoin emits each matching pair exactly once") {
    import spark.implicits._
    // interval spanning many buckets; every in-range point pairs once
    val intervals = Seq((1L, 10L, 1000L)).toDF("iv_id", "s", "e")
    val points = (0L until 1200L by 3L).map(t => (t, t)).toDF("pt_id", "pt")
    val got = TemporalJoins.rangeBucketJoin(intervals, points,
      "iv_id", "s", "e", "pt_id", "pt", bucketWidth = 50L).collect()
    got.length shouldBe got.map(r => (r.getLong(0), r.getLong(1))).toSet.size
    got.length shouldBe (0L until 1200L by 3L).count(t => t >= 10L && t < 1000L)
  }

  test("RangeJoinRewrite: inequality join becomes a bucketed equi-join, bit-identical results") {
    import spark.implicits._
    import graft.plans.RangeJoinRewrite
    val intervals = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 300L), (4L, 390L, 391L))
      .toDF("iv_id", "s", "e")
    val points = (0L until 400L by 7L).map(t => (t, t)).toDF("pt_id", "pt")
    def query() = intervals
      .join(points, col("pt") >= col("s") && col("pt") < col("e"))
      .select("iv_id", "pt_id")
    def results(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.conf.set(RangeJoinRewrite.WidthKey, "0")
    val baselinePlan = query().queryExecution.executedPlan.toString
    baselinePlan should include("BroadcastNestedLoopJoin") // what Catalyst does unaided
    val expected = results(query())

    if (!spark.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.WidthKey, "64")
    try {
      val rewritten = query()
      val plan = rewritten.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should include("Generate")
      results(rewritten) shouldBe expected
    } finally spark.conf.set(RangeJoinRewrite.WidthKey, "0")
  }

  test("RangeJoinRewrite: DateType and TimestampType bands bucketize without manual epoch prep") {
    import spark.implicits._
    import graft.plans.RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    val intervals = Seq((1L, "2024-01-01", "2024-02-10"), (2L, "2024-03-05", "2024-03-06"))
      .toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = (0 until 120).map(d => (d.toLong, s"2024-01-01"))
      .toDF("pt_id", "base")
      .select(col("pt_id"), date_add(col("base").cast("date"), col("pt_id").cast("int")).as("d"))
    def query() = intervals.join(points, col("d") >= col("s") && col("d") < col("e"))
      .select("iv_id", "pt_id")
    spark.conf.set(RangeJoinRewrite.WidthKey, "0")
    val expected = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    expected.size shouldBe (40 + 1) // iv1 covers days 0..39, iv2 day 64
    spark.conf.set(RangeJoinRewrite.WidthKey, "30") // 30-day buckets
    try {
      val rewritten = query()
      val plan = rewritten.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should include("Generate")
      rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
    } finally spark.conf.set(RangeJoinRewrite.WidthKey, "0")
  }

  test("RangeJoinRewrite leaves equi-keyed and one-sided-inequality joins alone") {
    import spark.implicits._
    import graft.plans.RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.WidthKey, "64")
    try {
      val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "va")
      val b = Seq((1L, 5L), (2L, 25L)).toDF("k2", "vb")
      // equi conjunct present -> hash join, no Generate
      val equi = a.join(b, col("k") === col("k2") && col("va") >= col("vb"))
      equi.queryExecution.executedPlan.toString should not include "Generate"
      equi.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L) // (1,10)>= (1,5)
      // one-sided inequality: not a band, untouched
      val oneSided = a.join(b, col("va") < col("vb"))
      oneSided.queryExecution.executedPlan.toString should not include "Generate"
      oneSided.count() shouldBe 2L // (10,25),(20,25)
    } finally spark.conf.set(RangeJoinRewrite.WidthKey, "0")
  }

  test("stratifiedHashSample: deterministic, monotone in rate, respects strata") {
    import spark.implicits._
    val docs = (0 until 400).map(i => (i.toLong, if (i % 2 == 0) "en" else "de", s"text body $i"))
      .toDF("doc_id", "lang", "text")
    def sample(rates: Map[String, Int], default: Int) =
      Sampling.stratifiedHashSample(docs, col("lang"), col("text"), rates, default)
        .select("doc_id").as[Long].collect().toSet
    val s1 = sample(Map("en" -> 10), 50)
    val s2 = sample(Map("en" -> 10), 50)
    s1 shouldBe s2 // reproducible, no RNG
    // repartitioning cannot change membership
    val s3 = Sampling.stratifiedHashSample(docs.repartition(13), col("lang"), col("text"),
      Map("en" -> 10), 50).select("doc_id").as[Long].collect().toSet
    s3 shouldBe s1
    // a higher rate strictly grows the sample and contains the lower one
    val wide = sample(Map("en" -> 60), 90)
    s1.subsetOf(wide) shouldBe true
    wide.size should be > s1.size
  }

  test("redact applies rules in order") {
    import spark.implicits._
    val out = Seq("id 123 mail a@b.c").toDF("s")
      .select(TextFunctions.redact(col("s"), Seq(
        "[0-9]+" -> "<NUM>",
        "<NUM> mail" -> "<NUMMAIL>")).as("r"))
      .as[String].head()
    out shouldBe "id <NUMMAIL> a@b.c" // second rule sees the first rule's output
  }

  test("q148 MAD anomaly: medians match the brute-force lower median, flags only >3·MAD days") {
    val rows = SparkEntry.queries("q148_mad_anomaly")(spark, "/root/testdata/sf0.001").collect()
    rows should not be empty
    // brute-force per type from the raw (day, c) pairs the query emits
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byDay = rs.sortBy(_.getString(1))
      val cs = byDay.map(_.getLong(2))
      def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val med = lowerMedian(cs.toSeq)
      val mad = lowerMedian(cs.map(c => math.abs(c - med)).toSeq)
      byDay.foreach { r =>
        r.getLong(3) shouldBe med
        r.getLong(4) shouldBe mad
        r.getLong(5) shouldBe (if (math.abs(r.getLong(2) - med) > 3 * mad) 1L else 0L)
      }
    }
  }
}
