package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.pipeline.PartitionUtil

/** The scale techniques from docs/SCALE.md, asserted on real plans:
  * salting produces identical results to the plain path, and bucketed
  * tables join without an exchange. */
class ScaleTechniquesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  private def skewed = {
    import spark.implicits._
    // one hot key (0) with 10k rows, 100 cold keys with 10 each
    ((0 until 10000).map(i => (0L, i.toDouble)) ++
      (1 to 100).flatMap(k => (0 until 10).map(i => (k.toLong, i.toDouble))))
      .toDF("k", "v")
  }

  test("saltedAggregate equals plain groupBy on skewed keys") {
    import spark.implicits._
    import PartitionUtil.SaltedAgg
    val plain = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"), max(col("v")).as("mx"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val salted = PartitionUtil.saltedAggregate(skewed, "k", buckets = 8,
        SaltedAgg.count("n"), SaltedAgg.sum("s", col("v")), SaltedAgg.max("mx", col("v")))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    salted shouldBe plain
  }

  test("saltedAggregate avg re-aggregates as sum/count, not sum-of-avgs") {
    import spark.implicits._
    import PartitionUtil.SaltedAgg
    // integer-valued doubles: partial sums are exact, so salted avg
    // must equal the plain avg bit-for-bit. The old toString-dispatch
    // fell through to sum() for avg and returned |buckets|× the value.
    val plain = skewed.groupBy(col("k")).agg(avg(col("v")).as("a"))
      .as[(Long, Double)].collect().sortBy(_._1)
    val salted = PartitionUtil.saltedAggregate(skewed, "k", buckets = 8,
        SaltedAgg.avg("a", col("v")))
      .as[(Long, Double)].collect().sortBy(_._1)
    salted shouldBe plain
  }

  test("saltedJoin equals plain join on skewed keys") {
    import spark.implicits._
    val dim = (0L to 100L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy(col("name"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().sortBy(_._1)
    val salted = PartitionUtil.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().sortBy(_._1)
    salted shouldBe plain
  }

  test("saltedWindow equals a whole-partition window, with no Window/partition sort in the plan") {
    import spark.implicits._
    import PartitionUtil.SaltedAgg
    import org.apache.spark.sql.expressions.Window
    // 90%-one-key stream: the window route sorts and buffers 10k rows
    // on ONE reducer; the salted route pre-aggregates the hot key over
    // 8 reducers and joins the per-key row back
    val w = Window.partitionBy("k")
    val plain = skewed
      .select(col("k"), col("v"), count(lit(1)).over(w).as("n"),
        max(col("v")).over(w).as("mx"))
      .as[(Long, Double, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val saltedDf = PartitionUtil.saltedWindow(skewed, "k", buckets = 8,
      SaltedAgg.count("n"), SaltedAgg.max("mx", col("v")))
      .select(col("k"), col("v"), col("n"), col("mx"))
    val salted = saltedDf
      .as[(Long, Double, Long, Double)].collect().sortBy(r => (r._1, r._2))
    salted shouldBe plain
    // the salted plan must contain NO window operator (nothing sorts
    // or buffers a whole partition on one task)
    val plan = saltedDf.queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("saltedTopK equals a rank window on a 90%-one-key table, with no Window in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 90%-one-key: key 0 holds 9000 rows, keys 1..10 hold 100 each;
    // ord is a deterministic pseudo-hash with collisions (ties broken
    // by id, which is unique)
    val rows = ((0 until 9000).map(i => (0L, (i * 2654435761L) % 997L, i.toLong)) ++
      (1 to 10).flatMap(k => (0 until 100).map(i =>
        (k.toLong, (i * 40503L) % 97L, (k * 100000 + i).toLong))))
      .toDF("k", "ord", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("ord"), col("id"))
    val plain = rows.withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= 7)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val saltedDf = PartitionUtil.saltedTopK(rows, "k", k = 7,
      ordCol = "ord", idCol = "id", buckets = 8)
    val salted = saltedDf.select(col("k"), col("ord"), col("id"), col("pos"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    salted shouldBe plain
    // no task sorts or buffers a whole key: no Window operator anywhere
    saltedDf.queryExecution.executedPlan.toString should not include "Window"
    // partition-invariant
    val re = PartitionUtil.saltedTopK(rows.repartition(13), "k", k = 7,
        ordCol = "ord", idCol = "id", buckets = 8)
      .select(col("k"), col("ord"), col("id"), col("pos"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    re shouldBe plain
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // salting (q68) is the PLANNED answer to skew; AQE's skew-join is
    // the RUNTIME one. Force the sort-merge path and drop the skew
    // thresholds so the hot key (0: 10k rows vs 10 per cold key)
    // qualifies, then check the final adaptive plan re-planned it.
    val dim = (0 to 100).map(k => (k.toLong, s"name_$k")).toDF("k", "name")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sum(v) keeps the 8-byte double payload through the join —
      // column pruning would otherwise shrink the hot partition's
      // shuffle blocks below the skew threshold (10k identical keys
      // LZ4-compress to almost nothing)
      val joined = skewed.join(dim, Seq("k"))
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      joined.collect().map(_.getLong(1)).sum shouldBe 11000L
      val plan = joined.queryExecution.executedPlan.toString
      plan should include ("SortMergeJoin")
      plan should include ("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("z-order interleave: exact Morton values, order-preserving per axis") {
    import graft.functions.ZOrderUtil._
    interleave(1, 0) shouldBe 1L
    interleave(0, 1) shouldBe 2L
    interleave(3, 5) shouldBe 39L // spread(3)=5, spread(5)=17, 5 | 17<<1
    interleave(0x7FFFFFFFL, 0x7FFFFFFFL) shouldBe 0x3FFFFFFFFFFFFFFFL
    // monotone along each axis within a fixed other coordinate
    (0L until 63L).foreach { x =>
      interleave(x, 7) should be < interleave(x + 1, 7)
      interleave(7, x) should be < interleave(7, x + 1)
    }
  }

  test("z-order layout prunes files on BOTH axes; a single-column sort serves only its own") {
    import spark.implicits._
    graft.functions.ZOrderExpression.register(spark)
    // 64×64 grid, one row per cell; 16 files of ~256 rows each → the
    // z layout makes each file a ~16×16 tile, the x sort an x-stripe
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_test").toString
    grid.withColumn("z",
        graft.functions.ZOrderExpression.zOrder(col("x"), col("y")))
      .repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .drop("z").write.mode("overwrite").parquet(s"$base/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$base/x")
    // files a reader must open for a predicate = files whose per-file
    // min/max envelope (what parquet footers store) overlaps it
    def filesOverlapping(dir: String, cCol: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min(col(cCol)).as("mn"), max(col(cCol)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    // y-range predicate: the x-sorted layout cannot prune AT ALL
    // (every x-stripe spans all y); the z tiles keep it to the tile
    // rows that intersect y∈[8,15]
    val zHit = filesOverlapping(s"$base/z", "y", 8, 15)
    val xHit = filesOverlapping(s"$base/x", "y", 8, 15)
    xHit shouldBe 16L
    zHit should be <= 6L
    // x-range predicate: both layouts prune
    filesOverlapping(s"$base/x", "x", 8, 15) should be <= 4L
    filesOverlapping(s"$base/z", "x", 8, 15) should be <= 6L
    // layout never changes answers
    val a = spark.read.parquet(s"$base/z")
      .filter(col("x").between(8, 15) && col("y").between(8, 15)).count()
    a shouldBe 64L
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "orders")
    val li = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "lineitem")
    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$dir/b_orders").saveAsTable("b_orders")
    li.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$dir/b_lineitem").saveAsTable("b_lineitem")
    // force the non-broadcast path so bucketing is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      joined.collect().map(_.getLong(1)).sum shouldBe li.count()
      // neither bucketed side re-shuffles on its join key: the only
      // exchange in the plan is the aggregation's on o_orderstatus
      val plan = joined.queryExecution.executedPlan.toString
      plan should include ("SortMergeJoin")
      plan should not include "Exchange hashpartitioning(l_orderkey"
      plan should not include "Exchange hashpartitioning(o_orderkey"
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE b_orders")
      spark.sql("DROP TABLE b_lineitem")
    }
  }

  test("BPE pair-count round: partial+final hash agg, in-array pair derivation, no Window") {
    import spark.implicits._
    val sep = graft.pipeline.Bpe.Sep
    val words = Seq(("banana", 3L), ("apple", 2L), ("kiwi", 5L))
      .toDF("word", "freq")
      .withColumn("seg", regexp_replace(col("word"), "(?s)(.)", s"$sep$$1$sep"))
    val pairs = graft.pipeline.Bpe.pairCounts(words)
    val got = pairs.as[(String, String, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    got(("a", "n")) shouldBe 6L   // banana: (a,n) twice, freq 3
    got(("p", "p")) shouldBe 2L
    got(("k", "i")) shouldBe 5L   // kiwi: k-i and w-i are distinct pairs
    got(("w", "i")) shouldBe 5L
    val plan = pairs.queryExecution.executedPlan.toString
    // map-side combine: a partial and a final HashAggregate pair
    "HashAggregate".r.findAllIn(plan).size should be >= 2
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("bloomSemiJoin equals a plain semi join; the Bloom never false-negatives and actually prunes") {
    import spark.implicits._
    import graft.pipeline.PartitionUtil
    val bits = 1 << 12
    val fact = (0L until 20000L).map(i => (i % 1000L, i)).toDF("fk", "payload")
    val dim = (0L until 1000L by 13L).map(k => Tuple1(k)).toDF("dk") // 77 of 1000 keys
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .as[(Long, Long)].collect().sorted
    val bloomed = PartitionUtil.bloomSemiJoin(fact, dim, "fk", "dk", bits = bits)
      .as[(Long, Long)].collect().sorted
    bloomed shouldBe plain
    // no false negatives: every true key passes the probe predicate
    val bf = PartitionUtil.bloomFilterArray(dim.select(col("dk").as("k")), "k", bits, 3)
    val survivors = fact.crossJoin(broadcast(bf))
      .filter(PartitionUtil.bloomMightContain(col("bf"), col("fk"), bits, 3))
      .count()
    survivors should be >= plain.length.toLong // superset of matches …
    survivors should be < fact.count()         // … that still prunes hard
  }

  test("bloomSemiJoin survives shared lineage (semi-joining a table against a view of itself)") {
    import spark.implicits._
    import graft.pipeline.PartitionUtil
    // fact and dim derive from the SAME DataFrame — the case where a
    // fact(k) === dim(k) join condition trips Spark's ambiguous-self-
    // join detection; the name-based internal alias must not
    val base = (0L until 5000L).map(i => (i % 200L, i)).toDF("fk", "payload")
    val dim = base.filter(col("payload") % 7L === 0L).select(col("fk").as("dk"))
    val got = PartitionUtil.bloomSemiJoin(base, dim, "fk", "dk", bits = 1 << 12)
      .as[(Long, Long)].collect().sorted
    val want = base.join(dim.distinct(), col("fk") === col("dk"), "left_semi")
      .as[(Long, Long)].collect().sorted
    got shouldBe want
  }

  test("observe(): the q150 constraint sweep rides a production job for FREE (zero extra scans)") {
    // at 100 TB the cheapest DQ audit is no audit job at all: attach
    // the conditional-agg metrics to a query the pipeline already
    // runs — Spark accumulates them during that job's own scan
    val li = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "lineitem")
    val obs = org.apache.spark.sql.Observation("dq")
    val audited = li.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("qty_range"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5, 1L)
        .otherwise(0L)).as("discount_range"))
    // the "production job": a real aggregation the pipeline needs anyway
    val revenue = audited.groupBy(col("l_returnflag")).count().collect()
    revenue should not be empty
    val got = obs.get
    // ground truth from an explicit scan
    val want = li.agg(
      count(lit(1)),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L).otherwise(0L)),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5, 1L).otherwise(0L))).head()
    got("rows") shouldBe want.getLong(0)
    got("qty_range") shouldBe want.getLong(1)
    got("discount_range") shouldBe want.getLong(2)
  }
}
