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
}
