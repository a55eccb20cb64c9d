package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke over the declared query inventory at sf0.001 (the full
  * hash-exact check is the driver's DuckDB gate + tools/verify_local.py;
  * here we assert the contract shape: every query answers, ordered
  * output, non-degenerate row counts). */
class RelationalSmokeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() answers with rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every declared query answers at sf0.001") {
    val counts = SparkEntry.queries.map { case (name, q) =>
      name -> q(spark, sf).count()
    }
    val empty = counts.filter(_._2 == 0L).keys.toList.sorted
    withClue(s"queries with zero rows: $empty") {
      // embedding_neardup may legitimately be sparse at tiny sf, the
      // k=12 core of the 10-supplier sf0.001 tie graph (max degree
      // 9) is legitimately empty, and that same tiny graph has no
      // w >= 24 strong ties for link prediction to wedge over (q145
      // produces 100 rows at the sf0.01 gate); all others must
      // produce rows
      empty.filterNot(Set("q36_embedding_neardup", "q136_kcore",
        "q145_link_prediction")) shouldBe Nil
    }
  }

  test("oracleSql only names declared queries, aliases match") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.subsetOf(qs) shouldBe true
    // every oracle-checked query's output columns appear in its SQL text
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).schema.fieldNames
      cols.foreach { c =>
        withClue(s"$name missing alias $c in oracle sql") {
          sql.toLowerCase should include (c.toLowerCase)
        }
      }
    }
  }

  test("built-in HLL approx distinct lands within 5% of exact (engine-specific, off-gate)") {
    import org.apache.spark.sql.functions._
    val got = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
           countDistinct(col("l_partkey")).as("e"))
      .collect()
    got.length should be > 0
    got.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      withClue(s"flag ${r.getString(0)}: hll $a vs exact $e: ") {
        math.abs(a - e) / e should be < 0.05
      }
    }
  }

  test("KMV sketch: buffer semantics exact, estimate within 3/sqrt(k) of truth, partition-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // buffer semantics against a reference model
    val agg = new graft.functions.KmvAggregator(5)
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 7L, 5L, 4L, 6L)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    buf shouldBe Vector(1L, 2L, 3L, 4L, 5L) // 5 smallest DISTINCT
    // merge == reduce over the concatenation, any split point
    for (cut <- 0 to xs.length) {
      val (l, r) = xs.splitAt(cut)
      agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                r.foldLeft(agg.zero)(agg.reduce)) shouldBe buf
    }
    // end-to-end estimate on n known-distinct values, k = 64
    val n = 20000
    val kmv = udaf(new graft.functions.KmvAggregator(64))
    val h62 = udf { v: String =>
      graft.pipeline.Dedup.mix64(graft.pipeline.Dedup.fnv64(v)) >>> 2
    }
    def run(parts: Int): (Long, Long) = {
      val sk = (1 to n).map(i => s"v$i").toDF("v").repartition(parts)
        .agg(kmv(h62(col("v"))).as("sk"))
        .select(element_at(col("sk"), -1)).head().getLong(0)
      val est = (BigInt(63) * BigInt(2).pow(62) / sk).toLong
      (sk, est)
    }
    val (sk8, est) = run(8)
    math.abs(est.toDouble - n) / n should be < (3.0 / math.sqrt(64.0))
    run(1)._1 shouldBe sk8 // map-side combine owes nothing to layout
    run(32)._1 shouldBe sk8
  }

  test("KMV sketch merge: the linear two-pointer union equals element-wise " +
      "inserts (round-16 internals)") {
    // the round-16 rewrite replaced fold-of-inserts with a sorted
    // two-pointer merge in both aggregators' hot paths; pin exact
    // buffer equality against the element-wise reference on seeded
    // random inputs, including duplicates across and within sketches
    val rnd = new scala.util.Random(4242)
    for (k <- Seq(1, 2, 5, 32); trial <- 1 to 20) {
      val agg = new graft.functions.KmvAggregator(k)
      val mrg = new graft.functions.KmvMergeAggregator(k)
      val xs = Seq.fill(rnd.nextInt(80))(rnd.nextInt(40).toLong)
      val ys = Seq.fill(rnd.nextInt(80))(rnd.nextInt(40).toLong)
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = ys.foldLeft(agg.zero)(agg.reduce)
      val ref = (xs ++ ys).distinct.sorted.take(k)
      withClue(s"k=$k trial=$trial: ") {
        agg.merge(a, b).toList shouldBe ref
        mrg.reduce(a.toArray, b.toArray).toList shouldBe ref
        mrg.reduce(mrg.zero, a.toArray).toList shouldBe a.toList
      }
    }
  }

  test("HDR quantile sketch brackets the exact percentile_disc value") {
    // the q147 contract: for every (group, p) the reported bucket
    // [est_lo, est_hi] CONTAINS the true percentile — the bounded-
    // error guarantee HdrHistogram bucketing provides by construction
    val rows = SparkEntry.queries("q147_hdr_quantiles")(spark, sf).collect()
    rows should not be empty
    val cents = graft.queries.QueryDsl.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "CAST(floor(l_extendedprice * 100) AS BIGINT) AS x")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (g, p, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val xs = cents(g)
      // percentile_disc: smallest value with rank covering p% of n
      val exact = xs(((p * xs.length + 99) / 100 - 1).toInt.max(0))
      withClue(s"$g p$p: [$lo, $hi] vs exact $exact: ") {
        exact should be >= lo
        exact should be <= hi
      }
      (hi - lo).toDouble / lo.toDouble should be <= (1.0 / 16.0) // 2^-(5-1) relative width
    }
  }
}
