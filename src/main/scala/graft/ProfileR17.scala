package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc controlled-A/B profiling for the round-17 optimization pass
  * (not part of the driver contract; Bench is the official probe).
  *
  * Usage:
  *   sbt "runMain graft.ProfileR17 <sfDir> ab <confKey> <mode1,mode2> <query...>"
  *     — run the named declared queries under each value of a session
  *       conf knob, INTERLEAVED within every pass so box drift hits
  *       all modes equally; reports per (query, mode) mins.
  *   sbt "runMain graft.ProfileR17 <sfDir> grloop"
  *     — pagerank-family per-round fixed-cost dissection.
  *   sbt "runMain graft.ProfileR17 <sfDir> bench <query...>"
  *     — plain mini-bench (Bench methodology on a subset).
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val section = args.drop(1).headOption.getOrElse("bench")
    val rest = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    section match {
      case "ab" =>
        val confKey = rest(0)
        val modes = rest(1).split(",").toSeq
        val qs = SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => rest.drop(2).contains(n) }
        require(qs.nonEmpty, "no matching queries")
        val passes = 3
        val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
        for (pass <- 0 to passes; mode <- modes; (n, fn) <- qs) {
          spark.conf.set(confKey, mode)
          spark.sparkContext.setJobDescription(s"ab $n $mode pass$pass")
          val t = time { try force(fn(spark, dir)) catch { case e: Throwable =>
            println(s"PROFILE ERROR $n $mode: ${e.getMessage.take(200)}") } }
          if (pass > 0) // pass 0 = warm-up
            acc((n, mode)) = t :: acc.getOrElse((n, mode), Nil)
        }
        for ((n, _) <- qs; mode <- modes) {
          val ts = acc((n, mode))
          println(f"PROFILE ab $n%-30s $mode%-12s min=${ts.min}%.3f " +
            f"med=${ts.sorted.apply(ts.size / 2)}%.3f all=" +
            ts.reverse.map(t => f"$t%.3f").mkString(","))
        }

      case "bench" =>
        val qs = SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => rest.contains(n) }
        qs.foreach { case (_, fn) =>
          try force(fn(spark, dir)) catch { case _: Throwable => () } }
        def pass(): Map[String, Double] = qs.map { case (n, fn) =>
          n -> time { try force(fn(spark, dir)) catch { case _: Throwable => () } }
        }.toMap
        val p1 = pass(); val p2 = pass()
        qs.foreach { case (n, _) =>
          println(f"PROFILE bench $n: ${math.min(p1(n), p2(n))}%.3f s") }

      case "grloop" =>
        // where do the ~240 ms/iteration of the pagerank-family loops
        // go? Time a k-round chained fast-path loop for k = 0, 2, 5,
        // 10 under variants; the slope is the per-round cost.
        import graft.pipeline.Graph
        import graft.queries.QueryDsl.t
        val li = t(spark, dir, "lineitem")
        val co = Graph.supplierCooccurrence(li)
        val ew0 = co.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        val outw = ew0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        val ew = ew0.join(outw, Seq("src"))
          .select(col("src"), col("dst"), col("w"), col("ow"))
          .localCheckpoint().coalesce(1)
        val n = ew.select(col("src")).distinct().count()
        val base = (3L * Graph.Scale) / (20L * n)
        def loop(k: Int): Unit = {
          var rank = ew.select(col("src").as("v")).distinct()
            .select(col("v"), lit(Graph.Scale / n).as("rank"))
          for (i <- 1 to k) {
            val contrib = ew
              .join(rank.select(col("v").as("src"), col("rank")), Seq("src"))
              .select(col("dst").as("v"), expr("(rank * w) div ow").as("c"))
              .groupBy(col("v")).agg(sum(col("c")).as("sc"))
            rank = contrib.select(col("v"),
              (lit(base) + expr("(17 * sc) div 20")).as("rank"))
            if (i % 5 == 0) rank = rank.localCheckpoint()
          }
          force(rank)
        }
        def variant(label: String)(setup: => Unit)(teardown: => Unit): Unit = {
          setup
          loop(2) // warm
          for (k <- Seq(0, 2, 5, 10, 10)) {
            val t = time(loop(k))
            println(f"PROFILE grloop $label k=$k%-3d ${t}%.3f s")
          }
          teardown
        }
        val defShuf = spark.conf.get("spark.sql.shuffle.partitions")
        variant("baseline") {} {}
        variant("noaqe") { spark.conf.set("spark.sql.adaptive.enabled", "false") } {
          spark.conf.set("spark.sql.adaptive.enabled", "true") }
        variant("shuf1") { spark.conf.set("spark.sql.shuffle.partitions", "1") } {
          spark.conf.set("spark.sql.shuffle.partitions", defShuf) }
        variant("noaqe-shuf1") {
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          spark.conf.set("spark.sql.shuffle.partitions", "1")
        } {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", defShuf)
        }
        variant("baseline2") {} {}

      case other =>
        println(s"unknown section $other")
    }
    spark.stop()
  }
}
