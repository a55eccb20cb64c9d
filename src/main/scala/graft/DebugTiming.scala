package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc wall-clock profiling for individual operators (not part of
  * the driver contract; Bench is the official probe). Usage:
  * `sbt "runMain graft.DebugTiming [sfDir]"`. */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = graft.queries.QueryDsl.t(spark, dir, "documents")
    import graft.pipeline.{Dedup, Multimodal}

    time("q31-cold")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    time("q31-warm")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    val media = Multimodal.asMediaTable(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")),
      "doc_id", "payload", "image", "raw")
    time("q55-resize+features")(Multimodal.extractFeatures(
      Multimodal.resizeStage(media, 24, 24)).toDF().count())
    val emb = graft.queries.QueryDsl.t(spark, dir, "embeddings")
    time("q59-dedup-groups")(Dedup.dedupGroups(
      Dedup.embeddingNearDupLsh(emb, 0.25, 8, 4, 64, 42L))
      .groupBy(col("rep")).agg(count(lit(1)).as("n")).count())
    (1 to 3).foreach { i =>
      time(s"q92-gram-$i")(graft.pipeline.Similarity.gramMatrix(emb).count())
    }
    spark.stop()
  }
}
