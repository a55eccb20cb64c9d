package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.core._

/** The registered UDF surface, mirroring the reference's
  * `SQLFunctions.registerImageJ` + `registerDebugFunctions`
  * (SQLFunctions.scala:196-223, 277-285) — every name in SURVEY §2.7,
  * including `showmetadata`, which the reference defines but forgets to
  * register (SQLFunctions.scala:241).
  *
  * Images cross the UDF boundary as `SparkImage` structs (product
  * encoder), not opaque Java-serialized blobs like the reference's
  * `PipUDT` (PipUDT.scala:57-69 — flagged "really inefficient" by its
  * own author), so Tungsten keeps the columns unserialized.
  */
object ImageFunctions {

  // Column-API variants (usable without registration)
  val runUdf = udf((img: SparkImage, cmd: String) => Kernels.run(img, cmd))
  val run2Udf = udf((img: SparkImage, cmd: String, args: String) => Kernels.run(img, cmd, args))
  val statsUdf = udf((img: SparkImage) => Kernels.stats(img))
  val statsMapUdf = udf((img: SparkImage) => Kernels.stats(img).toMap)
  val meanUdf = udf((img: SparkImage) => Kernels.stats(img).mean)
  val subtractUdf = udf((a: SparkImage, b: SparkImage) => Kernels.subtract(a, b))
  val averageUdf = udf((a: SparkImage, b: SparkImage, r: Double) => Kernels.average(a, b, r))
  val appendUdf = udf((a: SparkImage, b: SparkImage) => Kernels.appendStack(a, b))
  val scaleUdf = udf((img: SparkImage, f: Double) => Kernels.scale(img, f))
  val histUdf = udf((img: SparkImage) => Kernels.histogramAuto(img))
  val hist3Udf = udf((img: SparkImage, min: Double, max: Double, bins: Int) =>
    Kernels.histogram(img, min, max, bins))
  val histCompareUdf = udf((a: SparkImage, b: SparkImage) =>
    Kernels.histogramAuto(a).distance(Kernels.histogramAuto(b)))
  val toArrayUdf = udf((img: SparkImage) => Kernels.toArray3D(img))
  val nslicesUdf = udf((img: SparkImage) => img.slices)
  // per-slice means, in slice order — the order-sensitive probe a
  // stack round-trip oracle needs (a whole-stack mean can't tell a
  // permuted stack from the original)
  val sliceMeansUdf = udf { img: SparkImage =>
    val px = img.toDoubles
    val n = img.width * img.height
    (0 until img.slices).map { s =>
      var sum = 0.0; var i = s * n
      val end = i + n
      while (i < end) { sum += px(i); i += 1 }
      sum / n
    }
  }
  val runtableUdf = udf((img: SparkImage, cmd: String, args: String) =>
    Kernels.runTable(img, cmd, args).toMap)
  val runrowUdf = udf((img: SparkImage, cmd: String, args: String) =>
    Kernels.runTable(img, cmd, args).firstRow)
  val replayUdf = udf((img: SparkImage, log: String) => Kernels.replayLog(img, log))
  val shapeUdf = udf((img: SparkImage) => {
    val t = Kernels.analyzeParticles(img)
    t.header.mkString("\t") + "\n" +
      t.rows.take(5).map(_.mkString("\t")).mkString("\n")
  })

  def run(img: Column, cmd: Column): Column = runUdf(img, cmd)
  def run2(img: Column, cmd: Column, args: Column): Column = run2Udf(img, cmd, args)
  def stats(img: Column): Column = statsUdf(img)

  /** Register the full SQL-name surface on a session. */
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.udf
    r.register("run", runUdf)
    r.register("run2", run2Udf)
    r.register("runtable", runtableUdf)
    r.register("runmap", runtableUdf) // runmap == runtable.toMap (SQLFunctions.scala:62-65)
    r.register("runrow", runrowUdf)
    r.register("stats", statsMapUdf)
    r.register("strstats", udf((img: SparkImage) => Kernels.stats(img).toMap.toSeq
      .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")))
    r.register("mean", meanUdf)
    r.register("shape", shapeUdf)
    r.register("nslices", nslicesUdf)
    r.register("slicemeans", sliceMeansUdf)
    r.register("subtract", subtractUdf)
    r.register("scale", scaleUdf)
    r.register("hist", histUdf)
    r.register("hist3", hist3Udf)
    r.register("hist_compare", histCompareUdf)
    r.register("toarray", toArrayUdf)
    // debug surface (SQLFunctions.scala:277-285)
    r.register("tostring", udf((s: String) => s))
    r.register("fromtable", udf((m: Map[String, Seq[Double]], c: String) =>
      m.getOrElse(c, Seq.empty[Double])))
    r.register("listplugins", udf(() => Kernels.listPlugins))
    r.register("listcommands", udf(() => Kernels.listCommands))
    r.register("showcalibration", udf((img: SparkImage) => img.meta.toString))
    r.register("showmetadata", udf((img: SparkImage) => img.meta.info))
    // provenance replay (macro record/replay analogue, Spiji.java:1520-1564)
    r.register("replaylog", replayUdf)
  }
}
