package graft.core

/** Image data model — the Spark-native re-expression of the reference's
  * `PortableImagePlus` (reference: PortableImagePlus.scala:24-26).
  *
  * Unlike the reference's lazy `Either[ImagePlus, (meta, array)]` dual
  * representation (PortableImagePlus.scala:88-90) there is no "live"
  * object form: images live in Tungsten rows as plain struct columns
  * (`Dataset[SparkImage]` via product encoders), so serialization is
  * free and every kernel is a pure function of the struct fields.
  */

/** Calibration + acquisition metadata; field layout follows the
  * reference's serializable calibration clone (IJCalibration.java:26-88)
  * and `IJMetaData` (PortableImagePlus.scala:306-346).
  *
  * `roi` is the active rectangular region of interest, "x,y,w,h" in
  * pixel coords or "" for the whole image (the reference's ROI get/set
  * surface, Spiji.java:515-613); stats/histogram/particle analysis and
  * thresholding respect it. `calFunction`+`calCoeffs` are the value
  * calibration function (IJCalibration.java:98-121 `setFunction`) —
  * see [[Calibration]] for the supported function forms. */
case class ImageMeta(
    pixelWidth: Double = 1.0,
    pixelHeight: Double = 1.0,
    pixelDepth: Double = 1.0,
    frameInterval: Double = 0.0,
    fps: Double = 0.0,
    xOrigin: Double = 0.0,
    yOrigin: Double = 0.0,
    zOrigin: Double = 0.0,
    unit: String = "pixel",
    valueUnit: String = "gray",
    timeUnit: String = "sec",
    info: String = "",
    roi: String = "",
    calFunction: String = "",
    calCoeffs: Seq[Double] = Nil,
    calTable: Seq[Double] = Nil)

/** Value-calibration function forms (the public ImageJ `Calibration`
  * function set the reference round-trips via IJCalibration.java:
  * 98-121): raw pixel value → calibrated value. The CT use-case:
  * `line` with coeffs (-1024, 1) maps unsigned stored values to
  * Hounsfield units — the general form of `applyOffset`. */
object Calibration {
  def apply(function: String, coeffs: Seq[Double], v: Double): Double = {
    val c = coeffs.toIndexedSeq
    def co(i: Int): Double = if (i < c.length) c(i) else 0.0
    function match {
      case "" | "none"  => v
      case "line"       => co(0) + co(1) * v
      case "poly2"      => co(0) + co(1) * v + co(2) * v * v
      case "poly3"      => co(0) + co(1) * v + co(2) * v * v + co(3) * v * v * v
      case "poly4"      => co(0) + co(1) * v + co(2) * v * v + co(3) * v * v * v + co(4) * v * v * v * v
      case "power"      => co(0) * math.pow(v, co(1))
      case "exp"        => co(0) * math.exp(co(1) * v)
      case "log"        => if (v > 0) co(0) * math.log(co(1) * v) else 0.0
      case other => throw new IllegalArgumentException(s"unknown calibration function: $other")
    }
  }

  def isCalibrated(meta: ImageMeta): Boolean =
    (meta.calFunction.nonEmpty && meta.calFunction != "none") || meta.calTable.nonEmpty

  /** Calibrate one raw value: an explicit lookup table (the reference's
    * `setCTable`, IJCalibration.java:116 — indexed by the integer raw
    * value, out-of-range values clamp to the table edges) wins over the
    * function form. */
  def value(meta: ImageMeta, v: Double): Double =
    if (meta.calTable.nonEmpty) {
      val t = meta.calTable
      val i = math.min(t.length - 1, math.max(0, math.rint(v).toInt))
      t(i)
    } else apply(meta.calFunction, meta.calCoeffs, v)
}

/** The image cell value. `data` is the pixel payload, big-endian,
  * row-major within a slice, slice-major across slices (matching the
  * reference's `[h][w][slices]` marshalling, Spiji.java:801-921);
  * `pixelType` names the reference's type lattice (TImgTools.java:24-43).
  * `log` is the JSON provenance log (the reference's own UDT stores the
  * log as JSON text too — PipUDT.scala:31). */
case class SparkImage(
    meta: ImageMeta,
    log: String,
    width: Int,
    height: Int,
    slices: Int,
    pixelType: String,
    data: Array[Byte]) {

  def pixelCount: Int = width * height * slices

  /** Decode to doubles (RGB via the default MEAN strategy,
    * TImgTools.java:311-366). */
  def toDoubles: Array[Double] = PixelCodec.decode(data, pixelType, pixelCount)

  /** Decode with an explicit RGB→scalar strategy (MEAN/SUM/MIN/MAX/
    * INT/RED/GREEN/BLUE — the reference's RGBConversion enum,
    * TImgTools.java:311-324). No-op distinction for non-RGB types. */
  def toDoubles(rgbStrategy: String): Array[Double] =
    PixelCodec.decode(data, pixelType, pixelCount, rgbStrategy)

  def withPixels(px: Array[Double], newType: String = pixelType, entry: Option[LogEntry] = None): SparkImage = {
    val lg = entry.fold(log)(e => ImageLog.append(log, e))
    copy(data = PixelCodec.encode(px, newType), pixelType = newType, log = lg)
  }
}

/** Pixel type lattice (reference TImgTools.java:24-43, byte sizes
  * 891-912). All codecs are big-endian and exact round-trips within
  * each type's range; doubles are the interchange representation
  * (the reference's "toarray" escape hatch, SQLFunctions.scala:176-184).
  */
object PixelCodec {
  val Bool = "1bit"
  val Byte8 = "8bit"
  val Short16 = "16bit"
  val Int32 = "32bit-integer"
  val Long64 = "64bit-long"
  val Float32 = "32bit-float"
  val Double64 = "64bit-double"
  val Rgb = "24bit-rgb"

  val all: Seq[String] = Seq(Bool, Byte8, Short16, Int32, Long64, Float32, Double64, Rgb)

  def bytesPerPixel(pixelType: String): Int = pixelType match {
    case Bool | Byte8 => 1
    case Short16      => 2
    case Int32 | Float32 => 4
    case Long64 | Double64 => 8
    case Rgb          => 3
    case other        => throw new IllegalArgumentException(s"unknown pixelType: $other")
  }

  /** Clamp + truncate a double into the type's storage range
    * (value ranges: TImgTools.java:805-826). */
  def clamp(v: Double, pixelType: String): Double = pixelType match {
    case Bool    => if (v > 0) 1.0 else 0.0
    case Byte8   => math.min(255.0, math.max(0.0, math.rint(v)))
    case Short16 => math.min(65535.0, math.max(0.0, math.rint(v)))
    case Int32   => math.rint(math.min(Int.MaxValue.toDouble, math.max(Int.MinValue.toDouble, v)))
    case Long64  => math.rint(v)
    case _       => v
  }

  def encode(px: Array[Double], pixelType: String): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(px.length * bytesPerPixel(pixelType))
    pixelType match {
      case Bool | Byte8 => px.foreach(v => bb.put(clamp(v, pixelType).toByte))
      case Short16 => px.foreach(v => bb.putShort(clamp(v, pixelType).toInt.toShort))
      case Int32 => px.foreach(v => bb.putInt(clamp(v, pixelType).toInt))
      case Long64 => px.foreach(v => bb.putLong(clamp(v, pixelType).toLong))
      case Float32 => px.foreach(v => bb.putFloat(v.toFloat))
      case Double64 => px.foreach(bb.putDouble)
      case Rgb => px.foreach { v => // gray replicated to r=g=b on encode
        val b = clamp(v, Byte8).toByte; bb.put(b); bb.put(b); bb.put(b)
      }
    }
    bb.array()
  }

  def decode(data: Array[Byte], pixelType: String, n: Int): Array[Double] =
    decode(data, pixelType, n, "MEAN")

  /** Decode with an RGB→scalar conversion strategy (the reference's
    * `RGBConversion` enum MEAN/SUM/MIN/MAX/INT/RED/GREEN/BLUE,
    * TImgTools.java:311-366). Channels are read as UNSIGNED bytes and
    * INT packs the standard (r<<16)|(g<<8)|b — the reference's
    * convertRGBArray reads signed bytes "+127" and shifts red by 24,
    * which mangles any channel value ≥ 128; that's a defect, not a
    * contract, so the sane unsigned forms are implemented here.
    * The strategy is ignored for non-RGB pixel types. */
  def decode(data: Array[Byte], pixelType: String, n: Int, rgbStrategy: String): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(data)
    val out = new Array[Double](n)
    var i = 0
    pixelType match {
      case Bool | Byte8 => while (i < n) { out(i) = bb.get() & 0xff; i += 1 }
      case Short16 => while (i < n) { out(i) = bb.getShort() & 0xffff; i += 1 }
      case Int32 => while (i < n) { out(i) = bb.getInt(); i += 1 }
      case Long64 => while (i < n) { out(i) = bb.getLong().toDouble; i += 1 }
      case Float32 => while (i < n) { out(i) = bb.getFloat(); i += 1 }
      case Double64 => while (i < n) { out(i) = bb.getDouble(); i += 1 }
      case Rgb =>
        val f: (Int, Int, Int) => Double = rgbStrategy.toUpperCase match {
          case "MEAN"  => (r, g, b) => (r + g + b) / 3.0
          case "SUM"   => (r, g, b) => (r + g + b).toDouble
          case "MIN"   => (r, g, b) => math.min(math.min(r, g), b).toDouble
          case "MAX"   => (r, g, b) => math.max(math.max(r, g), b).toDouble
          case "INT"   => (r, g, b) => ((r << 16) | (g << 8) | b).toDouble
          case "RED"   => (r, _, _) => r.toDouble
          case "GREEN" => (_, g, _) => g.toDouble
          case "BLUE"  => (_, _, b) => b.toDouble
          case other => throw new IllegalArgumentException(
            s"unknown RGB strategy: $other (MEAN/SUM/MIN/MAX/INT/RED/GREEN/BLUE)")
        }
        while (i < n) {
          val r = bb.get() & 0xff; val g = bb.get() & 0xff; val b = bb.get() & 0xff
          out(i) = f(r, g, b); i += 1
        }
    }
    out
  }
}

/** One provenance entry (reference `LogEntry`, ImagePlusIO.scala:16-39).
  * `children` holds merged sub-logs for binary ops (merge semantics:
  * ImagePlusIO.scala:175-183) — the recursion is why the log is a JSON
  * string column, as in the reference's own UDT (PipUDT.scala:31). */
case class LogEntry(
    optype: String, // LOAD SAVE CREATE RUN MACRO THRESHOLD COMMENT OTHER MERGE MERGE_STORE ADD (Spiji.java:230-236)
    optool: String, // IMAGEJ SIL SPARK OTHER
    opval: String,
    opargs: String,
    children: Seq[String] = Nil) // pre-rendered child JSON logs

object ImageLog {
  val empty = "[]"

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def render(e: LogEntry): String = {
    val kids = e.children.mkString("[", ",", "]")
    s"""{"optype":"${esc(e.optype)}","optool":"${esc(e.optool)}","opval":"${esc(e.opval)}","opargs":"${esc(e.opargs)}","children":$kids}"""
  }

  /** Append an entry to a JSON-array log string (no parse round-trip). */
  def append(log: String, e: LogEntry): String = {
    val base = if (log == null || log.isEmpty || log == "[]") "" else log.stripSuffix("]").stripPrefix("[") + ","
    "[" + base + render(e) + "]"
  }

  /** Merge two logs for a binary op (MERGE with MERGE_STORE children —
    * ImagePlusIO.scala:175-183). */
  def merge(op: String, logA: String, logB: String): String = {
    val store = (l: String) => render(LogEntry("MERGE_STORE", "SPARK", "", "", Seq(l)))
    "[" + render(LogEntry("MERGE", "SPARK", op, "", Seq(store(logA), store(logB)))) + "]"
  }

  def create(opval: String, opargs: String): String =
    append(empty, LogEntry("CREATE", "SPARK", opval, opargs))

  /** Parse the (optype, opval, opargs) sequence back out of a JSON log
    * — the half of the round-trip the reference used for macro replay
    * (ImagePlusIO.scala:91-108; recorder→sweep scOps.scala:157-175). */
  def parseOps(log: String): Seq[(String, String, String)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parseOpt(log).toSeq.flatMap {
      case JArray(items) => items.map { j =>
        def str(f: String) = (j \ f) match { case JString(v) => v; case _ => "" }
        (str("optype"), str("opval"), str("opargs"))
      }
      case _ => Seq.empty
    }
  }
}

/** Per-image statistics record (reference ImageStatistics.scala:8-28). */
case class ImageStats(min: Double, mean: Double, stdDev: Double, max: Double, pts: Long) {
  def toMap: Map[String, Double] =
    Map("min" -> min, "mean" -> mean, "stdDev" -> stdDev, "max" -> max, "pts" -> pts.toDouble)
}

/** Histogram (reference IJHistogram.scala:10-42). */
case class ImageHistogram(bin_centers: Array[Double], counts: Array[Long]) {
  def normalizedCounts: Array[Double] = {
    val total = counts.sum.toDouble
    if (total == 0) counts.map(_ => 0.0) else counts.map(_ / total)
  }

  /** Re-bin to new centers by nearest-center assignment
    * (reference `interp`, IJHistogram.scala:17-26). Uniform target
    * grids (the common case — [[ImageHistogram.centers]] output) are
    * assigned arithmetically in O(bins); arbitrary grids fall back to
    * the nearest-center scan. */
  def interp(newCenters: Array[Double]): ImageHistogram = {
    val out = new Array[Long](newCenters.length)
    val m = newCenters.length
    val uniformW =
      if (m >= 2) {
        val w0 = (newCenters(m - 1) - newCenters(0)) / (m - 1)
        val ok = w0 > 0 && newCenters.indices.forall { j =>
          math.abs(newCenters(j) - (newCenters(0) + j * w0)) <=
            1e-9 * math.max(1.0, math.abs(newCenters(j)))
        }
        if (ok) w0 else 0.0
      } else 0.0
    var i = 0
    while (i < bin_centers.length) {
      if (counts(i) != 0) {
        val c = bin_centers(i)
        val best =
          if (uniformW > 0)
            math.min(m - 1, math.max(0, math.round((c - newCenters(0)) / uniformW).toInt))
          else {
            var b = 0; var bestD = Double.MaxValue; var j = 0
            while (j < m) {
              val d = math.abs(newCenters(j) - c)
              if (d < bestD) { bestD = d; b = j }
              j += 1
            }
            b
          }
        out(best) += counts(i)
      }
      i += 1
    }
    ImageHistogram(newCenters, out)
  }

  /** L1 distance of normalized histograms over shared re-binned centers,
    * halved into [0,1] (reference IJHistogram.scala:34-41, 56-66;
    * default bin count matches its `histInterpCount` = 10000,
    * IJHistogram.scala:126). */
  def distance(other: ImageHistogram, bins: Int = 10000): Double = {
    val lo = math.min(bin_centers.headOption.getOrElse(0.0), other.bin_centers.headOption.getOrElse(0.0))
    val hi = math.max(bin_centers.lastOption.getOrElse(0.0), other.bin_centers.lastOption.getOrElse(0.0))
    val centers = ImageHistogram.centers(lo, hi, bins)
    val a = interp(centers).normalizedCounts
    val b = other.interp(centers).normalizedCounts
    a.zip(b).map { case (x, y) => math.abs(x - y) }.sum / 2.0
  }
}

object ImageHistogram {
  def centers(min: Double, max: Double, bins: Int): Array[Double] = {
    val w = (max - min) / bins
    Array.tabulate(bins)(i => min + w * (i + 0.5))
  }
}

/** Per-image results table (reference IJResultsTable.scala:15-92):
  * row-major rows + header, stored column-major as map<string,
  * array<double>> exactly like its UDT (IJResultsTableUDT.scala:32-38).
  * Missing cells read as 0 (IJResultsTable.scala:31). */
case class ResultsTable(header: Array[String], rows: IndexedSeq[Array[Double]]) {
  def toMap: Map[String, Array[Double]] =
    header.zipWithIndex.map { case (h, i) =>
      h -> rows.map(r => if (i < r.length) r(i) else 0.0).toArray
    }.toMap

  def firstRow: Map[String, Double] =
    if (rows.isEmpty) Map.empty
    else header.zipWithIndex.map { case (h, i) =>
      h -> (if (i < rows.head.length) rows.head(i) else 0.0)
    }.toMap

  def column(name: String): Option[Array[Double]] = toMap.get(name)
  def mean(c: String): Option[Double] = column(c).filter(_.nonEmpty).map(a => a.sum / a.length)
  def sum(c: String): Option[Double] = column(c).map(_.sum)
  def min(c: String): Option[Double] = column(c).filter(_.nonEmpty).map(_.min)
  def max(c: String): Option[Double] = column(c).filter(_.nonEmpty).map(_.max)
}
