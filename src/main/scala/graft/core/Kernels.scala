package graft.core

import scala.collection.mutable

/** Pure, deterministic image kernels, string-dispatched to keep the
  * reference's `run(image, 'Median...', 'radius=3')` API shape
  * (SQLFunctions.scala:41, PortableImagePlus.scala:352-388).
  *
  * Every kernel is a pure function `(SparkImage, args) => SparkImage` —
  * no executor-global mutable state (the reference's single biggest
  * scalability hazard: one shared ImageJ "current image" per JVM,
  * Spiji.java:464-466 — eliminated per SURVEY §2.12). Randomized ops
  * (noise) are seeded from image content + args, so results are
  * hash-exact regardless of partitioning, task retries, or cluster
  * size.
  */
object Kernels {

  type Kernel = (SparkImage, Map[String, String]) => SparkImage

  /** `k1=v1 k2=v2` argument parsing (reference ParameterSweep.scala:86-92). */
  def parseArgs(args: String): Map[String, String] =
    if (args == null || args.trim.isEmpty) Map.empty
    else args.trim.split("\\s+").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case Array(k)    => Some(k -> "")
        case _           => None
      }
    }.toMap

  // ---- registry ------------------------------------------------------

  private val registry: Map[String, Kernel] = Map(
    "Add Noise" -> addNoise(25.0),
    "Add Specified Noise..." -> ((img, a) => addNoise(a.getOrElse("standard", "25").toDouble)(img, a)),
    "Median..." -> median _,
    "Mean..." -> meanFilter _,
    "Gaussian Blur..." -> gaussianBlur _,
    "Invert" -> invert _,
    "Multiply..." -> ((img, a) => mapPixels(img, "Multiply...", a, v => v * a.getOrElse("value", "1").toDouble)),
    "Add..." -> ((img, a) => mapPixels(img, "Add...", a, v => v + a.getOrElse("value", "0").toDouble)),
    "Subtract..." -> ((img, a) => mapPixels(img, "Subtract...", a, v => v - a.getOrElse("value", "0").toDouble)),
    "Divide..." -> ((img, a) => mapPixels(img, "Divide...", a, v => v / a.getOrElse("value", "1").toDouble)),
    "Convert to Mask" -> convertToMask _,
    "8-bit" -> convertType(PixelCodec.Byte8),
    "16-bit" -> convertType(PixelCodec.Short16),
    "32-bit" -> convertType(PixelCodec.Float32),
    "RGB Color" -> convertType(PixelCodec.Rgb),
    // ROI surface (reference Spiji.java:515-613): a rectangular ROI on
    // the image restricts stats/histogram/particles/threshold
    "setRoi" -> setRoi _,
    "resetRoi" -> ((img, _) => img.copy(meta = img.meta.copy(roi = ""))),
    // value calibration (IJCalibration.java:98-121 setFunction)
    "setCalibration" -> setCalibration _,
    // ImageJ Process-menu staples (public command set): fixed 3x3
    // convolutions and the median alias
    "Despeckle" -> ((img, a) => median(img, Map("radius" -> "1"))),
    "Smooth" -> convolve3x3(Array(1, 1, 1, 1, 1, 1, 1, 1, 1), 9.0),
    "Sharpen" -> convolve3x3(Array(-1, -1, -1, -1, 12, -1, -1, -1, -1), 4.0),
    "Find Edges" -> sobel _,
    // Math-menu point operations (clamped to the pixel type's range)
    "Log" -> ((img, a) => mapPixels(img, "Log", a,
      v => PixelCodec.clamp(if (v > 0) math.log(v) else 0.0, img.pixelType))),
    "Exp" -> ((img, a) => mapPixels(img, "Exp", a,
      v => PixelCodec.clamp(math.exp(v), img.pixelType))),
    "Square" -> ((img, a) => mapPixels(img, "Square", a,
      v => PixelCodec.clamp(v * v, img.pixelType))),
    "Square Root" -> ((img, a) => mapPixels(img, "Square Root", a,
      v => PixelCodec.clamp(if (v > 0) math.sqrt(v) else 0.0, img.pixelType))),
    "Abs" -> ((img, a) => mapPixels(img, "Abs", a, math.abs)),
    "Gamma..." -> ((img, a) => {
      val g = a.getOrElse("value", "1").toDouble
      val range = img.pixelType match {
        case PixelCodec.Byte8 | PixelCodec.Rgb => 255.0
        case PixelCodec.Short16 => 65535.0
        case _ => 1.0 // float types: gamma on normalized [0,1] identity range
      }
      mapPixels(img, "Gamma...", a,
        v => PixelCodec.clamp(math.pow(math.max(0.0, v) / range, g) * range, img.pixelType))
    }),
    "Min..." -> ((img, a) => {
      val m = a.getOrElse("value", "0").toDouble
      mapPixels(img, "Min...", a, v => math.max(v, m))
    }),
    "Max..." -> ((img, a) => {
      val m = a.getOrElse("value", "0").toDouble
      mapPixels(img, "Max...", a, v => math.min(v, m))
    }),
    // rank filters: min (erode-ish) and max (dilate-ish) over the window
    "Minimum..." -> rankFilter(_.min),
    "Maximum..." -> rankFilter(_.max),
    // geometry (ImageJ Image-menu staples); Crop takes x/y/width/height args
    "Crop" -> crop _,
    "Size..." -> ((img, a) => resize(img,
      a.getOrElse("width", img.width.toString).toDouble.toInt,
      a.getOrElse("height", img.height.toString).toDouble.toInt)),
    "Scale..." -> ((img, a) => {
      val f = a.getOrElse("x", "1.0").toDouble
      resize(img, math.max(1, math.round(img.width * f).toInt),
        math.max(1, math.round(img.height * a.getOrElse("y", f.toString).toDouble).toInt))
    }),
    "Rotate 90 Degrees Right" -> rotate(clockwise = true),
    "Rotate 90 Degrees Left" -> rotate(clockwise = false),
    "Flip Horizontally" -> flip(horizontal = true),
    "Flip Vertically" -> flip(horizontal = false))

  /** Names for `listcommands` (reference SQLFunctions.scala:267-268). */
  def listCommands: Seq[String] =
    (registry.keys.toSeq ++ Seq("setThreshold", "applyThreshold")).sorted

  /** Names for `listplugins` ("cmd => impl", SQLFunctions.scala:264-265). */
  def listPlugins: Seq[String] = listCommands.map(c => s"$c => graft.core.Kernels")

  // ---- dispatch ------------------------------------------------------

  /** The `run`/`run2` entry point. Threshold commands are special-cased
    * exactly like the reference (PortableImagePlus.scala:366-377). */
  def run(img: SparkImage, cmd: String, args: String = ""): SparkImage = {
    val a = parseArgs(args)
    val out = cmd match {
      case "setThreshold" | "applyThreshold" => applyThreshold(img, a)
      case c => registry.get(c) match {
        case Some(k) => k(img, a)
        case None => throw new IllegalArgumentException(
          s"unknown command: $c (known: ${listCommands.mkString(", ")})")
      }
    }
    out.copy(log = ImageLog.append(img.log,
      LogEntry(if (cmd.contains("Threshold")) "THRESHOLD" else "RUN", "SPARK", cmd, args)))
  }

  // ---- element-wise --------------------------------------------------

  private def mapPixels(img: SparkImage, cmd: String, a: Map[String, String],
                        f: Double => Double): SparkImage =
    img.withPixels(img.toDoubles.map(f))

  /** Seeded pseudo-gaussian noise, σ=`standard` (the reference used
    * ImageJ's unseeded `Add Noise` and could only assert statistics —
    * SURVEY §5; here the noise is deterministic AND engine-agnostic).
    *
    * Per pixel p: an Irwin–Hall approximate gaussian — the sum S of
    * twelve 5-bit uniforms carved from one counter-based splitmix64
    * draw `mix64(seed + (p+1)·GAMMA)` — shifted/scaled to
    * (S−186)/32·σ (mean 0, stdDev 0.9995·σ). The value is dyadic
    * (5 fractional bits), so adding it to the integral debug fills
    * stays EXACT in Float32: no transcendental and no rounding step
    * anywhere, which is what lets the img02 oracle re-derive the
    * identical pixels in DuckDB via the HashSql HUGEINT mirror of
    * [[graft.pipeline.Dedup.mix64]]. */
  private def addNoise(defaultSigma: Double): Kernel = (img, a) => {
    val sigma = a.get("standard").map(_.toDouble).getOrElse(defaultSigma)
    val px = img.toDoubles
    val seed = noiseSeed(img)
    val out = new Array[Double](px.length)
    var p = 0
    while (p < px.length) {
      val s = graft.pipeline.Dedup.mix64(seed + (p + 1).toLong * 0x9e3779b97f4a7c15L)
      var sum = 0
      var j = 0
      while (j < 12) { sum += ((s >>> (5 * j)) & 31L).toInt; j += 1 }
      out(p) = PixelCodec.clamp(px(p) + (sum - 186) / 32.0 * sigma, img.pixelType)
      p += 1
    }
    img.withPixels(out)
  }

  /** Order-independent content seed for [[addNoise]]:
    * mix64(Σ_p round(px_p·32)·(2p+1) mod 2⁶⁴ ⊕ dims). Position-weighted
    * so permuted content reseeds, yet order-independent, so a future
    * per-tile parallel evaluation is layout-free. For a constant fill f
    * the sum has the closed form 32·f·n² (Σ(2p+1) = n²), which is what
    * the img02 oracle computes. */
  private[core] def noiseSeed(img: SparkImage): Long = {
    val px = img.toDoubles
    var acc = 0L
    var p = 0
    while (p < px.length) {
      acc += java.lang.Math.round(px(p) * 32.0) * (2L * p + 1)
      p += 1
    }
    graft.pipeline.Dedup.mix64(acc ^ (img.width.toLong << 32) ^ img.height.toLong)
  }

  private def invert(img: SparkImage, a: Map[String, String]): SparkImage = {
    val maxV = img.pixelType match {
      case PixelCodec.Byte8 | PixelCodec.Rgb => 255.0
      case PixelCodec.Short16 => 65535.0
      case _ => img.toDoubles.max
    }
    img.withPixels(img.toDoubles.map(maxV - _))
  }

  // ---- neighborhood filters (per-slice 2-D, clamped edges) -----------

  private def perSlice(img: SparkImage)(f: (Array[Double], Int, Int) => Array[Double]): Array[Double] = {
    val px = img.toDoubles
    val (w, h) = (img.width, img.height)
    val out = new Array[Double](px.length)
    var s = 0
    while (s < img.slices) {
      val slice = java.util.Arrays.copyOfRange(px, s * w * h, (s + 1) * w * h)
      System.arraycopy(f(slice, w, h), 0, out, s * w * h, w * h)
      s += 1
    }
    out
  }

  /** Apply a custom per-slice processor `(slicePixels, w, h) => newPixels`
    * to every slice — the public face of the reference's
    * `processorForEach` (PortableImagePlus.scala:171-183), for slice
    * transforms that aren't registered commands. The kernel must stay
    * pure (no captured mutable state) to keep results partition- and
    * retry-invariant. */
  def processSlices(img: SparkImage)(f: (Array[Double], Int, Int) => Array[Double]): SparkImage =
    img.withPixels(perSlice(img)(f),
      entry = Some(LogEntry("RUN", "SPARK", "processSlices", "")))

  /** Square-window median, radius r, edges clamped. Deterministic and
    * precisely specified (SURVEY §7 "hard parts": define `Median...`
    * edge handling exactly). */
  private def median(img: SparkImage, a: Map[String, String]): SparkImage = {
    val r = a.getOrElse("radius", "1").toDouble.toInt
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val out = new Array[Double](w * h)
      val buf = new Array[Double]((2 * r + 1) * (2 * r + 1))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var n = 0
          var dy = -r
          while (dy <= r) {
            val yy = math.min(h - 1, math.max(0, y + dy))
            var dx = -r
            while (dx <= r) {
              val xx = math.min(w - 1, math.max(0, x + dx))
              buf(n) = sl(yy * w + xx); n += 1
              dx += 1
            }
            dy += 1
          }
          val win = java.util.Arrays.copyOf(buf, n)
          java.util.Arrays.sort(win)
          out(y * w + x) = if (n % 2 == 1) win(n / 2) else (win(n / 2 - 1) + win(n / 2)) / 2.0
          x += 1
        }
        y += 1
      }
      out
    })
  }

  private def meanFilter(img: SparkImage, a: Map[String, String]): SparkImage = {
    val r = a.getOrElse("radius", "1").toDouble.toInt
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var sum = 0.0; var n = 0
          var dy = -r
          while (dy <= r) {
            val yy = math.min(h - 1, math.max(0, y + dy))
            var dx = -r
            while (dx <= r) {
              sum += sl(yy * w + math.min(w - 1, math.max(0, x + dx))); n += 1
              dx += 1
            }
            dy += 1
          }
          out(y * w + x) = sum / n
          x += 1
        }
        y += 1
      }
      out
    })
  }

  /** Separable gaussian blur, sigma=`sigma`, kernel truncated at 3σ,
    * renormalized, clamped edges. */
  private def gaussianBlur(img: SparkImage, a: Map[String, String]): SparkImage = {
    val sigma = a.getOrElse("sigma", "2").toDouble
    val r = math.max(1, math.ceil(3 * sigma).toInt)
    val k = Array.tabulate(2 * r + 1)(i => math.exp(-0.5 * math.pow((i - r) / sigma, 2)))
    val ksum = k.sum
    var i = 0
    while (i < k.length) { k(i) /= ksum; i += 1 }
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val tmp = new Array[Double](w * h)
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) { // horizontal pass
        var x = 0
        while (x < w) {
          var s = 0.0; var j = -r
          while (j <= r) { s += sl(y * w + math.min(w - 1, math.max(0, x + j))) * k(j + r); j += 1 }
          tmp(y * w + x) = s
          x += 1
        }
        y += 1
      }
      y = 0
      while (y < h) { // vertical pass
        var x = 0
        while (x < w) {
          var s = 0.0; var j = -r
          while (j <= r) { s += tmp(math.min(h - 1, math.max(0, y + j)) * w + x) * k(j + r); j += 1 }
          out(y * w + x) = s
          x += 1
        }
        y += 1
      }
      out
    })
  }

  /** Square-window rank filter (radius=`radius`, clamped edges) —
    * Minimum/Maximum erosion/dilation shapes. */
  private def rankFilter(pick: Array[Double] => Double): Kernel = (img, a) => {
    val r = a.getOrElse("radius", "1").toDouble.toInt
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val out = new Array[Double](w * h)
      val buf = new Array[Double]((2 * r + 1) * (2 * r + 1))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var n = 0
          var dy = -r
          while (dy <= r) {
            val yy = math.min(h - 1, math.max(0, y + dy))
            var dx = -r
            while (dx <= r) {
              buf(n) = sl(yy * w + math.min(w - 1, math.max(0, x + dx))); n += 1
              dx += 1
            }
            dy += 1
          }
          out(y * w + x) = pick(java.util.Arrays.copyOf(buf, n))
          x += 1
        }
        y += 1
      }
      out
    })
  }

  /** Fixed 3x3 integer-kernel convolution with clamped edges and a
    * normalization divisor (ImageJ's Smooth/Sharpen shapes). */
  private def convolve3x3(k: Array[Int], divisor: Double): Kernel = (img, _) =>
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var s = 0.0
          var j = 0
          while (j < 9) {
            val yy = math.min(h - 1, math.max(0, y + j / 3 - 1))
            val xx = math.min(w - 1, math.max(0, x + j % 3 - 1))
            s += sl(yy * w + xx) * k(j)
            j += 1
          }
          out(y * w + x) = PixelCodec.clamp(s / divisor, img.pixelType)
          x += 1
        }
        y += 1
      }
      out
    })

  /** Sobel gradient magnitude (ImageJ "Find Edges"). */
  private def sobel(img: SparkImage, a: Map[String, String]): SparkImage =
    img.withPixels(perSlice(img) { (sl, w, h) =>
      val out = new Array[Double](w * h)
      def px(x: Int, y: Int): Double =
        sl(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val gx = (px(x - 1, y - 1) + 2 * px(x - 1, y) + px(x - 1, y + 1)) -
            (px(x + 1, y - 1) + 2 * px(x + 1, y) + px(x + 1, y + 1))
          val gy = (px(x - 1, y - 1) + 2 * px(x, y - 1) + px(x + 1, y - 1)) -
            (px(x - 1, y + 1) + 2 * px(x, y + 1) + px(x + 1, y + 1))
          out(y * w + x) = PixelCodec.clamp(math.sqrt(gx * gx + gy * gy), img.pixelType)
          x += 1
        }
        y += 1
      }
      out
    })

  // ---- geometry ------------------------------------------------------

  /** Rectangular crop (`x= y= width= height=` args, clamped to bounds) —
    * the ROI-driven crop of the reference's ROI surface
    * (Spiji.java:515-613). */
  private def crop(img: SparkImage, a: Map[String, String]): SparkImage = {
    val x0 = math.max(0, a.getOrElse("x", "0").toDouble.toInt)
    val y0 = math.max(0, a.getOrElse("y", "0").toDouble.toInt)
    val cw = math.min(img.width - x0, a.getOrElse("width", img.width.toString).toDouble.toInt)
    val ch = math.min(img.height - y0, a.getOrElse("height", img.height.toString).toDouble.toInt)
    cropRect(img, x0, y0, cw, ch)
  }

  /** Rect extraction shared by the Crop command and the ROI view; the
    * result carries no ROI (it IS the region). */
  private def cropRect(img: SparkImage, x0: Int, y0: Int, cw: Int, ch: Int): SparkImage = {
    require(cw > 0 && ch > 0, s"empty crop: x=$x0 y=$y0 w=$cw h=$ch")
    val px = img.toDoubles
    val out = new Array[Double](cw * ch * img.slices)
    var s = 0
    while (s < img.slices) {
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          out(s * cw * ch + y * cw + x) =
            px(s * img.width * img.height + (y0 + y) * img.width + (x0 + x))
          x += 1
        }
        y += 1
      }
      s += 1
    }
    img.copy(width = cw, height = ch,
      meta = img.meta.copy(roi = ""),
      data = PixelCodec.encode(out, img.pixelType))
  }

  /** Bilinear resize (align-corners-false convention: sample at pixel
    * centers, clamped). The multimodal pipeline's resize stage. */
  def resize(img: SparkImage, nw: Int, nh: Int): SparkImage = {
    require(nw > 0 && nh > 0)
    val (w, h) = (img.width, img.height)
    val px = img.toDoubles
    val out = new Array[Double](nw * nh * img.slices)
    val sx = w.toDouble / nw
    val sy = h.toDouble / nh
    var s = 0
    while (s < img.slices) {
      val base = s * w * h
      var y = 0
      while (y < nh) {
        val fy = math.min(h - 1.0, math.max(0.0, (y + 0.5) * sy - 0.5))
        val y0 = fy.toInt
        val y1 = math.min(h - 1, y0 + 1)
        val wy = fy - y0
        var x = 0
        while (x < nw) {
          val fx = math.min(w - 1.0, math.max(0.0, (x + 0.5) * sx - 0.5))
          val x0 = fx.toInt
          val x1 = math.min(w - 1, x0 + 1)
          val wx = fx - x0
          val top = px(base + y0 * w + x0) * (1 - wx) + px(base + y0 * w + x1) * wx
          val bot = px(base + y1 * w + x0) * (1 - wx) + px(base + y1 * w + x1) * wx
          out(s * nw * nh + y * nw + x) =
            PixelCodec.clamp(top * (1 - wy) + bot * wy, img.pixelType)
          x += 1
        }
        y += 1
      }
      s += 1
    }
    // no log append here: the `run` dispatcher logs the geometry
    // command itself. (Both appending made a replayed log re-run the
    // resize twice.) Direct callers wanting provenance go through
    // `run(img, "Size...", ...)`.
    img.copy(width = nw, height = nh,
      data = PixelCodec.encode(out, img.pixelType))
  }

  private def rotate(clockwise: Boolean): Kernel = (img, _) => {
    val (w, h) = (img.width, img.height)
    val px = img.toDoubles
    val out = new Array[Double](px.length)
    var s = 0
    while (s < img.slices) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { // rotated image is h wide, w tall
          val (nx, ny) = if (clockwise) (h - 1 - y, x) else (y, w - 1 - x)
          out(s * w * h + ny * h + nx) = px(s * w * h + y * w + x)
          x += 1
        }
        y += 1
      }
      s += 1
    }
    img.copy(width = h, height = w, data = PixelCodec.encode(out, img.pixelType))
  }

  private def flip(horizontal: Boolean): Kernel = (img, _) => {
    val (w, h) = (img.width, img.height)
    img.withPixels(perSlice(img) { (sl, _, _) =>
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = if (horizontal) sl(y * w + (w - 1 - x)) else sl((h - 1 - y) * w + x)
          out(y * w + x) = v
          x += 1
        }
        y += 1
      }
      out
    })
  }

  // ---- threshold / mask / type conversion ----------------------------

  /** `lower=`/`upper=` threshold → 0/255 mask, matching the reference's
    * special-cased setThreshold+`Convert to Mask`
    * (PortableImagePlus.scala:366-377; Spiji.java:1449-1451). */
  private def applyThreshold(img: SparkImage, a: Map[String, String]): SparkImage = {
    val lower = a.get("lower").map(_.toDouble).getOrElse(Double.NegativeInfinity)
    val upper = a.get("upper").map(_.toDouble).getOrElse(Double.PositiveInfinity)
    val px = img.toDoubles
    val out = roiRect(img) match {
      case None => px.map(v => if (v >= lower && v <= upper) 255.0 else 0.0)
      case Some((rx, ry, rw, rh)) =>
        // ROI-restricted threshold: mask only inside the ROI, outside
        // is background (ImageJ's threshold-within-selection shape)
        val res = new Array[Double](px.length)
        var s = 0
        while (s < img.slices) {
          val base = s * img.width * img.height
          var y = ry
          while (y < ry + rh) {
            var x = rx
            while (x < rx + rw) {
              val v = px(base + y * img.width + x)
              res(base + y * img.width + x) = if (v >= lower && v <= upper) 255.0 else 0.0
              x += 1
            }
            y += 1
          }
          s += 1
        }
        res
    }
    img.withPixels(out, PixelCodec.Byte8)
  }

  private def convertToMask(img: SparkImage, a: Map[String, String]): SparkImage =
    img.withPixels(img.toDoubles.map(v => if (v > 0) 255.0 else 0.0), PixelCodec.Byte8)

  /** Bit-depth conversion with the reference's silent precision rules
    * (int→short, double→float on creation — Spiji.java:994-1012).
    * For RGB inputs the `rgb=` arg picks the RGB→scalar strategy
    * (MEAN/SUM/MIN/MAX/INT/RED/GREEN/BLUE — TImgTools.java:311-324),
    * e.g. `run2(img, '32-bit', 'rgb=red')` extracts the red channel. */
  private def convertType(target: String): Kernel = (img, a) =>
    img.withPixels(img.toDoubles(a.getOrElse("rgb", "MEAN")), target)

  // ---- ROI / calibration ---------------------------------------------

  /** `setRoi` command: `x= y= width= height=` (w=/h= accepted) pixel
    * rect, clamped nowhere — out-of-bounds is an error, like ImageJ's
    * setRoi on an invalid rect. */
  private def setRoi(img: SparkImage, a: Map[String, String]): SparkImage = {
    val x = a.getOrElse("x", "0").toDouble.toInt
    val y = a.getOrElse("y", "0").toDouble.toInt
    val w = a.get("width").orElse(a.get("w")).map(_.toDouble.toInt).getOrElse(img.width - x)
    val h = a.get("height").orElse(a.get("h")).map(_.toDouble.toInt).getOrElse(img.height - y)
    require(x >= 0 && y >= 0 && w > 0 && h > 0 && x + w <= img.width && y + h <= img.height,
      s"ROI out of bounds: x=$x y=$y w=$w h=$h on ${img.width}x${img.height}")
    img.copy(meta = img.meta.copy(roi = s"$x,$y,$w,$h"))
  }

  /** `setCalibration` command: `function=line coeffs=-1024,1 unit=HU`.
    * Function forms: [[Calibration]]. */
  private def setCalibration(img: SparkImage, a: Map[String, String]): SparkImage = {
    val fn = a.getOrElse("function", "line")
    val coeffs = a.getOrElse("coeffs", "").split(",").filter(_.nonEmpty).map(_.toDouble).toSeq
    Calibration(fn, coeffs, 0.0) // validate the function name eagerly
    img.copy(meta = img.meta.copy(calFunction = fn, calCoeffs = coeffs,
      valueUnit = a.getOrElse("unit", img.meta.valueUnit)))
  }

  private[graft] def roiRect(img: SparkImage): Option[(Int, Int, Int, Int)] =
    if (img.meta.roi.isEmpty) None
    else img.meta.roi.split(",") match {
      case Array(x, y, w, h) => Some((x.trim.toInt, y.trim.toInt, w.trim.toInt, h.trim.toInt))
      case _ => None
    }

  /** The ROI sub-image (all slices), or the image itself without ROI.
    * Measurement ops go through this view. */
  private[graft] def roiView(img: SparkImage): SparkImage =
    roiRect(img).map { case (x, y, w, h) => cropRect(img, x, y, w, h) }.getOrElse(img)

  /** Calibrated pixel values: raw decode → calibration (lookup table
    * if set, else function form; identity when neither is set). */
  def calibratedValues(img: SparkImage): Array[Double] = {
    val px = img.toDoubles
    if (!Calibration.isCalibrated(img.meta)) px
    else px.map(v => Calibration.value(img.meta, v))
  }

  /** Attach an explicit calibration lookup table (the reference's
    * `setCTable` surface, IJCalibration.java:116) — too large for a
    * `k=v` command arg string, so this is API-only. */
  def withCalibrationTable(img: SparkImage, table: Seq[Double],
                           valueUnit: String = ""): SparkImage =
    img.copy(meta = img.meta.copy(calTable = table,
      valueUnit = if (valueUnit.nonEmpty) valueUnit else img.meta.valueUnit))

  // ---- binary image ops (SURVEY §2.4 J1-J3) --------------------------

  /** Pixel-wise subtraction, MERGE provenance
    * (PortableImagePlus.scala:244-258). */
  def subtract(a: SparkImage, b: SparkImage): SparkImage = {
    require(a.pixelCount == b.pixelCount, s"shape mismatch: ${a.pixelCount} vs ${b.pixelCount}")
    val pa = a.toDoubles; val pb = b.toDoubles
    val out = new Array[Double](pa.length)
    var i = 0
    while (i < pa.length) { out(i) = pa(i) - pb(i); i += 1 }
    a.copy(data = PixelCodec.encode(out, PixelCodec.Float32),
      pixelType = PixelCodec.Float32, log = ImageLog.merge("subtract", a.log, b.log))
  }

  /** Pixel-wise (a+b)/rescale (PortableImagePlus.scala:217-232). */
  def average(a: SparkImage, b: SparkImage, rescale: Double = 2.0): SparkImage = {
    require(a.pixelCount == b.pixelCount)
    val pa = a.toDoubles; val pb = b.toDoubles
    val out = new Array[Double](pa.length)
    var i = 0
    while (i < pa.length) { out(i) = (pa(i) + pb(i)) / rescale; i += 1 }
    a.copy(data = PixelCodec.encode(out, PixelCodec.Float32),
      pixelType = PixelCodec.Float32, log = ImageLog.merge("average", a.log, b.log))
  }

  /** Stack append `++` (PortableImagePlus.scala:260-270). */
  def appendStack(a: SparkImage, b: SparkImage): SparkImage = {
    require(a.width == b.width && a.height == b.height && a.pixelType == b.pixelType,
      "stack append requires matching dims and pixelType")
    a.copy(data = a.data ++ b.data, slices = a.slices + b.slices,
      log = ImageLog.merge("appendStack", a.log, b.log))
  }

  /** Pixel multiply (reference `scale` UDF / multiply,
    * PortableImagePlus.scala:235-241). */
  def scale(img: SparkImage, factor: Double): SparkImage =
    img.withPixels(img.toDoubles.map(_ * factor),
      entry = Some(LogEntry("RUN", "SPARK", "scale", s"factor=$factor")))

  /** CT-style value offset (applyOffset, PortableImagePlus.scala:190-195). */
  def applyOffset(img: SparkImage, offset: Double = -1024.0): SparkImage =
    img.withPixels(img.toDoubles.map(_ + offset),
      entry = Some(LogEntry("RUN", "SPARK", "applyOffset", s"offset=$offset")))

  // ---- statistics / histogram ----------------------------------------

  /** min/mean/stdDev/max/pts (reference getImageStatistics,
    * PortableImagePlus.scala:411-414). Population stdDev, like ImageJ.
    * Respects the active ROI (stats of the selection only) and the
    * value-calibration function (stats in calibrated units — the CT
    * Hounsfield use-case), both like ImageJ's getStatistics. */
  def stats(img: SparkImage): ImageStats = {
    val view = roiView(img)
    val px = calibratedValues(view)
    if (px.isEmpty) return ImageStats(0, 0, 0, 0, 0)
    var mn = Double.MaxValue; var mx = Double.MinValue; var sum = 0.0
    var i = 0
    while (i < px.length) {
      val v = px(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v; i += 1
    }
    val mean = sum / px.length
    var ss = 0.0
    i = 0
    while (i < px.length) { val d = px(i) - mean; ss += d * d; i += 1 }
    ImageStats(mn, mean, math.sqrt(ss / px.length), mx, px.length.toLong)
  }

  /** Fixed-range histogram: `bins` equal buckets on [min,max); values
    * outside clamp to edge buckets (reference hist3,
    * SQLFunctions.scala:152-157; IJHistogram.scala:95-141). */
  def histogram(img: SparkImage, min: Double, max: Double, bins: Int): ImageHistogram = {
    val counts = new Array[Long](bins)
    val w = (max - min) / bins
    val px = roiView(img).toDoubles
    var i = 0
    while (i < px.length) {
      val b0 = math.floor((px(i) - min) / w).toInt
      counts(math.min(bins - 1, math.max(0, b0))) += 1
      i += 1
    }
    ImageHistogram(ImageHistogram.centers(min, max, bins), counts)
  }

  /** Auto-range histogram over the observed [min,max]. The default bin
    * count matches the reference's from-IJ histogram (60000 bins,
    * IJHistogram.scala:125) so `hist`/`hist_compare` carry the same
    * value resolution; pass `bins` explicitly for coarser summaries. */
  def histogramAuto(img: SparkImage, bins: Int = 60000): ImageHistogram = {
    val st = stats(img)
    val hi = if (st.max > st.min) st.max else st.min + 1.0
    histogram(img, st.min, math.nextUp(hi), bins)
  }

  // ---- connected components / particle analysis (SURVEY A4) ----------

  /** Connected-component labeling (8-connectivity, two-pass union-find)
    * of nonzero pixels, plus per-component measurements — the rebuild
    * of ImageJ `Analyze Particles` (PortableImagePlus.scala:153-155;
    * measurement set: subset of IJResultsTable.scala:95-97 per
    * FIXTURES.md §4).
    *
    * STACK-AWARE like ImageJ's multi-slice analysis (the reference's
    * DICOM tests analyze 68-slice stacks, IjRDDTests.scala:30-99):
    * each slice is labeled independently and rows carry a 1-based
    * `Slice` column; an active ROI restricts analysis to the region,
    * with X/Y/BX/BY reported in absolute image coordinates.
    * Components are numbered in (slice, raster) order of their first
    * pixel, so labels are deterministic. */
  def analyzeParticles(img: SparkImage): ResultsTable = {
    val view = roiView(img)
    val (offX, offY) = roiRect(img).map(r => (r._1, r._2)).getOrElse((0, 0))
    val w = view.width; val h = view.height
    val all = view.toDoubles
    val header = Array("Slice", "Area", "Mean", "Min", "Max", "X", "Y",
      "Perim.", "BX", "BY", "Width", "Height")
    val rows = IndexedSeq.newBuilder[Array[Double]]
    var slice = 0
    while (slice < view.slices) {
      val px = java.util.Arrays.copyOfRange(all, slice * w * h, (slice + 1) * w * h)
      analyzeSlice(px, w, h).foreach { r =>
        rows += (Array((slice + 1).toDouble) ++ offsetRow(r, offX, offY))
      }
      slice += 1
    }
    ResultsTable(header, rows.result())
  }

  /** Shift the centroid/bounding-box columns of one slice-local
    * measurement row into absolute image coordinates. */
  private def offsetRow(r: Array[Double], offX: Int, offY: Int): Array[Double] = {
    val out = r.clone()
    out(4) += offX // X
    out(5) += offY // Y
    out(7) += offX // BX
    out(8) += offY // BY
    out
  }

  /** One slice's labeling + measurements (columns: Area, Mean, Min,
    * Max, X, Y, Perim., BX, BY, Width, Height — slice-local coords). */
  private def analyzeSlice(px: Array[Double], w: Int, h: Int): IndexedSeq[Array[Double]] = {
    val labels = new Array[Int](w * h)
    val parent = mutable.ArrayBuffer[Int](0)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    var next = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (px(y * w + x) != 0.0) {
          var lbl = 0
          // scan the 4 already-visited 8-neighbors
          var di = 0
          val nbs = Array((x - 1, y), (x - 1, y - 1), (x, y - 1), (x + 1, y - 1))
          while (di < 4) {
            val (nx, ny) = nbs(di)
            if (nx >= 0 && nx < w && ny >= 0) {
              val nl = labels(ny * w + nx)
              if (nl != 0) { if (lbl == 0) lbl = nl else union(lbl, nl) }
            }
            di += 1
          }
          if (lbl == 0) { next += 1; parent += next; lbl = next }
          labels(y * w + x) = lbl
        }
        x += 1
      }
      y += 1
    }
    // resolve + renumber in raster order of first appearance
    val renum = mutable.LinkedHashMap[Int, Int]()
    y = 0
    var idx = 0
    while (idx < w * h) {
      if (labels(idx) != 0) {
        val root = find(labels(idx))
        labels(idx) = renum.getOrElseUpdate(root, renum.size + 1)
      }
      idx += 1
    }
    val n = renum.size
    val area = new Array[Double](n); val sum = new Array[Double](n)
    val minV = Array.fill(n)(Double.MaxValue); val maxV = Array.fill(n)(Double.MinValue)
    val sx = new Array[Double](n); val sy = new Array[Double](n)
    val bx0 = Array.fill(n)(Int.MaxValue); val by0 = Array.fill(n)(Int.MaxValue)
    val bx1 = Array.fill(n)(-1); val by1 = Array.fill(n)(-1)
    val perim = new Array[Double](n)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = labels(y * w + x)
        if (l != 0) {
          val i = l - 1; val v = px(y * w + x)
          area(i) += 1; sum(i) += v
          if (v < minV(i)) minV(i) = v
          if (v > maxV(i)) maxV(i) = v
          sx(i) += x + 0.5; sy(i) += y + 0.5
          if (x < bx0(i)) bx0(i) = x
          if (y < by0(i)) by0(i) = y
          if (x > bx1(i)) bx1(i) = x
          if (y > by1(i)) by1(i) = y
          // edge-count perimeter: each exposed 4-neighbor side counts 1
          if (x == 0 || px(y * w + x - 1) == 0.0) perim(i) += 1
          if (x == w - 1 || px(y * w + x + 1) == 0.0) perim(i) += 1
          if (y == 0 || px((y - 1) * w + x) == 0.0) perim(i) += 1
          if (y == h - 1 || px((y + 1) * w + x) == 0.0) perim(i) += 1
        }
        x += 1
      }
      y += 1
    }
    (0 until n).map { i =>
      Array(area(i), sum(i) / area(i), minV(i), maxV(i),
        sx(i) / area(i), sy(i) / area(i), perim(i),
        bx0(i).toDouble, by0(i).toDouble,
        (bx1(i) - bx0(i) + 1).toDouble, (by1(i) - by0(i) + 1).toDouble)
    }
  }

  /** `runtable` dispatch: command → results table
    * (reference runWithTable, PortableImagePlus.scala:130-136). */
  def runTable(img: SparkImage, cmd: String, args: String): ResultsTable = cmd match {
    case "Analyze Particles..." | "Analyze Particles" => analyzeParticles(img)
    case "Measure" | "Measure..." =>
      val st = stats(img)
      ResultsTable(Array("Area", "Mean", "Min", "Max", "StdDev"),
        IndexedSeq(Array(st.pts.toDouble, st.mean, st.min, st.max, st.stdDev)))
    case other => throw new IllegalArgumentException(s"unknown table command: $other")
  }

  /** toarray escape hatch: `[h][w][slices]` doubles
    * (SQLFunctions.scala:176-184; layout Spiji.java:801-921). */
  def toArray3D(img: SparkImage): Array[Array[Array[Double]]] = {
    val px = img.toDoubles
    val (w, h, s) = (img.width, img.height, img.slices)
    Array.tabulate(h, w, s)((y, x, z) => px(z * w * h + y * w + x))
  }

  /** Replay a provenance log on another image: every RUN/THRESHOLD
    * entry re-executes in order. Because kernels are pure and noise is
    * content-seeded, replaying a pipeline's log on image B equals
    * applying the pipeline to B directly — provenance doubles as an
    * executable macro (the reference needed a separate ImageJ macro
    * recorder for this, Spiji.java:1520-1564). */
  def replayLog(img: SparkImage, logJson: String): SparkImage =
    ImageLog.parseOps(logJson).foldLeft(img) {
      case (im, (optype, opval, opargs)) if optype == "RUN" || optype == "THRESHOLD" =>
        run(im, opval, opargs)
      case (im, _) => im
    }

  // ---- synthetic source (reference createEmptyImages, scOps.scala:63-73)

  /** Constant-fill synthetic image (the debug source's engine). */
  def constantImage(width: Int, height: Int, slices: Int, value: Double,
                    pixelType: String = PixelCodec.Float32): SparkImage =
    SparkImage(ImageMeta(), ImageLog.create("constantImage", s"value=$value"),
      width, height, slices, pixelType,
      PixelCodec.encode(Array.fill(width * height * slices)(value), pixelType))

  /** Deterministic synthetic image with gaussian blobs — gives particle
    * analysis something non-trivial, still hash-exact. */
  def blobImage(width: Int, height: Int, nBlobs: Int, seed: Long): SparkImage = {
    val rng = new java.util.Random(seed)
    val px = new Array[Double](width * height)
    (0 until nBlobs).foreach { _ =>
      val cx = rng.nextInt(width); val cy = rng.nextInt(height)
      val r = 2 + rng.nextInt(6); val amp = 100 + rng.nextInt(155)
      var y = math.max(0, cy - 3 * r)
      while (y < math.min(height, cy + 3 * r)) {
        var x = math.max(0, cx - 3 * r)
        while (x < math.min(width, cx + 3 * r)) {
          val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
          px(y * width + x) += amp * math.exp(-d2.toDouble / (2.0 * r * r))
          x += 1
        }
        y += 1
      }
    }
    SparkImage(ImageMeta(), ImageLog.create("blobImage", s"nBlobs=$nBlobs seed=$seed"),
      width, height, 1, PixelCodec.Float32, PixelCodec.encode(px, PixelCodec.Float32))
  }
}
