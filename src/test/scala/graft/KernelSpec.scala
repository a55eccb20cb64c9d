package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._

/** Kernel unit tests — the reference's statistical-property assertions
  * (SpijiTests.scala:60-107, 176-231, 297-310) plus the hash-exact
  * determinism the reference couldn't have (seeded kernels). */
class KernelSpec extends AnyFunSuite with Matchers {

  private def const(v: Double, w: Int = 100, h: Int = 50) =
    Kernels.constantImage(w, h, 1, v)

  test("pixel codec round-trips every integer type exactly") {
    val values = Array(0.0, 1.0, 127.0, 255.0)
    for (t <- Seq(PixelCodec.Byte8, PixelCodec.Short16, PixelCodec.Int32,
                  PixelCodec.Long64, PixelCodec.Float32, PixelCodec.Double64)) {
      PixelCodec.decode(PixelCodec.encode(values, t), t, values.length) shouldBe values
    }
  }

  test("codec clamps out-of-range for narrow types") {
    PixelCodec.decode(PixelCodec.encode(Array(300.0, -5.0), PixelCodec.Byte8),
      PixelCodec.Byte8, 2) shouldBe Array(255.0, 0.0)
  }

  test("rgb decode uses MEAN strategy") {
    val img = SparkImage(ImageMeta(), "[]", 1, 1, 1, PixelCodec.Rgb,
      Array(30.toByte, 60.toByte, 90.toByte))
    img.toDoubles shouldBe Array(60.0)
  }

  test("rgb conversion strategies match the reference formula set (TImgTools.java:311-366)") {
    // channel values past 127 exercise the unsigned read (the
    // reference's signed-byte "+127" handling is a documented defect)
    val img = SparkImage(ImageMeta(), "[]", 1, 1, 1, PixelCodec.Rgb,
      Array(200.toByte, 60.toByte, 90.toByte))
    img.toDoubles("MEAN") shouldBe Array((200.0 + 60.0 + 90.0) / 3)
    img.toDoubles("SUM") shouldBe Array(350.0)
    img.toDoubles("MIN") shouldBe Array(60.0)
    img.toDoubles("MAX") shouldBe Array(200.0)
    img.toDoubles("INT") shouldBe Array(((200 << 16) | (60 << 8) | 90).toDouble)
    img.toDoubles("RED") shouldBe Array(200.0)
    img.toDoubles("GREEN") shouldBe Array(60.0)
    img.toDoubles("BLUE") shouldBe Array(90.0)
    an[IllegalArgumentException] should be thrownBy img.toDoubles("LUMA")
    // run2 surface: channel extraction via the conversion commands
    Kernels.run(img, "32-bit", "rgb=red").toDoubles shouldBe Array(200.0)
    Kernels.run(img, "8-bit", "rgb=blue").toDoubles shouldBe Array(90.0)
  }

  test("ROI restricts stats, histogram and threshold to the selection (Spiji.java:515-613)") {
    // 10x10 image: left half 10.0, right half 90.0
    val px = Array.tabulate(100)(i => if (i % 10 < 5) 10.0 else 90.0)
    val img = SparkImage(ImageMeta(), "[]", 10, 10, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    Kernels.stats(img).mean shouldBe 50.0
    val leftRoi = Kernels.run(img, "setRoi", "x=0 y=0 width=5 height=10")
    Kernels.stats(leftRoi).mean shouldBe 10.0
    Kernels.stats(leftRoi).pts shouldBe 50L
    // w=/h= arg aliases + reset
    val rightRoi = Kernels.run(img, "setRoi", "x=5 y=0 w=5 h=10")
    Kernels.stats(rightRoi).mean shouldBe 90.0
    Kernels.stats(Kernels.run(rightRoi, "resetRoi")).mean shouldBe 50.0
    // out-of-bounds ROI is an error
    an[IllegalArgumentException] should be thrownBy
      Kernels.run(img, "setRoi", "x=8 y=0 width=5 height=5")
    // histogram respects the ROI
    Kernels.histogram(leftRoi, 0.0, 100.0, 2).counts shouldBe Array(50L, 0L)
    // threshold masks inside the ROI only; outside is background
    val masked = Kernels.run(rightRoi, "setThreshold", "lower=50 upper=100")
    val mpx = masked.toDoubles
    mpx.count(_ == 255.0) shouldBe 50
    (0 until 100).filter(i => i % 10 < 5).map(mpx) shouldBe Seq.fill(50)(0.0)
  }

  test("ROI'd particle analysis reports absolute coordinates") {
    val px = new Array[Double](400)
    for (y <- 2 to 4; x <- 2 to 4) px(y * 20 + x) = 9.0
    for (y <- 12 to 14; x <- 12 to 14) px(y * 20 + x) = 5.0
    val img = SparkImage(ImageMeta(), "[]", 20, 20, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    val roi = Kernels.run(img, "setRoi", "x=0 y=0 width=10 height=10")
    val t = Kernels.analyzeParticles(roi)
    t.rows.length shouldBe 1 // only the first blob is inside the ROI
    t.firstRow("X") shouldBe 3.5 // absolute coords, not ROI-local
    t.firstRow("BX") shouldBe 2.0
    val shifted = Kernels.analyzeParticles(Kernels.run(img, "setRoi", "x=10 y=10 w=10 h=10"))
    shifted.firstRow("X") shouldBe 13.5
    shifted.firstRow("BY") shouldBe 12.0
  }

  test("particle analysis is stack-aware with a per-slice Slice column (IjRDDTests.scala:30-99)") {
    // 3-slice stack: 1 blob on slice 1, 2 blobs on slice 2, empty slice 3
    def sliceWith(blobs: Seq[(Int, Int)]): Array[Double] = {
      val px = new Array[Double](100)
      blobs.foreach { case (cx, cy) =>
        for (y <- cy to cy + 1; x <- cx to cx + 1) px(y * 10 + x) = 7.0
      }
      px
    }
    val data = sliceWith(Seq((1, 1))) ++ sliceWith(Seq((1, 1), (6, 6))) ++ sliceWith(Nil)
    val stack = SparkImage(ImageMeta(), "[]", 10, 10, 3, PixelCodec.Float32,
      PixelCodec.encode(data, PixelCodec.Float32))
    val t = Kernels.analyzeParticles(stack)
    t.rows.length shouldBe 3
    t.column("Slice").get shouldBe Array(1.0, 2.0, 2.0)
    t.column("Area").get shouldBe Array(4.0, 4.0, 4.0)
    t.column("X").get shouldBe Array(2.0, 2.0, 7.0)
  }

  test("value calibration: stats in calibrated units (IJCalibration.java:98-121)") {
    val raw = const(1000.0)
    // CT: HU = -1024 + 1*raw (the applyOffset use-case as a function)
    val ct = Kernels.run(raw, "setCalibration", "function=line coeffs=-1024,1 unit=HU")
    Kernels.stats(ct).mean shouldBe -24.0
    Kernels.stats(ct).min shouldBe -24.0
    ct.meta.valueUnit shouldBe "HU"
    // poly2 and power forms
    val p2 = Kernels.run(const(10.0), "setCalibration", "function=poly2 coeffs=1,2,3")
    Kernels.stats(p2).mean shouldBe (1.0 + 2.0 * 10 + 3.0 * 100)
    val pw = Kernels.run(const(9.0), "setCalibration", "function=power coeffs=2,0.5")
    Kernels.stats(pw).mean shouldBe 6.0
    an[IllegalArgumentException] should be thrownBy
      Kernels.run(raw, "setCalibration", "function=sigmoid coeffs=1")
    // raw pixel data untouched: decode still returns stored values
    ct.toDoubles.head shouldBe 1000.0
    // explicit cTable wins over the function form and clamps at edges
    val small = Kernels.constantImage(2, 2, 1, 3.0, PixelCodec.Byte8)
    val tabled = Kernels.withCalibrationTable(small, Seq(0.0, 10.0, 20.0, 30.0), "HU")
    Kernels.stats(tabled).mean shouldBe 30.0
    val clamped = Kernels.withCalibrationTable(
      Kernels.constantImage(2, 2, 1, 9.0, PixelCodec.Byte8), Seq(0.0, 10.0))
    Kernels.stats(clamped).mean shouldBe 10.0
  }

  test("16-bit images survive an encode/decode round-trip (PNG USHORT_GRAY)") {
    val vals = Array(0.0, 255.0, 256.0, 4095.0, 65535.0, 40000.0)
    val img = SparkImage(ImageMeta(), "[]", 3, 2, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val back = graft.sources.ImageCodecIO.decode("t.png",
      graft.sources.ImageCodecIO.encode(img, "png"))
    back.pixelType shouldBe PixelCodec.Short16
    back.toDoubles shouldBe vals
  }

  test("multi-page TIFF round-trips a stack with slice order preserved") {
    // distinct per-slice values: any page permutation/truncation fails
    val perSlice = Array(100.0, 2000.0, 30000.0, 65535.0)
    val px = perSlice.flatMap(v => Array.fill(6)(v))
    val img = SparkImage(ImageMeta(), "[]", 3, 2, 4, PixelCodec.Short16,
      PixelCodec.encode(px, PixelCodec.Short16))
    val back = graft.sources.ImageCodecIO.decode("t.tif",
      graft.sources.ImageCodecIO.encode(img, "tif"))
    back.slices shouldBe 4
    back.pixelType shouldBe PixelCodec.Short16
    back.toDoubles shouldBe px
    // 8-bit stacks round-trip through BYTE_GRAY pages too
    val img8 = SparkImage(ImageMeta(), "[]", 2, 2, 3, PixelCodec.Byte8,
      PixelCodec.encode(Array(1.0, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3), PixelCodec.Byte8))
    val back8 = graft.sources.ImageCodecIO.decode("t.tif",
      graft.sources.ImageCodecIO.encode(img8, "tiff"))
    back8.slices shouldBe 3
    back8.toDoubles shouldBe img8.toDoubles
  }

  test("COMPRESSED multi-page TIFF (LZW / Deflate / PackBits) decodes bit-exact") {
    // third-party archives arrive compressed (TIFF tag 259 = 5/8/32773);
    // the decode path must handle them even though graft writes
    // uncompressed — write via the JDK encoder with each compression
    // type and decode through the SAME ImageCodecIO.decode entry
    val perSlice = Array(7.0, 1234.0, 65535.0)
    val px = perSlice.flatMap(v => Array.fill(4)(v))
    def compressedTiff(codec: String): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(codec)
      writer.prepareWriteSequence(null)
      perSlice.foreach { v =>
        val bi = new java.awt.image.BufferedImage(2, 2,
          java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
        (0 until 4).foreach(i => bi.getRaster.setSample(i % 2, i / 2, 0, v.toInt))
        writer.writeToSequence(new javax.imageio.IIOImage(bi, null, null), p)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    Seq("LZW", "Deflate", "PackBits").foreach { codec =>
      val back = graft.sources.ImageCodecIO.decode(s"c_$codec.tif", compressedTiff(codec))
      withClue(s"$codec: ") {
        back.slices shouldBe 3
        back.pixelType shouldBe PixelCodec.Short16
        back.toDoubles shouldBe px
      }
    }
  }

  test("DICOM encode/decode round-trips 16-bit pixels, instance number, and magic dispatch") {
    val vals = Array(0.0, 255.0, 256.0, 4095.0, 65535.0, 40000.0)
    val img = SparkImage(ImageMeta(), "[]", 3, 2, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val bytes = graft.sources.ImageCodecIO.encodeDicom(img, instance = 7)
    // Part 10 magic sits after the 128-byte preamble
    new String(bytes.slice(128, 132), "US-ASCII") shouldBe "DICM"
    val (back, inst) = graft.sources.ImageCodecIO.decodeDicomWithInstance("t.dcm", bytes)
    inst shouldBe 7
    back.pixelType shouldBe PixelCodec.Short16
    back.width shouldBe 3
    back.height shouldBe 2
    back.toDoubles shouldBe vals
    // the generic decode() dispatches on the magic, not the extension
    graft.sources.ImageCodecIO.decode("noext", bytes).toDoubles shouldBe vals
    // slice selection picks the right page of a stack
    val stack = SparkImage(ImageMeta(), "[]", 2, 1, 3, PixelCodec.Short16,
      PixelCodec.encode(Array(10.0, 10, 20, 20, 30, 30), PixelCodec.Short16))
    graft.sources.ImageCodecIO.decode("s.dcm",
      graft.sources.ImageCodecIO.encodeDicom(stack, instance = 2, slice = 1))
      .toDoubles shouldBe Array(20.0, 20.0)
  }

  test("JPEG Lossless SV1 DICOM round-trips worst-case differences and compresses smooth data") {
    import graft.sources.ImageCodecIO
    // alternating 0/65535 wraps to ±1 under mod-2^16 differencing; the
    // planted 0→32768 steps hit difference 32768 exactly — magnitude
    // category 16, the one symbol with NO extra bits (both signs: the
    // following 32768→0 step is −32768 ≡ 32768 mod 2^16 as well)
    val w = 5; val h = 4
    val hostile = Array.tabulate(w * h)(i => if (i % 2 == 0) 0.0 else 65535.0)
    hostile(0) = 32768.0
    hostile(6) = 0.0; hostile(7) = 32768.0; hostile(8) = 0.0
    val img = SparkImage(ImageMeta(), "[]", w, h, 1, PixelCodec.Short16,
      PixelCodec.encode(hostile, PixelCodec.Short16))
    val bytes = ImageCodecIO.encodeDicom(img, instance = 3,
      transferSyntax = ImageCodecIO.TsJpegLossless)
    val (back, inst) = ImageCodecIO.decodeDicomWithInstance("j.dcm", bytes)
    inst shouldBe 3
    back.toDoubles shouldBe hostile
    // smooth data (the realistic case) must actually compress: a ramp's
    // differences are tiny, so 5-bit codes + short mantissas beat raw 16-bit
    val rampPx = Array.tabulate(64 * 64)(i => ((i % 64) * 3 + (i / 64)).toDouble)
    val ramp = SparkImage(ImageMeta(), "[]", 64, 64, 1, PixelCodec.Short16,
      PixelCodec.encode(rampPx, PixelCodec.Short16))
    val jpeg = ImageCodecIO.encodeDicom(ramp, transferSyntax = ImageCodecIO.TsJpegLossless)
    val raw = ImageCodecIO.encodeDicom(ramp, transferSyntax = ImageCodecIO.TsExplicitLE)
    jpeg.length.toDouble should be < raw.length * 0.75
    ImageCodecIO.decodeDicomWithInstance("r.dcm", jpeg)._1.toDoubles shouldBe rampPx
  }

  test("JPEG process-14 (.57) round-trips losslessly; JPEG Baseline (.50) decodes 8-bit with lossy tolerance") {
    import graft.sources.ImageCodecIO
    // .57 (process 14, any predictor): encode emits the SV1 stream — a
    // legal process-14 stream — under the .57 UID; decode is exact
    val vals = Array(100.0, 200.0, 300.0, 65535.0, 0.0, 12345.0)
    val img = SparkImage(ImageMeta(), "[]", 3, 2, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val b57 = ImageCodecIO.encodeDicom(img, instance = 9,
      transferSyntax = ImageCodecIO.TsJpegLossless14)
    val (back57, inst57) = ImageCodecIO.decodeDicomWithInstance("l57.dcm", b57)
    inst57 shouldBe 9
    back57.toDoubles shouldBe vals
    // .50 (8-bit baseline, LOSSY): geometry + instance exact, pixel
    // values within DCT-quantization tolerance of the 8-bit original
    val smoothPx = Array.tabulate(16 * 16)(i => 100.0 + (i % 16))
    val smooth = SparkImage(ImageMeta(), "[]", 16, 16, 1, PixelCodec.Byte8,
      PixelCodec.encode(smoothPx, PixelCodec.Byte8))
    val b50 = ImageCodecIO.encodeDicom(smooth, instance = 4,
      transferSyntax = ImageCodecIO.TsJpegBaseline)
    val (back50, inst50) = ImageCodecIO.decodeDicomWithInstance("b50.dcm", b50)
    inst50 shouldBe 4
    back50.pixelType shouldBe PixelCodec.Byte8
    back50.width shouldBe 16
    back50.height shouldBe 16
    val got = back50.toDoubles
    got.indices.foreach { i =>
      math.abs(got(i) - smoothPx(i)) should be <= 6.0
    }
  }

  test("multi-frame DICOM round-trips a whole stack in every lossless syntax") {
    import graft.sources.ImageCodecIO
    // 3 frames, 4x3, values distinct per frame AND hostile per syntax
    // (65535/0 steps stress RLE + the JPEG-family predictors)
    val w = 4; val h = 3; val nf = 3
    val vals = Array.tabulate(nf * w * h) { i =>
      val f = i / (w * h)
      if (i % 7 == 0) 65535.0 else (f * 1000 + (i % (w * h)) * 13).toDouble
    }
    val stack = SparkImage(ImageMeta(), "[]", w, h, nf, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    Seq(ImageCodecIO.TsImplicitLE, ImageCodecIO.TsExplicitLE,
        ImageCodecIO.TsExplicitBE, ImageCodecIO.TsRle,
        ImageCodecIO.TsJpegLossless, ImageCodecIO.TsJpegLossless14,
        ImageCodecIO.TsJpegLs, ImageCodecIO.TsJpeg2000Lossless).foreach { ts =>
      withClue(s"$ts: ") {
        val bytes = ImageCodecIO.encodeDicom(stack, instance = 5,
          transferSyntax = ts, frames = nf)
        val (back, inst) = ImageCodecIO.decodeDicomWithInstance("mf.dcm", bytes)
        inst shouldBe 5
        back.slices shouldBe nf
        back.width shouldBe w
        back.height shouldBe h
        back.toDoubles shouldBe vals
      }
    }
    // a frame subrange: frames [1, 3) of the stack
    val sub = ImageCodecIO.decodeDicomWithInstance("sub.dcm",
      ImageCodecIO.encodeDicom(stack, slice = 1, transferSyntax = ImageCodecIO.TsRle,
        frames = 2))._1
    sub.slices shouldBe 2
    sub.toDoubles shouldBe vals.slice(w * h, 3 * w * h)
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(stack, slice = 2, frames = 2) // past the stack
  }

  test("RGB DICOM round-trips both planar configurations in the native syntaxes and RLE") {
    import graft.sources.ImageCodecIO
    // 2 frames of 3x2 RGB with all-distinct channel bytes (and values
    // >= 128 to catch any signed-byte mishap)
    val w = 3; val h = 2; val nf = 2
    val data = Array.tabulate(nf * w * h * 3)(i => ((i * 41 + 7) % 256).toByte)
    val rgb = SparkImage(ImageMeta(), "[]", w, h, nf, PixelCodec.Rgb, data)
    for {
      ts <- Seq(ImageCodecIO.TsImplicitLE, ImageCodecIO.TsExplicitLE,
                ImageCodecIO.TsExplicitBE, ImageCodecIO.TsRle)
      planar <- Seq(0, 1)
    } withClue(s"$ts planar=$planar: ") {
      val bytes = ImageCodecIO.encodeDicom(rgb, instance = 2, transferSyntax = ts,
        frames = nf, planarConfig = planar)
      val (back, inst) = ImageCodecIO.decodeDicomWithInstance("rgb.dcm", bytes)
      inst shouldBe 2
      back.pixelType shouldBe PixelCodec.Rgb
      back.slices shouldBe nf
      back.data shouldBe data
      // channel strategies see the true channels, not a gray replica
      back.toDoubles("RED").head shouldBe (data(0) & 0xff).toDouble
      back.toDoubles("BLUE").head shouldBe (data(2) & 0xff).toDouble
    }
    // the still-single-component JPEG syntaxes (lossless DCT-family)
    // must reject color, not mis-encode
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsJpegLossless)
  }

  test("DICOM JPEG 2000 lossy (.91): bounded error, color rejects, sniffs") {
    import graft.sources.ImageCodecIO
    val w = 48; val h = 32
    val vals = Array.tabulate(w * h)(i => ((i % w) * 80 + (i / w) * 40 + 500).toDouble)
    val img = SparkImage(ImageMeta(), "[]", w, h, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val bytes = ImageCodecIO.encodeDicom(img, instance = 8,
      transferSyntax = ImageCodecIO.TsJpeg2000)
    ImageCodecIO.dicomTransferSyntax("l.dcm", bytes) shouldBe ImageCodecIO.TsJpeg2000
    val (back, inst) = ImageCodecIO.decodeDicomWithInstance("l.dcm", bytes)
    inst shouldBe 8
    val errs = back.toDoubles("").zip(vals).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 6 * ImageCodecIO.J2kLossyStep + 1,
      s".91 max error ${errs.max} exceeds the quantizer envelope")
    assert(errs.max > 0, ".91 is a lossy profile — an exact result means the 9/7 path did not run")
    // .91 carries reversible streams legally: a .90-shape codestream
    // under the .91 UID decodes bit-exactly
    val revBytes = ImageCodecIO.encodeDicom(img, transferSyntax = ImageCodecIO.TsJpeg2000Lossless)
    ImageCodecIO.decodeDicomWithInstance("r.dcm", revBytes)._1.toDoubles("") shouldBe vals
    // color .91 writes reject (the irreversible color transform is
    // not implemented); palette + lossy rejects per PS3.5 8.2.1
    val rgb = SparkImage(ImageMeta(), "[]", 4, 4, 1, PixelCodec.Rgb, new Array[Byte](48))
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsJpeg2000)
    // .91 is LOSSY: the same guard set that fences the other lossy
    // syntaxes (palette indices, inverted MONOCHROME1, Rescale'd CT)
    // must fence it too
    val lut = Some((Array.tabulate(256)(_ * 257), Array.tabulate(256)(_ * 257),
      Array.tabulate(256)(_ * 257), 8))
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(img, transferSyntax = ImageCodecIO.TsJpeg2000,
        palette = lut)
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(img, transferSyntax = ImageCodecIO.TsJpeg2000,
        photometric = "MONOCHROME1")
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(img, transferSyntax = ImageCodecIO.TsJpeg2000,
        rescale = Some((2.0, -1024.0)))
  }

  test("DICOM JPEG-LS color: lossless RGB/YBR_FULL in both scan layouts; near-lossless bound") {
    import graft.sources.ImageCodecIO
    val w = 19; val h = 11; val nf = 2
    val data = Array.tabulate(nf * w * h * 3)(i => ((i * 31 + 5) % 256).toByte)
    val rgb = SparkImage(ImageMeta(), "[]", w, h, nf, PixelCodec.Rgb, data)
    for (pi <- Seq("RGB", "YBR_FULL"); ilv <- Seq(0, 1)) withClue(s"$pi ilv=$ilv: ") {
      val bytes = ImageCodecIO.encodeDicom(rgb, instance = 3,
        transferSyntax = ImageCodecIO.TsJpegLs, frames = nf, photometric = pi,
        jlsIlv = ilv)
      val (back, inst) = ImageCodecIO.decodeDicomWithInstance("jlsc.dcm", bytes)
      inst shouldBe 3
      back.pixelType shouldBe PixelCodec.Rgb
      back.slices shouldBe nf
      if (pi == "RGB") back.data shouldBe data
      else {
        // YBR_FULL: lossless on the CONVERTED bytes, so the read-back
        // equals the native-syntax YBR_FULL round trip of the same
        // image — compare against that reference path
        val native = ImageCodecIO.decodeDicomWithInstance("ref.dcm",
          ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsExplicitLE,
            frames = nf, photometric = "YBR_FULL"))._1
        back.data shouldBe native.data
      }
    }
    // near-lossless color (.81): per-sample bound on the coded
    // components (RGB photometric keeps it in RGB space)
    val near = ImageCodecIO.decodeDicomWithInstance("jlsn.dcm",
      ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsJpegLsNear,
        frames = nf, photometric = "RGB"))._1
    val maxErr = near.data.zip(data).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 2, s"JPEG-LS near color: max error $maxErr > NEAR 2")
    // 422 has no component-plane form: loud reject
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsJpegLs,
        photometric = "YBR_FULL_422")
  }

  test("DICOM JPEG 2000 color (YBR_RCT + RGB) and tile grids round-trip losslessly") {
    import graft.sources.ImageCodecIO
    val w = 21; val h = 10; val nf = 2
    val data = Array.tabulate(nf * w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val rgb = SparkImage(ImageMeta(), "[]", w, h, nf, PixelCodec.Rgb, data)
    for (pi <- Seq("YBR_RCT", "RGB")) withClue(s"$pi: ") {
      val bytes = ImageCodecIO.encodeDicom(rgb, instance = 6,
        transferSyntax = ImageCodecIO.TsJpeg2000Lossless, frames = nf, photometric = pi)
      val (back, inst) = ImageCodecIO.decodeDicomWithInstance("j2kc.dcm", bytes)
      inst shouldBe 6
      back.pixelType shouldBe PixelCodec.Rgb
      back.slices shouldBe nf
      back.data shouldBe data // in-stream RCT (or none) inverts exactly
    }
    // RCT earns its keep on correlated color: smaller file, same pixels
    val corr = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      (40 + (p % w) * 3 + (p / w) * 2 + c * 25).toByte
    }
    val cImg = SparkImage(ImageMeta(), "[]", w, h, 1, PixelCodec.Rgb, corr)
    val rctBytes = ImageCodecIO.encodeDicom(cImg,
      transferSyntax = ImageCodecIO.TsJpeg2000Lossless, photometric = "YBR_RCT")
    val rgbBytes = ImageCodecIO.encodeDicom(cImg,
      transferSyntax = ImageCodecIO.TsJpeg2000Lossless, photometric = "RGB")
    assert(rctBytes.length < rgbBytes.length)
    // tiled grayscale: a 130x70 ramp over 64x64 tiles (2x2 grid with
    // partial edge tiles) round-trips exactly, frames in fragments too
    val gw = 130; val gh = 70
    val gvals = Array.tabulate(gw * gh)(i => ((i * 13) % 60000).toDouble)
    val gray = SparkImage(ImageMeta(), "[]", gw, gh, 1, PixelCodec.Short16,
      PixelCodec.encode(gvals, PixelCodec.Short16))
    for (frag <- Seq(0, 512)) withClue(s"fragmentBytes=$frag: ") {
      val bytes = ImageCodecIO.encodeDicom(gray,
        transferSyntax = ImageCodecIO.TsJpeg2000Lossless, j2kTile = 64,
        fragmentBytes = frag)
      val (back, _) = ImageCodecIO.decodeDicomWithInstance("j2kt.dcm", bytes)
      back.toDoubles("") shouldBe gvals
    }
    // tiled color: both layouts compose
    val tiledColor = ImageCodecIO.encodeDicom(
      SparkImage(ImageMeta(), "[]", 100, 80, 1, PixelCodec.Rgb,
        Array.tabulate(100 * 80 * 3)(i => ((i * 29 + 3) % 256).toByte)),
      transferSyntax = ImageCodecIO.TsJpeg2000Lossless, photometric = "YBR_RCT",
      j2kTile = 64)
    ImageCodecIO.decodeDicomWithInstance("j2ktc.dcm", tiledColor)._1
      .data.length shouldBe 100 * 80 * 3
    // loud rejects: YBR_RCT outside .90; tiles outside .90; unaligned tile
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(rgb, transferSyntax = ImageCodecIO.TsExplicitLE,
        photometric = "YBR_RCT")
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(gray, transferSyntax = ImageCodecIO.TsExplicitLE,
        photometric = "MONOCHROME2", j2kTile = 64)
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.encodeDicom(gray, transferSyntax = ImageCodecIO.TsJpeg2000Lossless,
        j2kTile = 60)
  }

  test("dicomTransferSyntax sniffs the meta group for every syntax; rejects non-DICOM bytes") {
    import graft.sources.ImageCodecIO
    val img = SparkImage(ImageMeta(), "[]", 2, 2, 1, PixelCodec.Short16,
      PixelCodec.encode(Array(1.0, 2, 3, 4), PixelCodec.Short16))
    Seq(ImageCodecIO.TsImplicitLE, ImageCodecIO.TsExplicitLE,
        ImageCodecIO.TsExplicitBE, ImageCodecIO.TsRle,
        ImageCodecIO.TsJpegLossless, ImageCodecIO.TsJpegLossless14,
        ImageCodecIO.TsJpegBaseline, ImageCodecIO.TsJpegLs,
        ImageCodecIO.TsJpeg2000Lossless).foreach { ts =>
      ImageCodecIO.dicomTransferSyntax("t.dcm",
        ImageCodecIO.encodeDicom(img, transferSyntax = ts)) shouldBe ts
    }
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.dicomTransferSyntax("junk", Array.fill(200)(7.toByte))
  }

  test("JPEG-LS round-trips hostile, flat, ramp and random frames bit-exactly at 8/12/16-bit") {
    import graft.sources.JpegLsCodec
    val rnd = new scala.util.Random(1234)
    // random frames across precisions and shapes (incl. 1-wide and
    // 1-tall edges); random data drives regular mode, plateaus drive
    // run mode with interruption samples at every plateau boundary
    for (p <- Seq(8, 12, 16); (w, h) <- Seq((1, 7), (7, 1), (5, 4), (16, 16), (33, 9))) {
      val maxv = (1 << p) - 1
      val vals = Array.fill(w * h)(rnd.nextInt(maxv + 1))
      val (dw, dh, dp, back) = JpegLsCodec.decode(JpegLsCodec.encode(vals, w, h, p), "t")
      (dw, dh, dp) shouldBe ((w, h, p))
      back shouldBe vals
      val plateau = Array.tabulate(w * h)(i => if ((i / 5) % 2 == 0) 7 else maxv - 3)
      JpegLsCodec.decode(JpegLsCodec.encode(plateau, w, h, p), "t")._4 shouldBe plateau
    }
    // worst-case 16-bit alternation (max-magnitude residuals, escape coding)
    val hostile = Array.tabulate(64)(i => if (i % 2 == 0) 0 else 65535)
    JpegLsCodec.decode(JpegLsCodec.encode(hostile, 8, 8, 16), "t")._4 shouldBe hostile
    // flat frame: pure run mode, and it must COMPRESS (64x64x2 raw
    // bytes down to a few dozen — one run code per line)
    val flat = Array.fill(64 * 64)(1234)
    val flatBytes = JpegLsCodec.encode(flat, 64, 64, 16)
    JpegLsCodec.decode(flatBytes, "t")._4 shouldBe flat
    flatBytes.length should be < 200
    // smooth ramp: regular mode with small residuals, must beat raw
    val ramp = Array.tabulate(64 * 64)(i => (i % 64) * 3 + (i / 64))
    val rampBytes = JpegLsCodec.encode(ramp, 64, 64, 16)
    JpegLsCodec.decode(rampBytes, "t")._4 shouldBe ramp
    rampBytes.length should be < (64 * 64 * 2 * 3) / 4
  }

  test("JPEG-LS decoder handles third-party stream shapes: APPn/COM segments and a default-preset LSE") {
    import graft.sources.JpegLsCodec
    val vals = Array.tabulate(24)(i => (i * 977) % 65536)
    val own = JpegLsCodec.encode(vals, 6, 4, 16)
    // splice APP0 + COM + LSE(default restatement for P=16) after SOI —
    // segments our encoder never writes but conformant encoders do
    // (LSE parameters for MAXVAL=65535: T1=18 T2=67 T3=276 RESET=64)
    def seg(marker: Int, payload: Array[Int]): Array[Byte] = {
      val len = payload.length + 2
      (Array(0xff, marker, (len >> 8) & 0xff, len & 0xff) ++ payload).map(_.toByte)
    }
    val app0 = seg(0xe0, "JLS-test".map(_.toInt).toArray)
    val com = seg(0xfe, "third party comment".map(_.toInt).toArray)
    val lse = seg(0xf8, Array(1, 0xff, 0xff, 0, 18, 0, 67, 1, 20, 0, 64))
    // LSE must come after SOF55 (it needs the precision); splice it in
    // front of SOS, the APP/COM in front of SOF55
    val sofAt = own.indexOfSlice(Seq(0xff.toByte, 0xf7.toByte))
    val sosAt = own.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    val spliced = own.slice(0, 2) ++ app0 ++ com ++ own.slice(sofAt, sosAt) ++
      lse ++ own.slice(sosAt, own.length)
    val (w, h, p, back) = JpegLsCodec.decode(spliced, "third.jls")
    (w, h, p) shouldBe ((6, 4, 16))
    back shouldBe vals
    // a NON-default LSE is rejected loudly, never mis-decoded
    val badLse = seg(0xf8, Array(1, 0xff, 0xff, 0, 19, 0, 67, 1, 20, 0, 64))
    val badSpliced = own.slice(0, sosAt) ++ badLse ++ own.slice(sosAt, own.length)
    an[IllegalArgumentException] should be thrownBy
      JpegLsCodec.decode(badSpliced, "bad.jls")
  }

  test("JPEG-LS DICOM (.80) round-trips through the encapsulated PixelData path") {
    import graft.sources.ImageCodecIO
    val vals = Array(0.0, 65535.0, 32768.0, 40000.0, 123.0, 123.0, 123.0, 9.0)
    val img = SparkImage(ImageMeta(), "[]", 4, 2, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val bytes = ImageCodecIO.encodeDicom(img, instance = 11,
      transferSyntax = ImageCodecIO.TsJpegLs)
    val (back, inst) = ImageCodecIO.decodeDicomWithInstance("ls.dcm", bytes)
    inst shouldBe 11
    back.width shouldBe 4
    back.height shouldBe 2
    back.toDoubles shouldBe vals
    // magic dispatch reads it without the extension hint
    ImageCodecIO.decode("noext", bytes).toDoubles shouldBe vals
  }

  test("JPEG 2000 DICOM (.90) round-trips through the encapsulated PixelData path") {
    import graft.sources.ImageCodecIO
    val rnd = new scala.util.Random(90)
    val vals = Array.fill(48 * 20)(rnd.nextInt(65536).toDouble)
    val img = SparkImage(ImageMeta(), "[]", 48, 20, 1, PixelCodec.Short16,
      PixelCodec.encode(vals, PixelCodec.Short16))
    val bytes = ImageCodecIO.encodeDicom(img, instance = 90,
      transferSyntax = ImageCodecIO.TsJpeg2000Lossless)
    val (back, inst) = ImageCodecIO.decodeDicomWithInstance("j2k.dcm", bytes)
    inst shouldBe 90
    back.width shouldBe 48
    back.height shouldBe 20
    back.toDoubles shouldBe vals
    // magic dispatch reads it without the extension hint
    ImageCodecIO.decode("noext", bytes).toDoubles shouldBe vals
  }

  test("JPEG 2000 decoder handles third-party stream shapes: COM segments, odd code-blocks, 1-level and 0-level streams") {
    import graft.sources.Jpeg2000Codec
    val rnd = new scala.util.Random(800)
    val vals = Array.fill(40 * 24)(rnd.nextInt(65536))
    // parameters our DICOM writer never uses: 16x32 code blocks, 1 and
    // 0 decomposition levels — the decoder must honour COD, not assume
    for ((lv, cbx, cby) <- Seq((1, 4, 5), (0, 6, 6), (3, 5, 4))) {
      val enc = Jpeg2000Codec.encode(vals, 40, 24, 16, lv, cbx, cby)
      Jpeg2000Codec.decode(enc, "t.j2k")._4 shouldBe vals
    }
    // splice a COM (comment) marker segment between QCD and SOT — legal
    // main-header content our encoder never writes
    val own = Jpeg2000Codec.encode(vals, 40, 24, 16)
    val sotAt = own.indexOfSlice(Seq(0xff.toByte, 0x90.toByte))
    sotAt should be > 0
    val comPayload = "third party comment".getBytes("US-ASCII")
    val com = Array[Byte](0xff.toByte, 0x64.toByte,
      (((comPayload.length + 4) >> 8) & 0xff).toByte, ((comPayload.length + 4) & 0xff).toByte,
      0, 1) ++ comPayload // Rcom=1: latin-1 text
    val spliced = own.slice(0, sotAt) ++ com ++ own.slice(sotAt, own.length)
    Jpeg2000Codec.decode(spliced, "com.j2k")._4 shouldBe vals
    // a marker that CHANGES decoding (POC) rejects loudly
    val poc = Array[Byte](0xff.toByte, 0x5f.toByte, 0, 9, 0, 0, 0, 1, 0, 4, 1, 4, 0)
    val badSpliced = own.slice(0, sotAt) ++ poc ++ own.slice(sotAt, own.length)
    an[IllegalArgumentException] should be thrownBy
      Jpeg2000Codec.decode(badSpliced, "poc.j2k")
  }

  test("JPEG Lossless decoder handles third-party streams: tuned Huffman table, predictor 4, APPn/COM segments") {
    import graft.sources.ImageCodecIO
    // hand-build a stream this encoder would never emit: an APP0 and a
    // COM segment to skip, a two-length Huffman table (0→'0', 1→'10',
    // rest unused), and SOS predictor selection 4 (Ra + Rb − Rc).
    // Samples: a 3x2 frame of {1000 1001 1001 / 1001 1002 1002}.
    // Raster diffs under the standard's first-line/first-column rules:
    //   (0,0): pred 32768 → d = 1000-32768 = -31768  … too wide for the
    // tiny table, so keep first pixel = 32768 (d=0) instead:
    //   samples {32768 32769 32769 / 32769 32770 32770}
    //   (0,0) d=0 [cat 0]; (1,0) Ra d=+1 [cat 1, bit 1]; (2,0) Ra d=0
    //   (0,1) Rb d=+1; (1,1) P4: 32770-(32769+32769-32768)=0
    //   (2,1) P4: 32770-(32770+32769-32769)=0
    val bos = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { bos.write(0xff); bos.write(mk) }
    def u16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    m(0xd8)
    m(0xe0); u16(4); bos.write('x'); bos.write('y')          // APP0: skipped
    m(0xc3); u16(11); bos.write(16); u16(2); u16(3); bos.write(1)
    bos.write(1); bos.write(0x11); bos.write(0)
    m(0xfe); u16(5); bos.write('c'); bos.write('o'); bos.write('m') // COM: skipped
    m(0xc4); u16(2 + 1 + 16 + 2); bos.write(0x00)
    bos.write(1); bos.write(1); (3 to 16).foreach(_ => bos.write(0)) // BITS: 1@len1, 1@len2
    bos.write(0); bos.write(1)                                       // HUFFVAL: 0, 1
    m(0xda); u16(8); bos.write(1); bos.write(1); bos.write(0x00)
    bos.write(4); bos.write(0); bos.write(0x00)
    // entropy bits: 0 | 10 1 | 0 | 10 1 | 0 | 0 → 01010101 00<pad 1s>
    bos.write(Integer.parseInt("01010101", 2)); bos.write(Integer.parseInt("00111111", 2))
    m(0xd9)
    val (jw, jh, got) = ImageCodecIO.jpegLosslessDecode(bos.toByteArray, "handmade.jpg")
    (jw, jh) shouldBe ((3, 2))
    got.toSeq shouldBe Seq(32768, 32769, 32769, 32769, 32770, 32770)
    // lossy SOF0 frames reject loudly, never mis-decode
    val lossy = bos.toByteArray.clone()
    lossy(9) = 0xc0.toByte // the SOF3 marker byte (SOI=2 + APP0 segment=6, +1)
    an[IllegalArgumentException] should be thrownBy
      ImageCodecIO.jpegLosslessDecode(lossy, "lossy.jpg")
  }

  test("processSlices applies a custom per-slice kernel (PortableImagePlus.scala:171-183)") {
    val base = Kernels.constantImage(4, 3, 2, 10.0)
    val doubled = Kernels.processSlices(base)((sl, _, _) => sl.map(_ * 2))
    Kernels.stats(doubled).mean shouldBe 20.0
    doubled.slices shouldBe 2
    doubled.log should include ("processSlices")
  }

  test("geometry commands log exactly one provenance entry (replay applies once)") {
    val img = const(5.0, 8, 8)
    val resized = Kernels.run(img, "Size...", "width=4 height=4")
    ImageLog.parseOps(resized.log).count(_._2 == "Size...") shouldBe 1
    // replaying the log on a fresh image applies the resize once
    val replayed = Kernels.replayLog(const(5.0, 8, 8), resized.log)
    replayed.width shouldBe 4
    replayed.height shouldBe 4
  }

  test("constant image stats: mean=fill, stdDev=0 (SpijiTests.scala:297-310)") {
    val st = Kernels.stats(const(1000.0))
    st.mean shouldBe 1000.0
    st.stdDev should be < 1e-3
    st.pts shouldBe 5000L
  }

  test("noise raises stdDev; more noise raises it more; seeded = deterministic") {
    val img = const(1000.0)
    val n1 = Kernels.run(img, "Add Noise")
    val n2 = Kernels.run(img, "Add Specified Noise...", "standard=100")
    Kernels.stats(n1).stdDev should be > 1.0
    Kernels.stats(n2).stdDev should be > Kernels.stats(n1).stdDev
    // hash-exact repeatability
    Kernels.run(img, "Add Noise").data shouldBe n1.data
  }

  test("threshold+mask: loose threshold gives mean 255 (SpijiTests.scala:345-371)") {
    val masked = Kernels.run(const(1000.0), "setThreshold", "lower=500 upper=99999")
    Kernels.stats(masked).mean shouldBe 255.0
    masked.pixelType shouldBe PixelCodec.Byte8
    val empty = Kernels.run(const(1000.0), "setThreshold", "lower=5000 upper=99999")
    Kernels.stats(empty).mean shouldBe 0.0
  }

  test("median filter removes impulse noise") {
    val img = const(100.0, 21, 21)
    val px = img.toDoubles
    px(10 * 21 + 10) = 10000.0 // single hot pixel
    val noisy = img.withPixels(px)
    val filtered = Kernels.run(noisy, "Median...", "radius=1")
    Kernels.stats(filtered).max shouldBe 100.0
  }

  test("gaussian blur preserves the mean of a constant image") {
    val g = Kernels.run(const(50.0), "Gaussian Blur...", "sigma=2")
    Kernels.stats(g).mean shouldBe 50.0 +- 1e-9
  }

  test("invert is an involution on 8-bit") {
    val img = Kernels.run(const(100.0), "8-bit")
    val twice = Kernels.run(Kernels.run(img, "Invert"), "Invert")
    twice.toDoubles shouldBe img.toDoubles
  }

  test("subtract/average/scale arithmetic") {
    val a = const(300.0); val b = const(100.0)
    Kernels.stats(Kernels.subtract(a, b)).mean shouldBe 200.0
    Kernels.stats(Kernels.average(a, b)).mean shouldBe 200.0
    Kernels.stats(Kernels.scale(a, 0.5)).mean shouldBe 150.0
    Kernels.stats(Kernels.applyOffset(a, -1024)).mean shouldBe -724.0
  }

  test("stack append keeps slice order and shape (SpijiTests.scala:232-264)") {
    val slices = (0 until 11).map(i => Kernels.constantImage(10, 8, 1, i.toDouble))
    val stack = slices.reduce(Kernels.appendStack)
    stack.slices shouldBe 11
    val arr = Kernels.toArray3D(stack) // [h][w][slices]
    arr.length shouldBe 8
    arr(0).length shouldBe 10
    arr(0)(0).length shouldBe 11
    (0 until 11).foreach(k => arr(3)(5)(k) shouldBe k.toDouble)
  }

  test("distributed stack build keeps slice order under adversarial partitioning (Spiji.java:765-792)") {
    // same shape as img10_stack_build, but over 7 shuffled partitions:
    // collect_list carries no ordering across the aggregation exchange,
    // so the query must sort (idx, image) pairs explicitly
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, collect_list, struct}
    val slices = spark.range(11L)
      .map(i => ("stack", 10L - i, Kernels.constantImage(10, 8, 1, (10L - i).toDouble)))
      .toDF("sample", "idx", "image")
      .repartition(7)
    val stack = slices
      .groupBy(col("sample"))
      .agg(collect_list(struct(col("idx"), col("image"))).as("imgs"))
      .as[(String, Seq[(Long, SparkImage)])]
      .map { case (_, imgs) => imgs.sortBy(_._1).map(_._2).reduce(Kernels.appendStack) }
      .collect().head
    stack.slices shouldBe 11
    val arr = Kernels.toArray3D(stack)
    (0 until 11).foreach(k => arr(3)(5)(k) shouldBe k.toDouble)
  }

  test("fixed-range histogram puts constant fill in the right bin (SpijiTests.scala:176-186)") {
    val h = Kernels.histogram(const(5.0), 0.0, 10.0, 3)
    h.counts shouldBe Array(0L, 5000L, 0L)
    h.bin_centers(1) shouldBe 5.0 +- 1e-9
  }

  test("histogram distance: d(x,x)=0, 0<d(noisy,x)<1, d(far,x)≈1 (SpijiTests.scala:209-231)") {
    val clean = const(5.0)
    val noisy = Kernels.run(clean, "Add Specified Noise...", "standard=1")
    val far = const(50.0)
    def hist(i: SparkImage) = Kernels.histogram(i, 0.0, 60.0, 600)
    hist(clean).distance(hist(clean)) shouldBe 0.0 +- 1e-12
    val dNoisy = hist(clean).distance(hist(noisy))
    dNoisy should (be > 0.0 and be < 1.0)
    hist(clean).distance(hist(far)) shouldBe 1.0 +- 1e-9
  }

  test("histogram interp re-bins all mass") {
    val h = Kernels.histogram(const(5.0), 0.0, 10.0, 100)
    val re = h.interp(ImageHistogram.centers(0.0, 10.0, 5))
    re.counts.sum shouldBe 5000L
    re.normalizedCounts.sum shouldBe 1.0 +- 1e-9
  }

  test("particle analysis finds separated blobs with sane measurements (SpijiTests.scala:101-107)") {
    // two 3x3 squares far apart on a 20x20 field
    val px = new Array[Double](400)
    for (y <- 2 to 4; x <- 2 to 4) px(y * 20 + x) = 9.0
    for (y <- 12 to 14; x <- 12 to 14) px(y * 20 + x) = 5.0
    val img = SparkImage(ImageMeta(), "[]", 20, 20, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    val t = Kernels.analyzeParticles(img)
    t.rows.length shouldBe 2
    t.column("Area").get shouldBe Array(9.0, 9.0)
    t.column("Mean").get shouldBe Array(9.0, 5.0)
    t.column("X").get shouldBe Array(3.5, 13.5) // centroid of 2..4 = 3.5 (+0.5 px convention)
    t.column("Perim.").get shouldBe Array(12.0, 12.0)
    t.column("Width").get shouldBe Array(3.0, 3.0)
    t.sum("Area").get should be < 400.0
    t.mean("Missing") shouldBe None
  }

  test("8-connectivity merges diagonal pixels into one component") {
    val px = new Array[Double](25)
    px(0) = 1.0; px(6) = 1.0; px(12) = 1.0 // diagonal line in 5x5
    val img = SparkImage(ImageMeta(), "[]", 5, 5, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    Kernels.analyzeParticles(img).rows.length shouldBe 1
  }

  test("provenance log appends and merges like the reference (ImagePlusIOTests.scala:30-76)") {
    val img = const(10.0)
    val run1 = Kernels.run(img, "Invert")
    run1.log should include (""""optype":"RUN"""")
    run1.log should include (""""opval":"Invert"""")
    val merged = Kernels.subtract(run1, img)
    merged.log should include (""""optype":"MERGE"""")
    merged.log should include ("MERGE_STORE")
    // escaping holds for hostile args
    val weird = Kernels.run(img, "Add...", "value=3")
      .copy(log = ImageLog.append("[]", LogEntry("COMMENT", "SPARK", "a\"b\\c\nd", "")))
    weird.log should include ("""a\"b\\c\nd""")
  }

  test("runTable Measure returns stats row; unknown command throws") {
    val t = Kernels.runTable(const(7.0), "Measure", "")
    t.firstRow("Mean") shouldBe 7.0
    an[IllegalArgumentException] should be thrownBy Kernels.runTable(const(1.0), "nope", "")
  }

  test("convolution commands: smooth preserves mean, sharpen is identity on constants, edges vanish on constants") {
    val img = const(80.0, 30, 30)
    Kernels.stats(Kernels.run(img, "Smooth")).mean shouldBe 80.0 +- 1e-9
    Kernels.stats(Kernels.run(img, "Sharpen")).mean shouldBe 80.0 +- 1e-9
    Kernels.stats(Kernels.run(img, "Find Edges")).max shouldBe 0.0
    // a step edge produces a strong response along the boundary
    val px = Array.tabulate(30 * 30)(i => if (i % 30 < 15) 0.0 else 100.0)
    val step = img.withPixels(px)
    Kernels.stats(Kernels.run(step, "Find Edges")).max should be > 300.0
    // Despeckle == Median radius 1
    val noisy = Kernels.run(img, "Add Noise")
    Kernels.run(noisy, "Despeckle").data shouldBe
      Kernels.run(noisy, "Median...", "radius=1").data
  }

  test("calibration metadata survives every kernel (SpijiTests.scala:109-140)") {
    val meta = ImageMeta(pixelWidth = 0.5, pixelHeight = 0.5, pixelDepth = 2.0,
      unit = "mm", info = "ct-scan")
    val img = const(100.0).copy(meta = meta)
    val processed = Kernels.run(
      Kernels.run(Kernels.run(img, "Add Noise"), "Median...", "radius=1"), "8-bit")
    processed.meta shouldBe meta
    Kernels.subtract(processed, processed).meta shouldBe meta
  }

  test("math-menu point ops and rank filters") {
    val img = const(16.0, 10, 10) // float32: math ops unclamped
    Kernels.stats(Kernels.run(img, "Square")).mean shouldBe 256.0
    Kernels.stats(Kernels.run(img, "Square Root")).mean shouldBe 4.0
    Kernels.stats(Kernels.run(img, "Log")).mean shouldBe math.log(16.0) +- 1e-6 // float32 storage
    Kernels.stats(Kernels.run(const(-3.0, 4, 4), "Abs")).mean shouldBe 3.0
    Kernels.stats(Kernels.run(img, "Min...", "value=20")).mean shouldBe 20.0
    Kernels.stats(Kernels.run(img, "Max...", "value=10")).mean shouldBe 10.0
    // gamma on 8-bit: value 64 at gamma 2 -> (64/255)^2*255 = 16.06 -> 16
    val g = Kernels.run(Kernels.run(const(64.0), "8-bit"), "Gamma...", "value=2")
    Kernels.stats(g).mean shouldBe 16.0
    // rank filters: a hot pixel dilates under Maximum and erodes under Minimum
    val px = new Array[Double](49); px(24) = 9.0
    val spot = SparkImage(ImageMeta(), "[]", 7, 7, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    Kernels.stats(Kernels.run(spot, "Maximum...", "radius=1")).pts shouldBe 49L
    Kernels.run(spot, "Maximum...", "radius=1").toDoubles.count(_ == 9.0) shouldBe 9
    Kernels.stats(Kernels.run(spot, "Minimum...", "radius=1")).max shouldBe 0.0
  }

  test("geometry: crop/rotate/flip shapes and values") {
    val px = Array.tabulate(6 * 4)(_.toDouble) // 6 wide, 4 tall, values 0..23
    val img = SparkImage(ImageMeta(), "[]", 6, 4, 1, PixelCodec.Float32,
      PixelCodec.encode(px, PixelCodec.Float32))
    val cropped = Kernels.run(img, "Crop", "x=1 y=1 width=3 height=2")
    cropped.width shouldBe 3
    cropped.height shouldBe 2
    cropped.toDoubles shouldBe Array(7.0, 8.0, 9.0, 13.0, 14.0, 15.0)
    val right = Kernels.run(img, "Rotate 90 Degrees Right")
    right.width shouldBe 4
    right.height shouldBe 6
    right.toDoubles(0 * 4 + 3) shouldBe 0.0 // top-left goes to top-right
    Kernels.run(Kernels.run(img, "Flip Horizontally"), "Flip Horizontally")
      .toDoubles shouldBe px
    Kernels.run(Kernels.run(img, "Rotate 90 Degrees Right"), "Rotate 90 Degrees Left")
      .toDoubles shouldBe px
  }

  test("provenance log replays as an executable macro") {
    val a = const(1000.0)
    val b = const(2000.0)
    val processed = Kernels.run(
      Kernels.run(a, "Add Noise"), "Median...", "radius=2")
    val replayed = Kernels.replayLog(b, processed.log)
    val direct = Kernels.run(
      Kernels.run(b, "Add Noise"), "Median...", "radius=2")
    replayed.data shouldBe direct.data
    // non-op entries (CREATE/COMMENT) are skipped, malformed logs are no-ops
    Kernels.replayLog(b, "[]").data shouldBe b.data
    Kernels.replayLog(b, "not json").data shouldBe b.data
  }

  test("listcommands covers the registered surface") {
    Kernels.listCommands should contain allOf ("Add Noise", "Median...", "Convert to Mask",
      "8-bit", "setThreshold")
    Kernels.listPlugins.head should include ("=>")
  }

  test("img16 oracle LCG closed form matches java.util.Random for all fixture seeds") {
    // The img16/img05 blob fixtures draw (cx, cy, r, amp) per blob from
    // java.util.Random; the DuckDB oracle replays those draws via the
    // closed-form table s_k = (A_k·s0 + C_k) mod 2^48 and the
    // NO-REJECTION fast paths of nextInt(128)/(6)/(155). This asserts
    // both the table and the no-rejection assumption for every seed the
    // fixtures use (42..61) — if a regenerated fixture ever hits the
    // rejection path, this fails before the gate diverges.
    val mask = (1L << 48) - 1
    val steps = graft.queries.ImageQueries.lcgStepConstants
    steps.size shouldBe 32
    for (seed <- 42L to 61L) {
      val rng = new java.util.Random(seed)
      val s0 = (seed ^ 0x5DEECE66DL) & mask
      def draw(k: Int): Long = {
        val (_, a, c) = steps(k - 1)
        // A_k·s0 ≤ 2^48·2^35 overflows a Long; BigInt mirrors the
        // oracle's HUGEINT arithmetic exactly
        ((BigInt(a) * s0 + c) % (BigInt(1) << 48)).toLong >>> 17
      }
      for (b <- 0 until 8) {
        val k0 = 4 * b
        rng.nextInt(128) shouldBe (draw(k0 + 1) >> 24)
        rng.nextInt(128) shouldBe (draw(k0 + 2) >> 24)
        rng.nextInt(6) shouldBe (draw(k0 + 3) % 6)
        rng.nextInt(155) shouldBe (draw(k0 + 4) % 155)
      }
    }
  }

  // ---- gate-stability guards: the img02/img05/img08/img16 oracles
  // tolerate engine-order fp differences only because the fixtures'
  // true values sit safely away from every decision boundary (the 1e-4
  // floor grid, the 50.0 mask threshold, the 8-bit half-even rounding
  // midpoints). These tests assert that safety margin, so a fixture or
  // engine change that lands near a boundary fails HERE with a clear
  // message instead of as gate flakiness.

  test("img02/img08 fixture reductions sit clear of the 1e-4 floor-grid edges") {
    // distance of v·1e4 from the nearest grid edge, in grid cells;
    // cross-engine summation-order drift is a few ulps of v·1e4
    // (~1e-9 for these magnitudes) — require 4+ orders more margin
    def gridMargin(v: Double): Double = {
      val g = v * 10000.0
      math.abs(g - math.rint(g))
    }
    val minMargin = 1e-5
    for (i <- 0 until 20) {
      val img = Kernels.constantImage(128, 64, 1, (i % 5) * 1000.0 + 1000.0)
      val sm = Kernels.run(Kernels.run(
        Kernels.run(img, "Add Noise"), "Median...", "radius=2"), "Smooth")
      val st = Kernels.stats(sm)
      withClue(s"img02 fixture $i mean=${st.mean}: ") {
        gridMargin(st.mean) should be > minMargin
      }
      withClue(s"img02 fixture $i stdDev=${st.stdDev}: ") {
        gridMargin(st.stdDev) should be > minMargin
      }
    }
    for (i <- 0 until 6; r <- 1 to 3) {
      val img = Kernels.constantImage(128, 64, 1, (i % 5) * 1000.0 + 1000.0)
      val f = Kernels.run(Kernels.run(img, "Add Noise"), "Median...", s"radius=$r")
      val st = Kernels.stats(f)
      withClue(s"img08 fixture $i radius=$r stdDev=${st.stdDev}: ") {
        gridMargin(st.stdDev) should be > minMargin
      }
    }
  }

  test("blob fixtures are robust to libm exp drift (img05 mask, img16 8-bit rounding)") {
    // model a cross-engine exp() difference as a per-term relative
    // perturbation of ±1e-12 — four orders beyond the ≤1-ulp (~2e-16)
    // contract — and assert every downstream DECISION (the img05 ≥50
    // mask through Float32 encode; the img16 half-even 8-bit value) is
    // identical under both signs. Replays blobImage's exact draw order.
    val eps = 1e-12
    def pixels(seed: Long, scale: Double): Array[Float] = {
      val rng = new java.util.Random(seed)
      val px = new Array[Double](128 * 128)
      (0 until 8).foreach { _ =>
        val cx = rng.nextInt(128); val cy = rng.nextInt(128)
        val r = 2 + rng.nextInt(6); val amp = 100 + rng.nextInt(155)
        var y = math.max(0, cy - 3 * r)
        while (y < math.min(128, cy + 3 * r)) {
          var x = math.max(0, cx - 3 * r)
          while (x < math.min(128, cx + 3 * r)) {
            val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
            px(y * 128 + x) += amp * (math.exp(-d2.toDouble / (2.0 * r * r)) * scale)
            x += 1
          }
          y += 1
        }
      }
      px.map(_.toFloat)
    }
    var maskFlips = 0; var byteFlips = 0
    for (i <- 0 until 20) {
      val lo = pixels(42L + i, 1 - eps); val hi = pixels(42L + i, 1 + eps)
      var p = 0
      while (p < lo.length) {
        if ((lo(p).toDouble >= 50.0) != (hi(p).toDouble >= 50.0)) maskFlips += 1
        def v8(f: Float) = math.min(255.0, math.max(0.0, math.rint(f.toDouble)))
        if (v8(lo(p)) != v8(hi(p))) byteFlips += 1
        p += 1
      }
    }
    withClue("img05 mask decisions flipped under exp drift: ") { maskFlips shouldBe 0 }
    withClue("img16 8-bit roundings flipped under exp drift: ") { byteFlips shouldBe 0 }
  }
}
