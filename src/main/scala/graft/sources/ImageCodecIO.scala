package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

import graft.core.{ImageLog, ImageMeta, LogEntry, PixelCodec, SparkImage}

/** File-format codec for on-disk images via `javax.imageio` (PNG, GIF,
  * BMP, TIFF — the JDK's built-ins; replaces the reference's temp-file
  * round-trip through ImageJ, Spiji.java:1585-1614 / 1623-1634, with
  * in-memory streams). TIFF is the multi-slice interchange format: a
  * SparkImage stack writes one TIFF page per slice and a multi-page
  * file decodes back to a stack in page order (the reference's
  * flagship IO case reads a 68-slice DICOM stack,
  * IjRDDTests.scala:30-99 — same shape, JDK-supported container).
  * Pure functions — safe to call concurrently from any task thread. */
object ImageCodecIO {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and synchronizes on) a temp file, which serializes all
  // codec work across task threads. In-memory streams only.
  ImageIO.setUseCache(false)

  /** TIFF magic: II*\0 (little-endian) or MM\0* (big-endian). Sniffing
    * bytes beats trusting extensions — `imagedir` patterns are
    * user-supplied. */
  private def isTiff(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) == 0x49 && bytes(1) == 0x49 && bytes(2) == 0x2a && bytes(3) == 0x00) ||
       (bytes(0) == 0x4d && bytes(1) == 0x4d && bytes(2) == 0x00 && bytes(3) == 0x2a))

  /** DICOM Part 10 magic: a 128-byte preamble then "DICM". */
  private def isDicom(bytes: Array[Byte]): Boolean =
    bytes.length >= 132 && bytes(128) == 'D' && bytes(129) == 'I' &&
      bytes(130) == 'C' && bytes(131) == 'M'

  /** The four DICOM transfer syntaxes this codec speaks: the three
    * uncompressed ones — implicit-VR little-endian (the default
    * syntax every conformant reader must accept), explicit-VR
    * little-endian, explicit-VR big-endian (retired but present in
    * old PACS archives) — plus RLE Lossless, the simplest compressed
    * syntax (PackBits segments in an encapsulated PixelData), which
    * round-trips exactly. */
  private[graft] val TsImplicitLE = "1.2.840.10008.1.2"
  private[graft] val TsExplicitLE = "1.2.840.10008.1.2.1"
  private[graft] val TsExplicitBE = "1.2.840.10008.1.2.2"
  private[graft] val TsRle = "1.2.840.10008.1.2.5"

  /** PackBits decode of one RLE segment into exactly `expected`
    * bytes. Control byte n (signed): 0..127 → copy the next n+1
    * bytes; −1..−127 → repeat the next byte 1−n times; −128 → no-op.
    * Trailing pad bytes past `expected` are ignored. */
  private def unpackBits(src: Array[Byte], from: Int, to: Int,
                         expected: Int, path: String): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = from; var o = 0
    while (o < expected && i < to) {
      val n = src(i); i += 1
      if (n >= 0) {
        val c = n + 1
        require(i + c <= to && o + c <= expected,
          s"RLE literal overruns segment in $path")
        System.arraycopy(src, i, out, o, c); i += c; o += c
      } else if (n != -128) {
        val c = 1 - n
        require(i < to && o + c <= expected,
          s"RLE replicate overruns segment in $path")
        java.util.Arrays.fill(out, o, o + c, src(i)); i += 1; o += c
      }
    }
    require(o == expected, s"short RLE segment ($o of $expected bytes) in $path")
    out
  }

  /** PackBits encode: runs of ≥3 identical bytes replicate, the rest
    * copy as literals (≤128 per control byte). */
  private def packBits(src: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def runLen(p: Int): Int = {
      var r = 1
      while (p + r < src.length && src(p + r) == src(p) && r < 128) r += 1
      r
    }
    var i = 0
    while (i < src.length) {
      val r = runLen(i)
      if (r >= 3) { out.write((1 - r) & 0xff); out.write(src(i)); i += r }
      else {
        val start = i
        i += r
        while (i < src.length && (i - start) < 128 && runLen(i) < 3) i += runLen(i)
        var litLen = i - start
        if (litLen > 128) { i -= litLen - 128; litLen = 128 }
        out.write(litLen - 1); out.write(src, start, litLen)
      }
    }
    out.toByteArray
  }

  /** Read ONE encapsulated fragment (empty Basic Offset Table item,
    * one fragment item, sequence delimiter) from an undefined-length
    * PixelData element. Single-frame only — a second fragment fails
    * the delimiter check loudly. */
  private def readEncapsulatedFragment(bb: java.nio.ByteBuffer,
                                       path: String): Array[Byte] = {
    def item(): (Int, Int, Int) =
      ((bb.getShort & 0xffff), (bb.getShort & 0xffff), bb.getInt)
    val (g1, e1, l1) = item()
    require(g1 == 0xfffe && e1 == 0xe000 && l1 >= 0 && l1 <= bb.remaining,
      s"missing Basic Offset Table item in $path")
    bb.position(bb.position() + l1)
    val (g2, e2, l2) = item()
    require(g2 == 0xfffe && e2 == 0xe000 && l2 >= 64 && l2 <= bb.remaining,
      s"missing RLE fragment item in $path")
    val frag = new Array[Byte](l2); bb.get(frag)
    val (g3, e3, l3) = item()
    require(g3 == 0xfffe && e3 == 0xe0dd && l3 == 0,
      s"expected sequence delimiter after the single RLE fragment in $path")
    frag
  }

  /** Decode one RLE Lossless fragment (PS3.5 annex G): 64-byte header
    * (number of segments + 15 offsets from fragment start), then one
    * PackBits segment per byte plane, most significant first. Returns
    * little-endian interleaved pixel bytes (the layout the shared
    * pixel loop reads). */
  private def rleDecodeFragment(frag: Array[Byte], nPix: Int, bits: Int,
                                path: String): Array[Byte] = {
    val hb = java.nio.ByteBuffer.wrap(frag).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nSeg = hb.getInt
    require(nSeg == bits / 8,
      s"RLE segment count $nSeg does not match BitsAllocated $bits in $path")
    val offsets = Array.fill(15)(hb.getInt)
    val segs = (0 until nSeg).map { s =>
      val start = offsets(s)
      val end = if (s + 1 < nSeg && offsets(s + 1) > 0) offsets(s + 1) else frag.length
      require(start >= 64 && start <= end && end <= frag.length,
        s"corrupt RLE segment offsets in $path")
      unpackBits(frag, start, end, nPix, path)
    }
    if (bits == 8) segs(0)
    else {
      val px = new Array[Byte](nPix * 2)
      var i = 0
      while (i < nPix) { px(2 * i) = segs(1)(i); px(2 * i + 1) = segs(0)(i); i += 1 }
      px
    }
  }

  /** Encode 16-bit pixels as an RLE Lossless fragment: header + the
    * MSB then LSB PackBits segments, each even-padded. */
  private def rleEncodeFragment(vals: Array[Int]): Array[Byte] = {
    val msb = Array.tabulate(vals.length)(i => ((vals(i) >> 8) & 0xff).toByte)
    val lsb = Array.tabulate(vals.length)(i => (vals(i) & 0xff).toByte)
    def pad(a: Array[Byte]): Array[Byte] = if (a.length % 2 == 0) a else a :+ 0.toByte
    val s0 = pad(packBits(msb)); val s1 = pad(packBits(lsb))
    val bos = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    u32(2); u32(64); u32(64 + s0.length)
    (0 until 13).foreach(_ => u32(0))
    bos.write(s0); bos.write(s1)
    bos.toByteArray
  }

  /** Minimal DICOM decode — single-frame unsigned MONOCHROME2, 8 or
    * 16 bits, in any of the four supported transfer syntaxes
    * ([[TsImplicitLE]]/[[TsExplicitLE]]/[[TsExplicitBE]]/[[TsRle]]) —
    * the shape of the reference's flagship IO case (a CT series of
    * single-frame files stacked into a volume, IjRDDTests.scala:30-99,
    * where spark-scifio does the decode). The file-meta group
    * (0002,xxxx) is always explicit-VR little-endian per Part 10; its
    * TransferSyntaxUID then selects the element encoding, byte order,
    * and (for RLE Lossless) the encapsulated-fragment pixel path.
    * Walks the element stream for Rows/Columns/BitsAllocated/
    * InstanceNumber and stops at PixelData; any OTHER compressed
    * syntax, signed data, or multi-frame file is rejected loudly
    * rather than mis-decoded. Returns the image plus the
    * InstanceNumber (slice position for series stacking; 1 when
    * absent). */
  private[graft] def decodeDicomWithInstance(path: String, bytes: Array[Byte]): (SparkImage, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(132)
    val longVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")
    var rows = 0; var cols = 0; var bits = 16; var pixelRep = 0; var instance = 1
    var ts = TsExplicitLE
    var px: Array[Byte] = null
    // ---- file-meta group: ALWAYS explicit-VR little-endian ----
    var inMeta = true
    while (inMeta && bb.remaining >= 8) {
      bb.mark()
      val group = bb.getShort & 0xffff
      if (group != 0x0002) { bb.reset(); inMeta = false }
      else {
        val elem = bb.getShort & 0xffff
        val vr = new String(Array(bb.get(), bb.get()).map(b => b.toChar))
        val len = if (longVRs(vr)) { bb.getShort(); bb.getInt() } else bb.getShort & 0xffff
        require(len >= 0 && len <= bb.remaining, s"corrupt DICOM meta length in $path")
        val value = new Array[Byte](len); bb.get(value)
        if (elem == 0x0010) ts = new String(value, "US-ASCII").trim
      }
    }
    val (explicitVr, bigEndian, encapsulated) = ts match {
      case TsImplicitLE => (false, false, false)
      case TsExplicitLE => (true, false, false)
      case TsExplicitBE => (true, true, false)
      case TsRle => (true, false, true)
      case other => throw new IllegalArgumentException(
        s"unsupported DICOM transfer syntax $other in $path " +
          "(implicit-VR LE / explicit-VR LE / explicit-VR BE / RLE Lossless only)")
    }
    if (bigEndian) bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    // ---- dataset: element encoding + byte order per transfer syntax ----
    var rleFragment: Array[Byte] = null
    var done = false
    while (!done && bb.remaining >= 8) {
      val group = bb.getShort & 0xffff; val elem = bb.getShort & 0xffff
      val len =
        if (!explicitVr) bb.getInt
        else {
          val vr = new String(Array(bb.get(), bb.get()).map(b => b.toChar))
          if (longVRs(vr)) { bb.getShort(); bb.getInt() } else bb.getShort & 0xffff
        }
      if (group == 0x7fe0 && elem == 0x0010 && len == -1) {
        // encapsulated PixelData: undefined length, fragment items
        require(encapsulated,
          s"undefined-length PixelData outside an encapsulated syntax in $path")
        rleFragment = readEncapsulatedFragment(bb, path)
        done = true
      } else {
        require(len >= 0 && len <= bb.remaining,
          s"corrupt or undefined DICOM element length in $path")
        val value = new Array[Byte](len); bb.get(value)
        def u16: Int =
          if (bigEndian) ((value(0) & 0xff) << 8) | (value(1) & 0xff)
          else (value(0) & 0xff) | ((value(1) & 0xff) << 8)
        def str: String = new String(value, "US-ASCII").trim
        (group, elem) match {
          case (0x0020, 0x0013) => instance = str.toInt
          case (0x0028, 0x0010) => rows = u16
          case (0x0028, 0x0011) => cols = u16
          case (0x0028, 0x0100) => bits = u16
          case (0x0028, 0x0103) => pixelRep = u16
          case (0x7fe0, 0x0010) => px = value; done = true
          case _ => ()
        }
      }
    }
    require(pixelRep == 0, s"signed DICOM pixel data unsupported: $path")
    require(rows > 0 && cols > 0, s"missing DICOM dims: $path")
    require(bits == 8 || bits == 16, s"unsupported DICOM BitsAllocated $bits: $path")
    val n = rows * cols
    if (rleFragment != null) px = rleDecodeFragment(rleFragment, n, bits, path)
    require(px != null, s"missing DICOM pixel data: $path")
    require(px.length >= n * (bits / 8), s"short DICOM pixel payload: $path")
    val doubles = new Array[Double](n)
    var i = 0
    if (bits == 16 && bigEndian)
      while (i < n) { doubles(i) = ((px(2 * i) & 0xff) << 8) | (px(2 * i + 1) & 0xff); i += 1 }
    else if (bits == 16)
      while (i < n) { doubles(i) = (px(2 * i) & 0xff) | ((px(2 * i + 1) & 0xff) << 8); i += 1 }
    else
      while (i < n) { doubles(i) = px(i) & 0xff; i += 1 }
    val tpe = if (bits == 16) PixelCodec.Short16 else PixelCodec.Byte8
    val log = ImageLog.append(ImageLog.empty, LogEntry("LOAD", "SPARK", path, ""))
    (SparkImage(ImageMeta(info = path), log, cols, rows, 1, tpe,
      PixelCodec.encode(doubles, tpe)), instance)
  }

  /** Encode ONE slice as a minimal conformant DICOM file in any of
    * the three uncompressed transfer syntaxes (the profiles
    * [[decodeDicomWithInstance]] reads): preamble + DICM, file-meta
    * group (always explicit-VR little-endian per Part 10, carrying
    * the transfer-syntax UID), then InstanceNumber / MONOCHROME2
    * geometry / 16-bit pixel module / PixelData in the chosen
    * dataset encoding and byte order. Values clamp through the
    * 16-bit unsigned range like every other fixed-width sink here. */
  private[graft] def encodeDicom(img: SparkImage, instance: Int = 1,
                                 slice: Int = 0,
                                 transferSyntax: String = TsExplicitLE): Array[Byte] = {
    require(transferSyntax == TsImplicitLE || transferSyntax == TsExplicitLE ||
        transferSyntax == TsExplicitBE || transferSyntax == TsRle,
      s"unsupported DICOM transfer syntax $transferSyntax")
    val explicitVr = transferSyntax != TsImplicitLE
    val bigEndian = transferSyntax == TsExplicitBE
    val encapsulated = transferSyntax == TsRle
    val w = img.width; val h = img.height
    val px = img.toDoubles
    val off = slice * w * h
    val bos = new ByteArrayOutputStream()
    // file-meta writers: always little-endian explicit VR (Part 10)
    def u16le(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def metaElem(group: Int, el: Int, vr: String, value: Array[Byte]): Unit = {
      require(value.length % 2 == 0, "DICOM values must have even length")
      u16le(group); u16le(el); bos.write(vr(0)); bos.write(vr(1)); u16le(value.length)
      bos.write(value)
    }
    // dataset writers: byte order + element encoding per transfer syntax
    def u16x(v: Int): Unit =
      if (bigEndian) { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
      else u16le(v)
    def u32x(v: Int): Unit =
      if (bigEndian) { u16x((v >>> 16) & 0xffff); u16x(v & 0xffff) }
      else { u16x(v & 0xffff); u16x((v >>> 16) & 0xffff) }
    def elem(group: Int, el: Int, vr: String, value: Array[Byte]): Unit = {
      require(value.length % 2 == 0, "DICOM values must have even length")
      u16x(group); u16x(el)
      if (explicitVr) { bos.write(vr(0)); bos.write(vr(1)); u16x(value.length) }
      else u32x(value.length)
      bos.write(value)
    }
    def us(group: Int, el: Int, v: Int): Unit =
      elem(group, el, "US",
        if (bigEndian) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    def str(group: Int, el: Int, vr: String, s0: String, pad: Char): Unit =
      elem(group, el, vr,
        (if (s0.length % 2 == 0) s0 else s0 + pad).getBytes("US-ASCII"))
    bos.write(new Array[Byte](128))
    "DICM".foreach(c => bos.write(c))
    // (0002,0000) group length = the one element that follows: 8-byte
    // header + NUL-padded UID
    val tsPadded = if (transferSyntax.length % 2 == 0) transferSyntax
                   else transferSyntax + "\u0000" // UIDs pad with NUL
    val metaLen = 8 + tsPadded.length
    metaElem(0x0002, 0x0000, "UL", Array[Byte](
      (metaLen & 0xff).toByte, ((metaLen >> 8) & 0xff).toByte, 0, 0))
    metaElem(0x0002, 0x0010, "UI", tsPadded.getBytes("US-ASCII"))
    str(0x0020, 0x0013, "IS", instance.toString, ' ')
    us(0x0028, 0x0002, 1)
    str(0x0028, 0x0004, "CS", "MONOCHROME2", ' ')
    us(0x0028, 0x0010, h)
    us(0x0028, 0x0011, w)
    us(0x0028, 0x0100, 16); us(0x0028, 0x0101, 16); us(0x0028, 0x0102, 15)
    us(0x0028, 0x0103, 0)
    if (encapsulated) {
      // RLE Lossless: OB PixelData with UNDEFINED length, empty Basic
      // Offset Table item, ONE fragment item, sequence delimiter
      val vals = Array.tabulate(w * h)(i =>
        PixelCodec.clamp(px(off + i), PixelCodec.Short16).toInt)
      val frag = rleEncodeFragment(vals)
      u16x(0x7fe0); u16x(0x0010); bos.write('O'); bos.write('B'); u16x(0); u32x(-1)
      u16x(0xfffe); u16x(0xe000); u32x(0)
      u16x(0xfffe); u16x(0xe000); u32x(frag.length)
      bos.write(frag)
      u16x(0xfffe); u16x(0xe0dd); u32x(0)
    } else {
      u16x(0x7fe0); u16x(0x0010)
      if (explicitVr) { bos.write('O'); bos.write('W'); u16x(0); u32x(w * h * 2) }
      else u32x(w * h * 2)
      var i = 0
      while (i < w * h) { u16x(PixelCodec.clamp(px(off + i), PixelCodec.Short16).toInt); i += 1 }
    }
    bos.toByteArray
  }

  /** One decoded page → (pixelType, slice bytes). Color inputs become
    * 24bit-rgb, grayscale becomes 8bit/16bit by sample depth. */
  private def pageToSlice(bi: BufferedImage): (String, Array[Byte]) = {
    val w = bi.getWidth; val h = bi.getHeight
    bi.getType match {
      case BufferedImage.TYPE_BYTE_GRAY =>
        val px = new Array[Double](w * h)
        val raster = bi.getRaster
        var i = 0
        while (i < w * h) { px(i) = raster.getSample(i % w, i / w, 0); i += 1 }
        (PixelCodec.Byte8, PixelCodec.encode(px, PixelCodec.Byte8))
      case BufferedImage.TYPE_USHORT_GRAY =>
        val px = new Array[Double](w * h)
        val raster = bi.getRaster
        var i = 0
        while (i < w * h) { px(i) = raster.getSample(i % w, i / w, 0); i += 1 }
        (PixelCodec.Short16, PixelCodec.encode(px, PixelCodec.Short16))
      case _ => // anything color-ish: pack 3 bytes/px
        val data = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val rgb = bi.getRGB(i % w, i / w)
          data(i * 3) = ((rgb >> 16) & 0xff).toByte
          data(i * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          data(i * 3 + 2) = (rgb & 0xff).toByte
          i += 1
        }
        (PixelCodec.Rgb, data)
    }
  }

  /** Decode encoded file bytes into a SparkImage. Multi-page TIFF
    * decodes to a stack (pages become slices, in page order); every
    * other format is single-slice. */
  def decode(path: String, bytes: Array[Byte]): SparkImage = {
    val log = ImageLog.append(ImageLog.empty, LogEntry("LOAD", "SPARK", path, ""))
    if (isDicom(bytes)) decodeDicomWithInstance(path, bytes)._1
    else if (isTiff(bytes)) {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no TIFF reader for: $path")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          require(n > 0, s"empty TIFF: $path")
          val first = reader.read(0)
          val w = first.getWidth; val h = first.getHeight
          val pages = (0 until n).map(i => pageToSlice(if (i == 0) first else reader.read(i)))
          val tpe = pages.head._1
          require(pages.forall(_._1 == tpe),
            s"mixed pixel types across TIFF pages: $path")
          require(pages.forall(_._2.length == pages.head._2.length),
            s"mixed page dimensions in TIFF: $path")
          SparkImage(ImageMeta(info = path), log, w, h, n, tpe,
            pages.map(_._2).reduce(_ ++ _))
        } finally reader.dispose()
      } finally iis.close()
    } else {
      val bi = ImageIO.read(new ByteArrayInputStream(bytes))
      require(bi != null, s"undecodable image: $path")
      val (tpe, data) = pageToSlice(bi)
      SparkImage(ImageMeta(info = path), log, bi.getWidth, bi.getHeight, 1, tpe, data)
    }
  }

  /** One slice → BufferedImage. Short16 keeps 16-bit gray (PNG and
    * TIFF both hold it losslessly); RGB keeps 24-bit color; everything
    * else clamps to 8-bit gray — a documented lossy save, since these
    * interchange formats have no float sample type. */
  private def sliceToPage(img: SparkImage, px: Array[Double], slice: Int): BufferedImage = {
    val w = img.width; val h = img.height
    val off = slice * w * h
    img.pixelType match {
      case PixelCodec.Rgb =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val d = img.data
        val boff = slice * w * h * 3
        var i = 0
        while (i < w * h) {
          val r = d(boff + i * 3) & 0xff; val g = d(boff + i * 3 + 1) & 0xff
          val b = d(boff + i * 3 + 2) & 0xff
          out.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
          i += 1
        }
        out
      case PixelCodec.Short16 =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
        val raster = out.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0,
            PixelCodec.clamp(px(off + i), PixelCodec.Short16).toInt)
          i += 1
        }
        out
      case _ =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = out.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0,
            PixelCodec.clamp(px(off + i), PixelCodec.Byte8).toInt)
          i += 1
        }
        out
    }
  }

  /** Encode to file bytes. "tiff"/"tif" writes ALL slices as a
    * multi-page TIFF (one page per slice, slice order = page order);
    * "png" | "bmp" | "gif" write slice 0 only (single-image
    * containers). */
  def encode(img: SparkImage, format: String = "png"): Array[Byte] = {
    val fmt = format.toLowerCase
    if (fmt == "tiff" || fmt == "tif") return encodeTiff(img)
    if (fmt == "dcm" || fmt == "dicom") return encodeDicom(img)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(sliceToPage(img, img.toDoubles, 0), format, bos)
    bos.toByteArray
  }

  private def encodeTiff(img: SparkImage): Array[Byte] = {
    val writers = ImageIO.getImageWritersByFormatName("tiff")
    require(writers.hasNext, "no TIFF writer registered (JDK 9+ ships one)")
    val writer = writers.next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val px = img.toDoubles
      var s = 0
      while (s < img.slices) {
        writer.writeToSequence(new IIOImage(sliceToPage(img, px, s), null, null), null)
        s += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }
}
