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
    if (isTiff(bytes)) {
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
