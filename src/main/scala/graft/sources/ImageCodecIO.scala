package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.core.{ImageLog, ImageMeta, LogEntry, PixelCodec, SparkImage}

/** File-format codec for on-disk images via `javax.imageio` (PNG, GIF,
  * BMP — the JDK's built-ins; replaces the reference's temp-file
  * round-trip through ImageJ, Spiji.java:1585-1614 / 1623-1634, with
  * in-memory streams). Pure functions — safe to call concurrently from
  * any task thread. */
object ImageCodecIO {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and synchronizes on) a temp file, which serializes all
  // codec work across task threads. In-memory streams only.
  ImageIO.setUseCache(false)

  /** Decode encoded file bytes into a SparkImage. Color inputs become
    * 24bit-rgb, grayscale becomes 8bit/16bit by sample depth. */
  def decode(path: String, bytes: Array[Byte]): SparkImage = {
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    require(bi != null, s"undecodable image: $path")
    val w = bi.getWidth; val h = bi.getHeight
    val log = ImageLog.append(ImageLog.empty, LogEntry("LOAD", "SPARK", path, ""))
    bi.getType match {
      case BufferedImage.TYPE_BYTE_GRAY =>
        val px = new Array[Double](w * h)
        val raster = bi.getRaster
        var i = 0
        while (i < w * h) { px(i) = raster.getSample(i % w, i / w, 0); i += 1 }
        SparkImage(ImageMeta(info = path), log, w, h, 1, PixelCodec.Byte8,
          PixelCodec.encode(px, PixelCodec.Byte8))
      case BufferedImage.TYPE_USHORT_GRAY =>
        val px = new Array[Double](w * h)
        val raster = bi.getRaster
        var i = 0
        while (i < w * h) { px(i) = raster.getSample(i % w, i / w, 0); i += 1 }
        SparkImage(ImageMeta(info = path), log, w, h, 1, PixelCodec.Short16,
          PixelCodec.encode(px, PixelCodec.Short16))
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
        SparkImage(ImageMeta(info = path), log, w, h, 1, PixelCodec.Rgb, data)
    }
  }

  /** Encode slice 0 to PNG bytes (format: "png" | "bmp" | "gif").
    * Short16 writes 16-bit gray (PNG supports it), so
    * decode(encode(img)) round-trips the full 16-bit range; float
    * types clamp to 8-bit gray — a documented lossy save, since the
    * interchange file formats here have no float sample type. */
  def encode(img: SparkImage, format: String = "png"): Array[Byte] = {
    val w = img.width; val h = img.height
    val px = img.toDoubles
    val bi = img.pixelType match {
      case PixelCodec.Rgb =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val d = img.data
        var i = 0
        while (i < w * h) {
          val r = d(i * 3) & 0xff; val g = d(i * 3 + 1) & 0xff; val b = d(i * 3 + 2) & 0xff
          out.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
          i += 1
        }
        out
      case PixelCodec.Short16 =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
        val raster = out.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, PixelCodec.clamp(px(i), PixelCodec.Short16).toInt)
          i += 1
        }
        out
      case _ =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = out.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, PixelCodec.clamp(px(i), PixelCodec.Byte8).toInt)
          i += 1
        }
        out
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, format, bos)
    bos.toByteArray
  }
}
