package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{PixelCodec, SparkImage}
import graft.sources.ImageCodecIO

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns beside typed metadata, with decode / feature /
  * resize / frame-sample stages as partition-mapped transforms.
  *
  * The Spark-side plumbing (schema, batching, partitioning) is real;
  * the codec boundary is explicit: images decode through the JDK
  * (`ImageCodecIO`), while audio/video decoding — whose libraries are
  * not available here — is stubbed behind [[decodeStub]] with a
  * deterministic fake, clearly marked. Swapping in a real codec is a
  * one-function change; nothing in the plan shape moves.
  */
object Multimodal {

  case class MediaMeta(media_type: String, format: String, n_bytes: Long)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, mean_intensity: Double)

  /** Wrap raw payloads with typed metadata (the multimodal column
    * convention: binary + struct side-by-side, never parsed strings). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(lit(mediaType).as("media_type"), lit(format).as("format"),
             length(col(payloadCol)).cast("long").as("n_bytes")).as("meta"),
      col(payloadCol).as("payload"))

  /** STUB: deterministic fake decoder for media types whose codecs are
    * absent in this environment (audio/video). Produces a fixed-size
    * gray image whose pixels derive from a content hash — stable
    * across partitionings, so downstream feature tests are exact.
    * Replace with a real codec (e.g. JavaCV) to productionize. */
  def decodeStub(payload: Array[Byte], w: Int = 16, h: Int = 16): SparkImage = {
    var hsh = 0xcbf29ce484222325L
    payload.foreach { b => hsh ^= b; hsh *= 0x100000001b3L }
    val px = Array.tabulate(w * h)(i => ((Dedup.mix64(hsh + i) >>> 56) & 0xff).toDouble)
    SparkImage(graft.core.ImageMeta(), graft.core.ImageLog.create("decodeStub", ""),
      w, h, 1, PixelCodec.Byte8, PixelCodec.encode(px, PixelCodec.Byte8))
  }

  /** Partition-mapped decode + feature extraction (the Scala analogue
    * of a batched pandas-UDF stage: one JVM-side loop per partition,
    * no per-row UDF setup). Images go through the real JDK codec;
    * everything else through [[decodeStub]]. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec work is CPU-bound per row: make sure a small file count
    // doesn't pin the whole stage to 1-2 input splits
    PartitionUtil.spread(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val img =
          if (r.meta.media_type == "image")
            scala.util.Try(ImageCodecIO.decode(r.media_id.toString, r.payload))
              .getOrElse(decodeStub(r.payload))
          else decodeStub(r.payload)
        val px = img.toDoubles
        MediaFeatures(r.media_id, r.meta.media_type, r.meta.n_bytes,
          img.width, img.height,
          if (px.isEmpty) 0.0 else px.sum / px.length)
      }
    }
  }

  /** Partition-mapped resize stage: decode → bilinear resize to a fixed
    * target → re-encoded payload beside updated metadata. The batched
    * per-partition loop shape of a training-data image-normalization
    * stage. */
  def resizeStage(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    PartitionUtil.spread(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val img =
          if (r.meta.media_type == "image")
            scala.util.Try(ImageCodecIO.decode(r.media_id.toString, r.payload))
              .getOrElse(decodeStub(r.payload))
          else decodeStub(r.payload)
        val resized = graft.core.Kernels.resize(img, targetW, targetH)
        val out = ImageCodecIO.encode(resized, "png")
        MediaRow(r.media_id,
          MediaMeta(r.meta.media_type, "png", out.length.toLong), out)
      }
    }.toDF()
  }

  /** Deterministic frame sampling for (stub-decoded) video payloads:
    * every keyframe-ish offset yields one frame row. Plan shape:
    * explode, not collect. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val frameUdf = udf { (id: Long, payload: Array[Byte]) =>
      (0 until nFrames).map { f =>
        val img = decodeStub(payload ++ BigInt(f).toByteArray)
        val px = img.toDoubles
        (f, px.sum / px.length)
      }
    }
    media.select(col("media_id"), explode(frameUdf(col("media_id"), col("payload"))).as("frame"))
      .select(col("media_id"), col("frame._1").as("frame_idx"), col("frame._2").as("frame_mean"))
  }
}
