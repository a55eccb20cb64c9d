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

  // ---- DuckDB oracles --------------------------------------------------
  // The decode stub IS deterministic math (fnv64 over the payload bytes,
  // mix64 top byte per pixel), the corpus is ASCII (char fold == byte
  // fold), and the bilinear resize + Byte8 rint-clamp are plain IEEE
  // ops — so even the multimodal stages are hash-checkable end to end.

  /** round-half-even (Java Math.rint) on a double expression — DuckDB's
    * round() is half-away; ties here land exactly on .5 grids. */
  private def sqlRint(v: String): String =
    s"(CASE WHEN ($v) - floor($v) > 0.5 THEN floor($v) + 1 " +
      s"WHEN ($v) - floor($v) < 0.5 THEN floor($v) " +
      s"WHEN CAST(floor($v) AS BIGINT) % 2 = 0 THEN floor($v) " +
      s"ELSE floor($v) + 1 END)"

  /** Shared CTE prefix: per-(doc, i) stub pixel values for a `w`×`h`
    * stub decode of the document text — h0 = fnv64(text) + i, then the
    * four mix64 stages, then the top byte. */
  private def stubPixelsCte(docFilter: String, nPx: Int): String = {
    import HashSql._
    val h0 = HashSql.fnv64("text")
    s"""base AS (SELECT doc_id AS media_id, $h0 AS h FROM documents WHERE $docFilter),
      rows0 AS (SELECT media_id, i,
          CAST((CAST(h AS HUGEINT) + i) % 18446744073709551616 AS UBIGINT) AS h
        FROM base CROSS JOIN (SELECT unnest(range(0, $nPx)) AS i) ii),
      r1 AS (SELECT media_id, i, ${mixStage1("h")} AS h FROM rows0),
      r2 AS (SELECT media_id, i, ${mixStage2("h")} AS h FROM r1),
      r3 AS (SELECT media_id, i, ${mixStage3("h")} AS h FROM r2),
      px AS (SELECT media_id, i,
          CAST(${mixStage4("h")} >> 56 AS DOUBLE) AS p FROM r3)"""
  }

  /** DuckDB oracle for the q55 pipeline (stub decode 16×16 → bilinear
    * resize to `tw`×`th` → Byte8 rint-clamp → PNG round trip → mean):
    * the bilinear source indices and weights are precomputed here with
    * the SAME Scala expressions the kernel uses and inlined as
    * shortest-repr double literals (round-trip exact); per-pixel values
    * are integers after the clamp, so the final mean is order-free. */
  private[graft] def featureOracleSql(w: Int = 16, h: Int = 16,
                                      tw: Int = 24, th: Int = 24): String = {
    val grid = (0 until th).flatMap { y =>
      val fy = math.min(h - 1.0, math.max(0.0, (y + 0.5) * (h.toDouble / th) - 0.5))
      val y0 = fy.toInt; val y1 = math.min(h - 1, y0 + 1); val wy = fy - y0
      (0 until tw).map { x =>
        val fx = math.min(w - 1.0, math.max(0.0, (x + 0.5) * (w.toDouble / tw) - 0.5))
        val x0 = fx.toInt; val x1 = math.min(w - 1, x0 + 1); val wx = fx - x0
        // CAST the weights: DuckDB types bare decimal literals as
        // DECIMAL, and (1.0 - wx) in exact decimal arithmetic lands on
        // a DIFFERENT double than the IEEE subtraction the kernel does
        s"(${y0 * w + x0 + 1},${y0 * w + x1 + 1},${y1 * w + x0 + 1},${y1 * w + x1 + 1}," +
          s"CAST($wx AS DOUBLE),CAST($wy AS DOUBLE))"
      }
    }.mkString(",")
    val bilinear = "(pix[a]*(1.0-wx) + pix[b]*wx) * (1.0-wy) + (pix[c]*(1.0-wx) + pix[d]*wx) * wy"
    s"""WITH ${stubPixelsCte("TRUE", w * h)},
      pl AS (SELECT media_id, list(p ORDER BY i) AS pix FROM px GROUP BY media_id),
      grid(a, b, c, d, wx, wy) AS (VALUES $grid),
      vals AS (SELECT media_id,
          LEAST(255.0, GREATEST(0.0, ${sqlRint(bilinear)})) AS v
        FROM pl CROSS JOIN grid)
      SELECT media_id, 'image' AS media_type, CAST($tw AS INTEGER) AS width,
             CAST($th AS INTEGER) AS height, SUM(v) / ${tw * th}.0 AS mean_intensity
      FROM vals GROUP BY media_id ORDER BY media_id"""
  }

  /** DuckDB oracle for [[sampleFrames]] over stub-decoded payloads:
    * frame f's hash state appends one byte (BigInt(f).toByteArray for
    * 0 ≤ f < 128) to the fnv64 fold; per-frame means are integer sums
    * over the 256 stub pixels. */
  private[graft] def framesOracleSql(docFilter: String, nFrames: Int = 4,
                                     w: Int = 16, h: Int = 16): String = {
    require(nFrames <= 127, "single-byte frame ids only")
    import HashSql._
    val frames = (0 until nFrames).map { f =>
      // h' = (h ^ f) * FNV_PRIME (mod 2^64) — the one-byte fold step
      val folded = s"CAST(CAST(xor(h, $f) AS HUGEINT) * ${java.lang.Long.toUnsignedString(0x100000001b3L)} % 18446744073709551616 AS UBIGINT)"
      s"SELECT media_id, $f AS frame_idx, $folded AS h FROM base0"
    }.mkString(" UNION ALL ")
    s"""WITH base0 AS (SELECT doc_id AS media_id, ${HashSql.fnv64("text")} AS h
        FROM documents WHERE $docFilter),
      base AS ($frames),
      rows0 AS (SELECT media_id, frame_idx, i,
          CAST((CAST(h AS HUGEINT) + i) % 18446744073709551616 AS UBIGINT) AS h
        FROM base CROSS JOIN (SELECT unnest(range(0, ${w * h})) AS i) ii),
      r1 AS (SELECT media_id, frame_idx, i, ${mixStage1("h")} AS h FROM rows0),
      r2 AS (SELECT media_id, frame_idx, i, ${mixStage2("h")} AS h FROM r1),
      r3 AS (SELECT media_id, frame_idx, i, ${mixStage3("h")} AS h FROM r2),
      px AS (SELECT media_id, frame_idx,
          CAST(${mixStage4("h")} >> 56 AS DOUBLE) AS p FROM r3)
      SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             SUM(p) / ${w * h}.0 AS frame_mean
      FROM px GROUP BY media_id, frame_idx ORDER BY media_id, frame_idx"""
  }
}
