package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: every variant is built around an inverted index
  * (explode feature → equi-join on feature → group by pair) instead of
  * a document cross join, so the shuffle volume is O(total features),
  * not O(N²). Hash functions are pure Scala (splitmix64 / FNV) —
  * deterministic across JVMs, partitionings and cluster sizes.
  */
object Dedup {

  // ---- tokenize / shingle helpers ------------------------------------

  /** Whitespace tokens with empties removed (matches the oracle side). */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  private def shingleUdf(n: Int) = udf { toks: Seq[String] =>
    if (toks == null || toks.length < n) Seq.empty[String]
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  /** Distinct word n-gram shingles per document. */
  def shingles(text: Column, n: Int): Column = shingleUdf(n)(tokens(text))

  // ---- exact ---------------------------------------------------------

  /** Exact dedup: keep the lowest doc_id per identical text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  // ---- n-gram Jaccard ------------------------------------------------

  /** Near-dup pairs with n-gram Jaccard similarity ≥ threshold.
    *
    * Inverted-index plan: explode shingles, self-join on shingle
    * (only pairs sharing ≥1 shingle are ever materialized), count
    * shared shingles per pair, then Jaccard = |∩| / (|A|+|B|-|∩|).
    * `maxShingleDocFreq` optionally drops ubiquitous shingles (stop
    * shingles explode quadratically at corpus scale); None = exact.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        maxShingleDocFreq: Option[Long] = None): DataFrame = {
    val sh = PartitionUtil.spread(docs)
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
    // shuffle 8-byte shingle hashes, not strings (xxhash64 is codegen'd;
    // a 64-bit collision across a corpus vocabulary is negligible and
    // could only create one extra candidate pair, filtered by jaccard)
    val posting0 = sh.select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle_str"))
      .select(col("doc_id"), col("sz"), xxhash64(col("shingle_str")).as("shingle"))
    val posting = maxShingleDocFreq match {
      case Some(cap) =>
        val freq = posting0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        posting0.join(freq, "shingle")
      case None => posting0
    }
    val a = posting.select(col("shingle"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
    val b = posting.select(col("shingle"), col("doc_id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** splitmix64 finalizer — the per-shingle base hash. */
  private[graft] def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash signature of a shingle set: numHashes independent
    * permutations approximated by mix64(shingleHash + i * GOLDEN). */
  private[graft] def minhashSignature(sh: Seq[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    sh.foreach { s =>
      val base = fnv64(s)
      var i = 0
      while (i < numHashes) {
        val h = mix64(base + i * 0x9e3779b97f4a7c15L)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH candidate near-dup pairs.
    *
    * Banding: `numHashes` signature slots split into `bands` bands of
    * r = numHashes/bands rows; documents colliding on any full band
    * become a candidate pair. Output: (id_a, id_b, n_bands) with the
    * number of colliding bands — deterministic, ordered.
    *
    * Scale shape: explode to (bandIndex, bandHash) keys and self-join
    * per bucket — shuffle is O(N · bands) narrow rows; no cross join.
    */
  def minhashLshPairs(docs: DataFrame, shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigUdf = udf { sh: Seq[String] => minhashSignature(sh, numHashes) }
    val bandUdf = udf { sig: Seq[Long] =>
      sig.grouped(r).zipWithIndex.map { case (slice, i) =>
        (i, slice.foldLeft(0xcbf29ce484222325L)((h, v) => mix64(h ^ v)))
      }.toSeq
    }
    val banded = PartitionUtil.spread(docs)
      .select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .withColumn("sig", sigUdf(col("sh")))
      .select(col("doc_id"), explode(bandUdf(col("sig"))).as("band"))
      .select(col("doc_id"), col("band._1").as("band_idx"), col("band._2").as("band_hash"))
    val a = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_b"))
    a.join(b, Seq("band_idx", "band_hash")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over token features (token hash weighted +1/-1 per
    * bit, sign-summed). Near-dups differ in few bits. */
  private[graft] def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = mix64(fnv64(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash per doc plus a 16-bit prefix bucket for candidate
    * generation; deterministic ordered output (doc_id, simhash, bucket). */
  def simhashBuckets(docs: DataFrame): DataFrame = {
    val shUdf = udf { toks: Seq[String] => simhash64(toks) }
    docs.select(col("doc_id"), shUdf(tokens(col("text"))).as("simhash"))
      .withColumn("bucket", shiftrightunsigned(col("simhash"), 48))
      .orderBy(col("doc_id"))
  }

  // ---- embedding cosine ----------------------------------------------

  /** Exact all-pairs embedding near-dups above a cosine threshold.
    * Brute force (oracle-checkable); the approximate 100 TB path is
    * [[Similarity.lshTopK]]'s hyperplane bucketing with the same
    * scoring expressions. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = PartitionUtil.spread(embeddings).select(col("vec_id"),
      Similarity.normalizeUdf(Similarity.asDouble(col("embedding"))).as("v"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(Similarity.nativeDot(embeddings.sparkSession)(col("va"), col("vb")) > threshold)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
