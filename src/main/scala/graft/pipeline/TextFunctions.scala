package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All pure,
  * deterministic column expressions / UDFs — no external models.
  */
object TextFunctions {

  /** Tiny per-language stopword profiles (n-gram heuristic stand-in).
    * Public-knowledge common-word lists. */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Set("的", "是", "在", "了", "有", "和", "人", "这", "中", "大"))

  /** Heuristic language ID: argmax of stopword-hit ratio per profile;
    * ties and zero hits fall back to "und" (undetermined). */
  private[graft] def detectLang(toks: Seq[String]): String = {
    if (toks == null || toks.isEmpty) return "und"
    val lower = toks.map(_.toLowerCase)
    val scored = profiles.toSeq
      .map { case (lang, words) => (lang, lower.count(words.contains)) }
      .sortBy { case (lang, hits) => (-hits, lang) }
    if (scored.head._2 == 0) "und" else scored.head._1
  }

  val langIdUdf = udf { toks: Seq[String] => detectLang(toks) }

  /** Confusion matrix of heuristic prediction vs the labeled lang. */
  def langIdConfusion(docs: DataFrame): DataFrame =
    PartitionUtil.spread(docs)
      .select(col("lang"), langIdUdf(Dedup.tokens(col("text"))).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))

  /** DuckDB oracle for [[langIdConfusion]], generated from the SAME
    * `profiles` map so the two sides cannot drift: per-profile
    * stopword-hit counts, argmax via a CASE checking languages in
    * ascending name order (= [[detectLang]]'s `(-hits, lang)` sort),
    * zero hits → 'und'. */
  private[graft] def langIdOracleSql: String = {
    val langs = profiles.keys.toSeq.sorted
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val scores = langs.map { l =>
      val words = profiles(l).toSeq.sorted.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(t, x -> list_contains($words, x))) AS s_$l"
    }.mkString(",\n        ")
    val cases = langs.init.map(l => s"WHEN s_$l = $best THEN '$l'")
      .mkString("\n             ")
    s"""WITH toks AS (SELECT lang,
        list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                       x -> lower(x)) AS t
        FROM documents),
      s AS (SELECT lang,
        $scores
        FROM toks),
      pred AS (SELECT lang,
        CASE WHEN $best = 0 THEN 'und'
             $cases
             ELSE '${langs.last}' END AS predicted
        FROM s)
      SELECT lang, predicted, COUNT(*) AS n
      FROM pred GROUP BY lang, predicted ORDER BY lang, predicted"""
  }

  /** Quality-score expression bundle: length, token stats, punctuation
    * and stopword ratios — each a codegen'd column expression. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = Dedup.tokens(text)
    val nTok = size(toks).cast("double")
    val enStop = typedLit(profiles("en").toSeq.sorted)
    Seq(
      "n_chars_q" -> length(text).cast("long"),
      "n_tokens_q" -> size(toks).cast("long"),
      "punct_ratio" -> (length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
        greatest(length(text).cast("double"), lit(1.0))),
      "stopword_ratio" -> (size(filter(toks, t => array_contains(enStop, lower(t)))).cast("double") /
        greatest(nTok, lit(1.0))),
      "mean_token_len" -> (length(regexp_replace(text, " ", "")).cast("double") /
        greatest(nTok, lit(1.0))))
  }

  /** BPE-ish subword count: word-boundary regex split into alpha runs,
    * digit runs and single punctuation — a public-tokenizer-shaped
    * approximation with no model file. */
  val bpeishCountUdf = udf { text: String =>
    if (text == null) 0L
    else "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(text).foldLeft(0L) {
      (n, tok) => n + (if (tok.length <= 4) 1L else ((tok.length + 3) / 4).toLong)
    }
  }

  /** Ordered regex redaction — the PII-scrub shape of a corpus
    * cleaning pipeline (digit runs → `<NUM>`, emails → `<EMAIL>`,
    * entity terms → `<ENT>`, …). Rules apply left to right, each a
    * codegen'd `regexp_replace`; keep patterns in the RE2-compatible
    * subset (character classes, alternation, `\b`) so the same rules
    * run identically on Java regex and RE2-family engines. */
  def redact(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (pattern, replacement)) =>
      regexp_replace(c, pattern, replacement)
    }

  /** Winnowing fingerprints: rolling Karp-Rabin hash over token k-grams,
    * min-in-window selection (Schleimer et al., SIGMOD'03 — public
    * algorithm). Returns the distinct selected hashes. */
  private[graft] def winnow(toks: Seq[String], k: Int = 4, window: Int = 4): Seq[Long] = {
    if (toks == null || toks.length < k) return Seq.empty
    // gram base hash = fnv64 + mix64, the same deterministic 64-bit
    // family as every other hash path here (String.hashCode is only
    // 32 bits — needless collision mass at corpus scale)
    val grams = toks.sliding(k).map(g => Dedup.mix64(Dedup.fnv64(g.mkString(" ")))).toArray
    if (grams.length <= window) Seq(grams.min)
    else grams.sliding(window).map(_.min).toSeq.distinct
  }

  val winnowUdf = udf { toks: Seq[String] => winnow(toks) }

  /** Concat-then-chunk sequence packing — the layout step that turns a
    * document corpus into fixed-length training sequences: documents
    * are laid back-to-back per language in doc_id order and cut every
    * `seqLen` tokens (documents may span a cut — standard GPT-style
    * packing, zero padding waste). Emits each document's starting bin
    * and in-bin offset.
    *
    * Scale shape: one window cumsum per partition key — a single
    * shuffle of narrow (id, lang, count) rows. At corpus scale the
    * partition key gains a shard component ((lang, shard) with
    * per-shard packing) so no single language serializes through one
    * task; the math is unchanged. */
  def sequencePacking(docs: DataFrame, seqLen: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_before DIV $seqLen").as("bin"),
        (col("cum_before") % seqLen).as("offset"))
      .orderBy(col("doc_id"))
  }

  /** RAG-ingestion chunking: fixed token windows with overlap — the
    * standard retrieval-corpus preparation (LangChain/LlamaIndex-style
    * sliding windows, re-expressed as pure Catalyst array functions).
    * Chunk i covers tokens [i·stride, i·stride + chunkToks) with
    * stride = chunkToks − overlap; nChunks = max(1,
    * ⌈(n − overlap)/stride⌉), so every token lands in ≥ 1 chunk, the
    * last chunk may run short, and no chunk is fully contained in its
    * predecessor. Output: (doc_id, chunk_id, chunk_toks, chunk_text).
    *
    * Scale shape: ONE corpus scan — sequence/transform/slice/
    * posexplode are per-row array work, no shuffle, no UDF; output
    * grows ~n/stride per doc (the presentation ORDER BY is the gate's).
    */
  def ragChunks(docs: DataFrame, chunkToks: Int = 32, overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && chunkToks > overlap,
      "ragChunks: need chunkToks > overlap >= 0 (stride must be positive)")
    val stride = chunkToks - overlap
    val toks = Dedup.tokens(col("text"))
    docs.select(col("doc_id"), toks.as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("n_chunks", // DIV: `/` on longs is DOUBLE division in Spark
        greatest(lit(1L), expr(s"(n - $overlap + ${stride - 1}) DIV $stride")))
      .select(col("doc_id"), col("t"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => slice(col("t"), (i * stride + 1).cast("int"), lit(chunkToks)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("chunk_toks"),
        array_join(col("col"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** DuckDB oracle for [[ragChunks]] — the same integer window math
    * over list_slice. */
  private[graft] def ragChunksOracleSql(chunkToks: Int = 32, overlap: Int = 8): String = {
    val stride = chunkToks - overlap
    s"""WITH tk AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      n AS (SELECT doc_id, t, len(t) AS n FROM tk),
      ch AS (SELECT doc_id, unnest(list_transform(
          range(0, GREATEST(1, (n - $overlap + ${stride - 1}) // $stride)),
          i -> struct_pack(cid := i,
            sl := list_slice(t, i * $stride + 1, i * $stride + $chunkToks)))) AS c
        FROM n)
      SELECT doc_id, CAST(c.cid AS BIGINT) AS chunk_id,
        CAST(len(c.sl) AS BIGINT) AS chunk_toks,
        array_to_string(c.sl, ' ') AS chunk_text
      FROM ch ORDER BY doc_id, chunk_id"""
  }

  /** DuckDB oracle for [[sequencePacking]] — all-integer window math. */
  private[graft] def sequencePackingOracleSql(seqLen: Int): String =
    s"""WITH tk AS (SELECT doc_id, lang,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
      w AS (SELECT doc_id, lang, n_tokens,
        COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM tk)
      SELECT doc_id, lang, n_tokens,
             CAST(cum_before // $seqLen AS BIGINT) AS bin,
             CAST(cum_before % $seqLen AS BIGINT) AS offset
      FROM w ORDER BY doc_id"""

  /** Mean corpus token frequency per document — a model-free rarity /
    * quality signal (boilerplate-heavy docs score high, rare-token docs
    * low; the integer-ratio cousin of a unigram-LM logprob, chosen over
    * log-probabilities because `ln` is not guaranteed bit-identical
    * across engines while a single BIGINT/BIGINT division is).
    *
    * Scale shape: one explode + two hash aggregations + one equi-join
    * on token. The frequency side is vocabulary-sized (≪ corpus —
    * heavy-tailed), so AQE broadcasts it in practice; per-doc
    * re-aggregation is map-side combinable. No O(N²) anywhere.
    */
  /** BM25 term-weight index construction (k1=1.2, b=0.75) — the
    * retrieval-quality scoring pass a corpus search/curation pipeline
    * builds over its documents. Log-free rational idf: the classic
    * ln((N−df+0.5)/(df+0.5)) is replaced by the raw odds ratio
    * (2N−2df+1)/(2df+1) — libm ln() is not bit-portable across
    * engines, and the odds ratio preserves the exact df ordering.
    * With avgdl = T/N (T = corpus token count, N = corpus docs) every
    * factor clears to integers:
    *
    *   score = 22·tf·T·(2N−2df+1) / [(10·tf·T + 3T + 9·dl·N)·(2df+1)]
    *
    * evaluated as ONE division of two exact BIGINT products — bit-equal
    * in any IEEE engine (the doctrine q81's unigram LM set). Top-3
    * terms per doc are emitted for the doc_id < 50 slice (q67's
    * window), ranked by (score desc, token).
    *
    * OPERATING RANGE: the numerator 22·tf·T·(2N−2df+1) must stay
    * below 2^63, i.e. tf·T·N ≲ 2·10^17 — comfortable for any single
    * index shard (T = 10^9 tokens, N = 10^6 docs, tf = 10^2 is
    * 10^17), NOT for one monolithic 100 TB index (T ≈ 10^13,
    * N ≈ 10^10 overflows; Spark wraps silently in non-ANSI mode while
    * DuckDB raises). At that scale the index is sharded anyway — each
    * shard scores within range and bit-portability holds per shard;
    * a global unsharded run would need the per-factor grid form
    * (floor each factor to 1e-4 before multiplying as doubles)
    * instead. The same bound applies to [[bm25Search]].
    *
    * Scale shape: the same two linear aggregations as TF-IDF (per-doc
    * tf, per-token df) plus a broadcast 1-row corpus total (no driver
    * count); the ranking window partitions per doc and
    * WindowGroupLimit stops each group at k. No corpus-global sort. */
  def bm25Index(docs: DataFrame): DataFrame = {
    val tok = PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
    val tf = tok.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // dl = Σ tf per doc — a window over the already-aggregated slice
    // (|slice| rows), NOT a second scan+explode of the filtered docs
    val dl = sum(col("tf")).over(Window.partitionBy(col("doc_id")))
    val dfreq = tok.groupBy(col("token"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val corpus = tok.agg(count(lit(1)).as("t_total"),
      count_distinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .withColumn("dl", dl)
      .join(dfreq, Seq("token"))
      .crossJoin(broadcast(corpus))
      .withColumn("num", lit(22L) * col("tf") * col("t_total") *
        (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)))
      .withColumn("den",
        (lit(10L) * col("tf") * col("t_total") + lit(3L) * col("t_total") +
          lit(9L) * col("dl") * col("n_docs")) *
          (lit(2L) * col("df") + lit(1L)))
      .withColumn("score", col("num").cast("double") / col("den").cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** DuckDB oracle for [[bm25Index]] — same integer products, same
    * single double division. */
  private[graft] def bm25OracleSql: String =
    """WITH tok AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
        WHERE doc_id < 50 GROUP BY 1, 2),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok
        WHERE doc_id < 50 GROUP BY 1),
      df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      corpus AS (SELECT COUNT(*) AS t_total,
        COUNT(DISTINCT doc_id) AS n_docs FROM tok),
      scored AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        CAST(22 * tf.tf * c.t_total * (2 * c.n_docs - 2 * df.df + 1) AS DOUBLE) /
        CAST((10 * tf.tf * c.t_total + 3 * c.t_total + 9 * dl.dl * c.n_docs)
             * (2 * df.df + 1) AS DOUBLE) AS score
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token), corpus c),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score DESC, token) AS rank FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
        CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""

  /** BM25 retrieval — the query half of [[bm25Index]]: score EVERY
    * document against a fixed bag of query terms, return the top-k.
    *
    * Scale shape: per-doc length AND per-term tf come out of ONE
    * conditional aggregation over the token stream (no per-term join,
    * no token-table re-scan); df/N/T then reduce from that |docs|-row
    * table and come back as a broadcast 1-row build side, and Spark's
    * ReuseExchange collapses the two consumers of the per-doc
    * aggregate onto one physical corpus scan. Per-term weights use
    * q102's log-free rational idf; the CROSS-TERM sum floors each
    * term's weight to the 1e-4 grid first and adds exact BIGINTs
    * (per-row, order-free — a double Σ across terms would still be
    * fine row-locally, but the grid keeps the score representable
    * identically in any engine). Top-k is TakeOrderedAndProject. */
  def bm25Search(docs: DataFrame,
                 terms: Seq[String] = Seq("hash", "join", "vector", "spark"),
                 k: Int = 20): DataFrame = {
    val tok = PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
    val perDoc = tok.groupBy(col("doc_id")).agg(
      count(lit(1)).as("dl"),
      terms.map(t =>
        sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_$t")): _*)
    val stats = perDoc.agg(
      sum(col("dl")).as("t_total"),
      count(lit(1)).as("n_docs") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    // per-term grid weight: 0 exactly when tf = 0 (num = 0), so no
    // presence conditional is needed
    def w(t: String): Column = {
      val num = lit(22L) * col(s"tf_$t") * col("t_total") *
        (lit(2L) * col("n_docs") - lit(2L) * col(s"df_$t") + lit(1L))
      val den =
        (lit(10L) * col(s"tf_$t") * col("t_total") + lit(3L) * col("t_total") +
          lit(9L) * col("dl") * col("n_docs")) *
          (lit(2L) * col(s"df_$t") + lit(1L))
      floor(num.cast("double") / den.cast("double") * lit(10000.0)).cast("long")
    }
    // probe-side postings pruning: a document containing NONE of the
    // query terms scores exactly 0 (every num = 0), so drop it BEFORE
    // the broadcast join — at corpus scale this is the difference
    // between scoring the postings and scoring the whole corpus. The
    // result therefore contains AT MOST k rows, fewer when fewer than
    // k documents match any term — the oracle prunes identically.
    // stats above still reduces over ALL of perDoc (df/N/T are
    // corpus-level). The OR-reduction is arity-safe for a single term
    // (greatest() requires >= 2 args).
    perDoc.filter(terms.map(t => col(s"tf_$t") > 0L).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .withColumn("score",
        terms.map(w).reduce(_ + _).cast("double") / lit(10000.0))
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[bm25Search]] — same conditional aggregation,
    * same rational weights floored to the 1e-4 grid; window SUMs go
    * HUGEINT, cast back to BIGINT before use (q80 lesson). */
  private[graft] def bm25SearchOracleSql(
      terms: Seq[String] = Seq("hash", "join", "vector", "spark"),
      k: Int = 20): String = {
    val tfCols = terms.map(t =>
      s"SUM(CASE WHEN token = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(", ")
    val dfCols = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
    def w(t: String): String =
      s"""CAST(FLOOR(CAST(22 * tf_$t * t_total * (2 * n_docs - 2 * df_$t + 1) AS DOUBLE)
         / CAST((10 * tf_$t * t_total + 3 * t_total + 9 * dl * n_docs)
             * (2 * df_$t + 1) AS DOUBLE) * 10000.0) AS BIGINT)"""
    val tfOut = terms.map(t => s"CAST(tf_$t AS BIGINT) AS tf_$t").mkString(", ")
    s"""WITH tok AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents),
      per_doc AS (SELECT doc_id, COUNT(*) AS dl, $tfCols FROM tok GROUP BY 1),
      stats AS (SELECT SUM(dl) AS t_total, COUNT(*) AS n_docs, $dfCols
        FROM per_doc)
      SELECT doc_id, CAST(dl AS BIGINT) AS dl, $tfOut,
        CAST(${terms.map(w).mkString(" + ")} AS DOUBLE) / 10000.0 AS score
      FROM per_doc, stats
      WHERE ${terms.map(t => s"tf_$t > 0").mkString(" OR ")}
      ORDER BY score DESC, doc_id LIMIT $k"""
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1),
    * restated in pure integer arithmetic so every engine agrees
    * bit-exactly (no ratio is ever materialized as a float):
    *
    *   r_len:  50 ≤ n_tokens ≤ 100000
    *   r_mtl:  3·n_tokens ≤ Σ len(token) ≤ 10·n_tokens  (mean token length 3–10)
    *   r_stop: ≥ 2 stopword hits
    *   r_rep:  5·max_tf ≤ n_tokens  (no token exceeds 20% of the doc)
    *
    * keep = all four. Emitted as 0/1 BIGINTs per rule — the per-rule
    * breakdown is what a pipeline operator actually monitors (which
    * rule fires, not just the survivor set).
    *
    * Scale shape: one (doc, token) hash aggregation, then one per-doc
    * aggregation over it — two map-side-combined linear passes, no
    * joins, no windows. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val stops = profiles("en")
    val tf = PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * length(col("token"))).as("char_sum"),
        sum(when(col("token").isInCollection(stops), col("tf"))
          .otherwise(0L)).as("stop_hits"),
        max(col("tf")).as("max_tf"))
      .select(col("doc_id"), col("n_tokens"), col("char_sum"),
        col("stop_hits"), col("max_tf"),
        flag(col("n_tokens") >= 50 && col("n_tokens") <= 100000).as("r_len"),
        flag(col("char_sum") >= col("n_tokens") * 3 &&
          col("char_sum") <= col("n_tokens") * 10).as("r_mtl"),
        flag(col("stop_hits") >= 2).as("r_stop"),
        flag(col("max_tf") * 5 <= col("n_tokens")).as("r_rep"))
      .withColumn("keep",
        col("r_len") * col("r_mtl") * col("r_stop") * col("r_rep"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[gopherRules]] — same integer tests. */
  private[graft] def gopherRulesOracleSql: String = {
    val stopList = profiles("en").toSeq.sorted.map(s => s"'$s'").mkString(", ")
    s"""WITH tf AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents),
      tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
      agg AS (SELECT doc_id,
        CAST(SUM(tf) AS BIGINT) AS n_tokens,
        CAST(SUM(tf * LENGTH(token)) AS BIGINT) AS char_sum,
        CAST(SUM(CASE WHEN token IN ($stopList) THEN tf ELSE 0 END) AS BIGINT) AS stop_hits,
        CAST(MAX(tf) AS BIGINT) AS max_tf
      FROM tfc GROUP BY doc_id)
      SELECT doc_id, n_tokens, char_sum, stop_hits, max_tf,
        CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_len,
        CAST(CASE WHEN char_sum BETWEEN 3 * n_tokens AND 10 * n_tokens THEN 1 ELSE 0 END AS BIGINT) AS r_mtl,
        CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
        CAST(CASE WHEN 5 * max_tf <= n_tokens THEN 1 ELSE 0 END AS BIGINT) AS r_rep,
        CAST((CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
           * (CASE WHEN char_sum BETWEEN 3 * n_tokens AND 10 * n_tokens THEN 1 ELSE 0 END)
           * (CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END)
           * (CASE WHEN 5 * max_tf <= n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS keep
      FROM agg ORDER BY doc_id"""
  }

  /** Systematic PPS sampling: select docs with probability proportional
    * to `n_chars` by walking each lang's cumulative-weight line and
    * picking every s-th unit, s = ⌊W/k⌋ — deterministic and
    * integer-exact (no RNG, no float pow/log). A doc is selected iff
    * its interval [cum_before, cum_before+w) contains a multiple of s:
    * m_min·s < cum_before + w with m_min = ⌈cum_before/s⌉, all in
    * non-negative BIGINT arithmetic (trunc-vs-floor division can't
    * differ). Long docs carry multiplicity n_picks ≥ 1 (standard PPS).
    * Scale shape: ONE shuffle on lang serves both the running and the
    * full-partition window. */
  def ppsSample(docs: DataFrame, k: Long): DataFrame = {
    val ord = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"), col("n_chars").as("w"))
      .withColumn("cum_before",
        coalesce(sum(col("w")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("step",
        greatest(expr(s"sum(w) OVER (PARTITION BY lang) DIV $k"), lit(1L)))
      .withColumn("m_min", expr("(cum_before + step - 1) DIV step"))
      .withColumn("n_picks",
        expr("(cum_before + w - 1) DIV step") - col("m_min") + 1L)
      .filter(col("m_min") * col("step") < col("cum_before") + col("w"))
      .select(col("lang"), col("doc_id"), col("w"), col("cum_before"),
        col("m_min"), col("n_picks"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Bigram language-model table — the training half of LM-based
    * quality filtering (q81 scores with a unigram stand-in; this
    * builds the bigram conditional table p(b|a) = c(ab)/c(a·)). The
    * probability is ONE division of two exact BIGINT counts, so it is
    * bit-equal in every IEEE engine; top-k is ordered by
    * (c_ab desc, a, b) — fully deterministic.
    *
    * Scale shape: bigrams derive INSIDE each row's token array
    * (`arrays_zip(slice(t,1,n-1), slice(t,2,n-1))` — codegen'd, no
    * per-doc window, no shuffle before the count aggregation); the
    * token stream is scanned ONCE — c(a·) comes from a window over
    * the already-aggregated |bigram types| table (sorting vocab-sized
    * data, never corpus-sized), not a second explode+count; top-k is
    * TakeOrderedAndProject, never a global sort. */
  def bigramLm(docs: DataFrame, k: Int = 50): DataFrame = {
    val t = Dedup.tokens(col("text"))
    val bg = PartitionUtil.spread(docs)
      .select(t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
      .select(col("bg.0").as("a"), col("bg.1").as("b"))
    val cab = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    cab.withColumn("c_a", sum(col("c_ab")).over(Window.partitionBy(col("a"))))
      .withColumn("p", col("c_ab").cast("double") / col("c_a").cast("double"))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("p"))
      .orderBy(col("c_ab").desc, col("a"), col("b"))
      .limit(k)
  }

  /** DuckDB oracle for [[bigramLm]] — 1-based list indexing over the
    * same token split; the window SUM yields HUGEINT, cast back to
    * BIGINT on the way out (q80 lesson). */
  private[graft] def bigramLmOracleSql(k: Int = 50): String =
    s"""WITH toks AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
      bg AS (SELECT t[p] AS a, t[p + 1] AS b
        FROM (SELECT t, unnest(range(1, len(t))) AS p FROM toks WHERE len(t) >= 2)),
      cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2)
      SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
        CAST(SUM(c_ab) OVER (PARTITION BY a) AS BIGINT) AS c_a,
        CAST(c_ab AS DOUBLE) / CAST(SUM(c_ab) OVER (PARTITION BY a) AS DOUBLE) AS p
      FROM cab
      ORDER BY c_ab DESC, a, b LIMIT $k"""

  /** Bigram-surprise document scoring — the SCORING half of the
    * [[bigramLm]] story (perplexity-style LM quality filtering,
    * log-free): each bigram's surprise is the inverse conditional
    * probability c(a·)/c(ab) floored onto a 1e-4 integer grid with
    * pure BIGINT arithmetic (`c_a * 10000 div c_ab` — no float mul,
    * no ln; monotone in 1/p, which is all a quality FILTER needs), and
    * a document scores the exact BIGINT sum + count of its bigrams'
    * surprises. Self-scored against the corpus's own LM here (so no
    * OOV path is reachable by construction); a production run scores
    * against a reference-corpus LM and adds smoothing/backoff.
    *
    * Scale shape: two passes over the token stream — one builds the
    * LM (exactly [[bigramLm]]'s shape: aggregate + vocab-sized
    * window), one scores — the same two passes a train-then-score
    * pipeline has by definition (production scores against a
    * pre-built LM table, making each phase single-pass). The doc
    * bigram stream equi-joins the LM on (a,b) — both sides
    * hash-partitioned by bigram, map-side-combined re-agg per doc
    * after. No cross join, no per-doc window. */
  def bigramSurprise(docs: DataFrame): DataFrame = {
    val t = Dedup.tokens(col("text"))
    val bg = PartitionUtil.spread(docs)
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("a"), col("bg.1").as("b"))
    val lm = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .withColumn("c_a", sum(col("c_ab")).over(Window.partitionBy(col("a"))))
    bg.join(lm, Seq("a", "b"))
      .withColumn("s", expr("(c_a * 10000L) div c_ab"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("total_surprise"))
      .withColumn("avg_surprise",
        col("total_surprise").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[bigramSurprise]] — same BIGINT grid division
    * (`//` floors like Spark's `div` for the positive counts here);
    * SUM outputs cast back from HUGEINT. */
  private[graft] def bigramSurpriseOracleSql: String =
    """WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      bg AS (SELECT doc_id, t[p] AS a, t[p + 1] AS b
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p
          FROM toks WHERE len(t) >= 2)),
      lm AS (SELECT a, b, COUNT(*) AS c_ab,
          CAST(SUM(COUNT(*)) OVER (PARTITION BY a) AS BIGINT) AS c_a
        FROM bg GROUP BY 1, 2)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        CAST(SUM((c_a * 10000) // c_ab) AS BIGINT) AS total_surprise,
        CAST(SUM((c_a * 10000) // c_ab) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS avg_surprise
      FROM bg JOIN lm USING (a, b)
      GROUP BY doc_id ORDER BY doc_id"""

  def tokenRarity(docs: DataFrame): DataFrame = {
    val tok = PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    tok.join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_freq"))
      .withColumn("mean_tok_freq",
        col("sum_freq").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[tokenRarity]] — exact integer counts, one
    * final division (deterministic: both inputs are exact BIGINTs). */
  private[graft] def tokenRarityOracleSql: String =
    """WITH tok AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
      freq AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(tf) AS BIGINT) AS sum_freq,
             CAST(SUM(tf) AS DOUBLE) / COUNT(*) AS mean_tok_freq
      FROM tok JOIN freq USING (tok)
      GROUP BY doc_id ORDER BY doc_id"""

  /** DSIR-style data selection via importance reweighting (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how target-like its
    * unigram distribution is, then keep the top `k`. The per-token
    * importance weight is the smoothed target/raw frequency odds ratio
    * on a 1e4 integer grid, `((2·c_t+1)·10000) div (2·c_r+1)` — the
    * same libm-free substitution the BM25 path documents (log-space
    * weights are not bit-portable across engines; the odds ratio is
    * exact BIGINT arithmetic and rank-equivalent for selection). The
    * constant normalizer Σc_r/Σc_t scales every token's weight equally
    * and is omitted — it cannot change any document's rank. A doc's
    * score is the SUM of its token instances' weights (the additive
    * analogue of the paper's log-likelihood ratio).
    *
    * Scale shape: ONE pass over the token stream builds both corpus
    * models as a single conditional aggregate (c_r = all instances,
    * c_t = instances from target docs — map-side combined, vocab-sized
    * result), the weight table equi-joins back to the token stream on
    * token (both sides hash-partitioned by token), per-doc re-agg is
    * map-side combined, and the final global top-k is
    * [[PartitionUtil.saltedTopK]] under a constant key — bounded
    * two-phase selection, never a corpus-wide rank window. */
  def dsirSelect(docs: DataFrame, targetCond: Column, k: Int): DataFrame = {
    require(k > 0, "dsirSelect: k must be positive")
    val tok = PartitionUtil.spread(docs)
      .select(col("doc_id"), targetCond.as("tgt"),
        explode(Dedup.tokens(col("text"))).as("tok"))
    val w = tok.groupBy(col("tok"))
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("c_t"))
      .withColumn("wg", expr("((2 * c_t + 1) * 10000) div (2 * c_r + 1)"))
    val scores = tok.join(w.select(col("tok"), col("wg")), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wg")).as("score"))
      .withColumn("g", lit(0L))
      .withColumn("neg", -col("score"))
    PartitionUtil.saltedTopK(scores, "g", k = k, ordCol = "neg", idCol = "doc_id")
      .select(col("doc_id"), (-col("neg")).as("score"), col("pos"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .select(col("pos"), col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("pos"))
  }

  /** Collocation extraction: the top-k adjacent token pairs by
    * association strength — the classic corpus-linguistics PMI
    * ranking (Church & Hanks 1990) with the engine's libm-free
    * substitution: instead of log(P(ab)/(P(a)P(b))) the EXACT integer
    * odds `(c_ab · N · 10⁴) div (c_a · c_b)` (rank-equivalent: log is
    * monotone), with a minimum pair support so hapax pairs don't
    * dominate. Overflow bound: a dominant pair has c_ab = Θ(N), so
    * c_ab·N·10⁴ ≈ N²·10⁴ exceeds 2⁶³ once N ≳ 3·10⁷ tokens — the
    * 100 TB path swaps the product to DECIMAL; BIGINT covers every
    * test scale by orders of magnitude.
    *
    * Scale shape: one bigram aggregation + one unigram aggregation
    * (both map-side combined, vocab-bounded), two token-keyed joins to
    * attach c_a/c_b, and a TakeOrdered top-k (per-partition partial
    * top-k, never a global sort). */
  def collocations(docs: DataFrame, minSupport: Long, k: Int): DataFrame = {
    require(minSupport > 0 && k > 0, "collocations: minSupport and k must be positive")
    val t = Dedup.tokens(col("text"))
    val bg = PartitionUtil.spread(docs)
      .select(t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
      .select(col("bg.0").as("a"), col("bg.1").as("b"))
    val uni = PartitionUtil.spread(docs)
      .select(explode(t).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val n = Option(uni.agg(sum(col("c"))).head().get(0))
      .fold(0L)(_.asInstanceOf[Long])
    require(n > 0, "collocations: empty token stream")
    bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
      .withColumn("pmi_q4", expr(s"(c_ab * ${n}L * 10000) div (c_a * c_b)"))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"), col("pmi_q4"))
      .orderBy(col("pmi_q4").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Blocklist scan: per banned pattern, how many documents contain
    * it and how many occurrences the corpus holds — the single-pass
    * compliance/contamination sweep. One Aho–Corasick automaton
    * (built once on the driver, broadcast as a few KB) finds every
    * occurrence of every pattern in one pass over each document —
    * P patterns cost ONE scan, not P scans, and the text column is
    * never shuffled: the only exchange is the final |P|-row
    * aggregation, map-side combined. Counts are leftmost
    * NON-OVERLAPPING per pattern ([[graft.functions.AhoCorasick]]),
    * which is what makes them replayable with `replace()` arithmetic
    * in the oracle even for self-overlapping (bordered) patterns. */
  def blocklistStats(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val ac = graft.functions.AhoCorasick.build(patterns)
    val bc = docs.sparkSession.sparkContext.broadcast(ac)
    val hits = udf { (text: String) =>
      bc.value.countMatches(if (text == null) "" else text)
    }
    val pats = array(patterns.map(lit): _*)
    docs.select(posexplode(hits(col("text"))).as(Seq("p", "h")))
      .groupBy(col("p"))
      .agg(count(when(col("h") > 0, 1)).as("n_docs"), sum(col("h")).as("n_hits"))
      .select(element_at(pats, col("p") + 1).as("pat"), col("n_docs"), col("n_hits"))
      .orderBy(col("pat"))
  }

  /** DuckDB oracle for [[blocklistStats]]: replace()-based
    * non-overlapping occurrence counts — the automaton counts with
    * the same leftmost non-overlapping greedy rule, so bordered
    * patterns agree too. */
  private[graft] def blocklistOracleSql(patterns: Seq[String]): String = {
    val vals = patterns.map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    s"""WITH pats(pat) AS (VALUES $vals),
       |h AS (SELECT p.pat,
       |  (length(d.text) - length(replace(d.text, p.pat, ''))) // length(p.pat) AS h
       |  FROM documents d CROSS JOIN pats p)
       |SELECT pat, CAST(COUNT(CASE WHEN h > 0 THEN 1 END) AS BIGINT) AS n_docs,
       |  CAST(SUM(h) AS BIGINT) AS n_hits
       |FROM h GROUP BY pat ORDER BY pat""".stripMargin
  }

  /** DuckDB oracle for [[collocations]] — same integer odds and
    * (pmi DESC, a, b) rank. */
  private[graft] def collocationsOracleSql(minSupport: Long, k: Int): String =
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      bg AS (SELECT t[p] AS a, t[p + 1] AS b
        FROM (SELECT t, unnest(range(1, len(t))) AS p
          FROM toks WHERE len(t) >= 2)),
      uni AS (SELECT unnest(t) AS tok FROM toks),
      uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
      n AS (SELECT COUNT(*) AS n FROM uni),
      pairs AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b
        HAVING COUNT(*) >= $minSupport)
      SELECT p.a, p.b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
        (p.c_ab * (SELECT n FROM n) * 10000) // (ca.c * cb.c) AS pmi_q4
      FROM pairs p JOIN uc ca ON ca.tok = p.a JOIN uc cb ON cb.tok = p.b
      ORDER BY pmi_q4 DESC, p.a, p.b LIMIT $k"""

  /** Count-Min sketch over the corpus token stream, audited against
    * exact counts (Cormode & Muthukrishnan 2005): a depth×width cell
    * matrix where cell (d, b) counts token instances whose d-th hash
    * lands in bucket b; a token's estimate is the MIN over its depth
    * cells and NEVER undercounts. The sketch is LINEAR — cells are
    * plain sums — so it is exactly mergeable in any split order, fully
    * map-side combinable, and bit-reproducible (the point of the
    * exercise: an approximate structure whose every cell is an exact
    * integer, so the DuckDB oracle replays estimate AND error).
    * Per-depth hashes come from the native `salted_hash64` expression
    * (the minhash permutation family mix64(h + d·GOLDEN) — codegen'd,
    * no ANSI-overflow hazard, mirrored in [[HashSql]]).
    *
    * Output: the `probes` alphabetically-first tokens with exact
    * count, sketch estimate, and overestimate (≥ 0 by construction).
    * Scale shape: ONE pass over the token stream into a depth·width-
    * bounded cell relation (the sketch is ~KB at ANY corpus size —
    * this is what you ship to a dashboard instead of a 10^9-row exact
    * count table); the probe estimate join broadcasts the cells. */
  def countMinEstimates(docs: DataFrame, width: Int = 256, depth: Int = 4,
                        probes: Int = 25): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0,
      "countMin: width must be a power of two (cross-engine bucket parity " +
        "relies on low-bit masking semantics)")
    require(depth > 0 && probes > 0, "countMin: depth and probes must be positive")
    val s = docs.sparkSession
    graft.functions.ContentHashExpression.register(s)
    graft.functions.SaltedHashExpression.register(s)
    import graft.functions.ContentHashExpression.contentHash64
    import graft.functions.SaltedHashExpression.saltedHash64
    val ds = array((0 until depth).map(d => lit(d.toLong)): _*)
    def bucket(h: Column, d: Column): Column =
      pmod(saltedHash64(h, d), lit(width.toLong))
    val tok = PartitionUtil.spread(docs)
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
    val hashed = tok.select(col("tok"), contentHash64(col("tok")).as("h"))
    val cells = hashed
      .select(explode(ds).as("d"), col("h"))
      .select(col("d"), bucket(col("h"), col("d")).as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("c"))
    val exact = hashed.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
    exact.orderBy(col("tok")).limit(probes)
      .select(col("tok"), col("exact_cnt"), contentHash64(col("tok")).as("h"))
      .select(col("tok"), col("exact_cnt"), explode(ds).as("d"), col("h"))
      .select(col("tok"), col("exact_cnt"), col("d"), bucket(col("h"), col("d")).as("b"))
      .join(broadcast(cells), Seq("d", "b"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overest"))
      .orderBy(col("tok"))
  }

  /** DuckDB oracle for [[countMinEstimates]]: the same staged
    * mix64∘fnv64 content hash, the same per-depth salted permutation
    * (addMod of the wrapped d·GOLDEN, then the four mix stages), the
    * same power-of-two bucket masking on the UNSIGNED bit pattern. */
  private[graft] def countMinOracleSql(width: Int, depth: Int, probes: Int): String = {
    import HashSql._
    val g = graft.functions.SaltedHashUtil.Golden
    s"""WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents),
      f0 AS MATERIALIZED (SELECT tok, ${fnv64("tok")} AS h FROM tok),
      f1 AS (SELECT tok, ${mixStage1("h")} AS h FROM f0),
      f2 AS (SELECT tok, ${mixStage2("h")} AS h FROM f1),
      f3 AS (SELECT tok, ${mixStage3("h")} AS h FROM f2),
      ch AS MATERIALIZED (SELECT tok, ${mixStage4("h")} AS h FROM f3),
      td AS (SELECT tok, ${addModExpr("h", mulMod("d", g))} AS h, d
        FROM ch, range($depth) t(d)),
      p1 AS (SELECT tok, d, ${mixStage1("h")} AS h FROM td),
      p2 AS (SELECT tok, d, ${mixStage2("h")} AS h FROM p1),
      p3 AS (SELECT tok, d, ${mixStage3("h")} AS h FROM p2),
      p4 AS MATERIALIZED (SELECT tok, d, CAST(${mixStage4("h")} % $width AS BIGINT) AS b
        FROM p3),
      cells AS MATERIALIZED (SELECT d, b, COUNT(*) AS c FROM p4 GROUP BY d, b),
      exact AS (SELECT tok, COUNT(*) AS exact_cnt FROM tok GROUP BY tok),
      probe AS MATERIALIZED (SELECT tok, exact_cnt FROM exact ORDER BY tok LIMIT $probes),
      pb AS (SELECT DISTINCT p4.tok, d, b FROM p4
        WHERE p4.tok IN (SELECT tok FROM probe)),
      est AS (SELECT pb.tok, MIN(c) AS cms_est
        FROM pb JOIN cells USING (d, b) GROUP BY pb.tok)
      SELECT p.tok, p.exact_cnt, e.cms_est, e.cms_est - p.exact_cnt AS overest
      FROM probe p JOIN est e USING (tok) ORDER BY tok"""
  }

  /** DuckDB oracle for [[dsirSelect]] over `documents` with target =
    * `source = 'src0'` — same one-pass conditional counts, grid odds
    * ratios, and (score DESC, doc_id) rank (the oracle may use the
    * global rank window the engine deliberately avoids). */
  private[graft] def dsirSelectOracleSql(k: Int): String =
    s"""WITH tok AS (SELECT doc_id, (source = 'src0') AS tgt,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
      w AS (SELECT tok, ((2 * SUM(CASE WHEN tgt THEN 1 ELSE 0 END) + 1) * 10000)
          // (2 * COUNT(*) + 1) AS wg
        FROM tok GROUP BY tok),
      scores AS (SELECT doc_id, CAST(SUM(wg) AS BIGINT) AS score
        FROM tok JOIN w USING (tok) GROUP BY doc_id),
      ranked AS (SELECT doc_id, score,
          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS pos
        FROM scores)
      SELECT CAST(r.pos AS BIGINT) AS pos, r.doc_id, d.lang, d.source, r.score
      FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
      WHERE r.pos <= $k ORDER BY pos"""

  /** Integer-exact token-length distribution quantiles per language —
    * the corpus-profiling pass that feeds length-filter thresholds and
    * sequence-packing bin sizing. The p-th percentile is the smallest
    * length whose cumulative doc count reaches ⌈p·n/100⌉
    * (percentile_disc semantics), tested as `100·cum ≥ p·n` in pure
    * BIGINT — no float quantile interpolation, so every engine agrees
    * exactly.
    *
    * Scale shape: one map-side-combining hash aggregation to
    * (lang, len) counts — the only pass over the corpus — then the
    * window and quantile picks run over DISTINCT lengths per lang (a
    * bounded domain, thousands of rows at most), never over documents.
    * No global sort of the corpus; compare sorting N rows to rank
    * directly, which a naive percentile would do. */
  def lengthQuantiles(docs: DataFrame, ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val nTok = size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
    val counts = PartitionUtil.spread(docs)
      .select(col("lang"), nTok.as("len"))
      .groupBy(col("lang"), col("len")).agg(count(lit(1)).as("cnt"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("lang").orderBy("len")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("lang")))
    val aggs = max(col("n")).as("n_docs") +:
      ps.map(p => min(when(col("cum") * 100 >= col("n") * p, col("len"))).as(s"p$p"))
    cum.groupBy(col("lang"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("lang"))
  }

  /** DuckDB oracle for [[lengthQuantiles]] — the same pure-BIGINT rank
    * test (DuckDB's window SUM yields HUGEINT; it only feeds the
    * comparison, and every OUTPUT casts to BIGINT). */
  private[graft] def lengthQuantilesOracleSql(ps: Seq[Int] = Seq(50, 90, 99)): String = {
    val qcols = ps.map(p =>
      s"CAST(MIN(CASE WHEN cum * 100 >= n * $p THEN len END) AS BIGINT) AS p$p")
      .mkString(",\n        ")
    s"""WITH lens AS (SELECT lang,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
      FROM documents),
      counts AS (SELECT lang, len, COUNT(*) AS cnt FROM lens GROUP BY lang, len),
      cum AS (SELECT lang, len, cnt,
          SUM(cnt) OVER (PARTITION BY lang ORDER BY len) AS cum,
          SUM(cnt) OVER (PARTITION BY lang) AS n
        FROM counts)
      SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
        $qcols
      FROM cum GROUP BY lang ORDER BY lang"""
  }

  /** Vocabulary coverage / OOV rate against the corpus' own top-V
    * vocabulary — the tokenizer-fit signal: docs with high OOV counts
    * against a candidate vocabulary will fragment into long byte-level
    * token sequences. Vocabulary = the `vocabSize` most frequent
    * tokens (ties broken on the token string, so the cut is total and
    * deterministic).
    *
    * Scale shape: the vocabulary is a map-side-combining count
    * aggregation followed by a top-V (TakeOrdered over the vocabulary
    * domain, not the corpus); scoring joins the token stream against
    * the broadcast V-row vocab (hash join inside codegen, no shuffle
    * of the stream) and re-aggregates per doc map-side. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 256): DataFrame = {
    val toks = PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"))
      .withColumn("n_oov", col("n_tokens") - col("n_in_vocab"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[vocabCoverage]] — independent ROW_NUMBER
    * formulation of the same (count desc, token) vocabulary cut. */
  private[graft] def vocabCoverageOracleSql(vocabSize: Int = 256): String =
    s"""WITH toks AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
      vc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
      vocab AS (SELECT tok FROM (
          SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn FROM vc)
        WHERE rn <= $vocabSize)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
        CAST(COUNT(*) - SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id ORDER BY t.doc_id"""

  /** Content-defined chunking (CDC): a token ends a chunk when its
    * mix64(fnv64(token)) has `maskBits` low zero bits — the
    * rsync/LBFS-style gear rule, giving ~2^maskBits-token chunks whose
    * boundaries are CONTENT positions, so an insertion near the start
    * of a document shifts no downstream chunk (fixed windows, q74,
    * re-chunk everything after the edit). Returns each duplicated
    * chunk group across the corpus: (chunk fnv64, occurrences,
    * distinct docs, lowest doc). */
  private[graft] def cdcChunkHashes(toks: Seq[String], maskBits: Int): Seq[Long] = {
    if (toks == null || toks.isEmpty) return Seq.empty
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cur = new StringBuilder
    toks.foreach { t =>
      if (cur.nonEmpty) cur.append(' ')
      cur.append(t)
      if ((Dedup.mix64(Dedup.fnv64(t)) & mask) == 0L) {
        out += Dedup.fnv64(cur.toString); cur.clear()
      }
    }
    if (cur.nonEmpty) out += Dedup.fnv64(cur.toString)
    out.toSeq
  }

  /** Duplicated CDC chunks corpus-wide (see [[cdcChunkHashes]]). */
  def cdcChunkDedup(docs: DataFrame, maskBits: Int = 4): DataFrame = {
    val chunksUdf = udf { toks: Seq[String] => cdcChunkHashes(toks, maskBits) }
    PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(chunksUdf(Dedup.tokens(col("text")))).as("chash"))
      .groupBy(col("chash"))
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keep_id"))
      .filter(col("n") > 1)
      .orderBy(col("chash"))
  }

  /** DuckDB oracle for [[cdcChunkDedup]]: per-token boundary flags from
    * the staged [[HashSql]] mix pipeline, chunk ids via a window cumsum
    * of PRECEDING boundaries, chunk text via ordered string_agg, chunk
    * hash via the same fnv64 — bit-exact against the Scala fold. */
  private[graft] def cdcChunkDedupOracleSql(maskBits: Int = 4): String = {
    import HashSql._
    val mask = (1L << maskBits) - 1
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      tokr AS (SELECT doc_id, unnest(t) AS tok,
        unnest(range(1, len(t) + 1)) AS i FROM toks WHERE len(t) > 0),
      f AS (SELECT doc_id, i, tok, ${fnv64("tok")} AS h FROM tokr),
      m1 AS (SELECT doc_id, i, tok, ${mixStage1("h")} AS h FROM f),
      m2 AS (SELECT doc_id, i, tok, ${mixStage2("h")} AS h FROM m1),
      m3 AS (SELECT doc_id, i, tok, ${mixStage3("h")} AS h FROM m2),
      m4 AS (SELECT doc_id, i, tok, ${mixStage4("h")} AS h FROM m3),
      b AS (SELECT doc_id, i, tok,
        CASE WHEN (h & $mask) = 0 THEN 1 ELSE 0 END AS bnd FROM m4),
      cid AS (SELECT doc_id, i, tok, COALESCE(SUM(bnd) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        FROM b),
      chunks AS (SELECT doc_id, chunk_id,
          string_agg(tok, ' ' ORDER BY i) AS ctext
        FROM cid GROUP BY doc_id, chunk_id),
      ch AS (SELECT doc_id, ${toSigned(fnv64("ctext"))} AS chash FROM chunks)
      SELECT chash, COUNT(*) AS n, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             MIN(doc_id) AS keep_id
      FROM ch GROUP BY chash HAVING COUNT(*) > 1 ORDER BY chash"""
  }

  /** Maximal duplicated token spans per document — the substring-level
    * dedup signal (the distributed stand-in for the suffix-array
    * "exact substring" dedup of Lee et al. 2022, arXiv:2107.06499):
    * every position starting an n-token shingle that occurs in ≥ 2
    * distinct documents is "duplicated", and runs of duplicated
    * positions merge into maximal spans (classic gaps-and-islands —
    * for fixed n the span end p+n is monotone in p, so a span breaks
    * exactly when p > lag(p) + n). Unlike fixed (q74) or
    * content-defined (q83) CHUNK dedup, spans localize how MUCH of
    * each document is copied and in how many contiguous regions.
    *
    * Scale shape: one posexplode to (doc, position, shingle-md5) —
    * O(total tokens) narrow rows; duplicated shingles come from one
    * hash aggregation; positions semi-join against it (AQE broadcasts
    * when the dup set is small); the island window partitions BY DOC
    * over in-doc positions (bounded by doc length), never globally.
    * Only 16-byte digests shuffle, not shingle text. */
  /** (doc_id, p, h): md5 of each n-token shingle with its 0-based
    * token position — the positioned inverted-index base shared by
    * [[duplicatedSpans]] and [[scrubDuplicatedSpans]]. */
  private def positionedShingles(docs: DataFrame, n: Int): DataFrame = {
    val posShingles = udf { toks: Seq[String] =>
      if (toks == null || toks.length < n) Seq.empty[(Long, String)]
      else toks.sliding(n).zipWithIndex
        .map { case (w, p) => (p.toLong, w.mkString(" ")) }.toSeq
    }
    PartitionUtil.spread(docs)
      .select(col("doc_id"), explode(posShingles(Dedup.tokens(col("text")))).as("ps"))
      .select(col("doc_id"), col("ps._1").as("p"), md5(col("ps._2").cast("binary")).as("h"))
  }

  /** Gaps-and-islands merge of shingle positions into maximal spans
    * (doc_id, start, end) — end exclusive, in token positions. */
  private def mergeIslands(dupPos: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("p")
    dupPos
      .withColumn("brk",
        when(col("p") > coalesce(lag(col("p"), 1).over(w), lit(Long.MinValue)) + n, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        Window.partitionBy("doc_id").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("start"), (max(col("p")) + n).as("end"))
  }

  def duplicatedSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val sh = positionedShingles(docs, n)
    val dup = sh.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val dupPos = sh.join(dup, Seq("h"), "left_semi").select(col("doc_id"), col("p"))
    mergeIslands(dupPos, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("end") - col("start")).as("dup_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[duplicatedSpans]] — the same islands logic
    * over positions of md5-hashed n-token shingles (both sides flag
    * the first position of a doc as a span break: here via the NULL
    * lag case, there because any p exceeds Long.MinValue + n). */
  private[graft] def duplicatedSpansOracleSql(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      pos AS (SELECT doc_id, t, unnest(range(1, len(t) - $n + 2)) AS p
        FROM toks WHERE len(t) >= $n),
      sh AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS p,
          md5(array_to_string(list_slice(t, p, p + $n - 1), ' ')) AS h
        FROM pos),
      dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      dp AS (SELECT doc_id, p FROM sh WHERE h IN (SELECT h FROM dup)),
      brk AS (SELECT doc_id, p,
          CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL THEN 1
               WHEN p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + $n THEN 1
               ELSE 0 END AS b
        FROM dp),
      isl AS (SELECT doc_id, p,
          SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM brk),
      spans AS (SELECT doc_id, island, MIN(p) AS s, MAX(p) + $n AS e
        FROM isl GROUP BY doc_id, island)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(e - s) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id ORDER BY doc_id"""

  /** Cross-document duplicated-span SCRUBBING — the rewrite half of
    * [[duplicatedSpans]] (the ExactSubstr dedup of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * restated on the positioned shingle index): every token position
    * covered by an n-shingle that also occurs in another document is
    * removed, EXCEPT in the lowest-doc_id holder of that shingle.
    * The keep rule is PER SHINGLE, not per passage: each duplicated
    * shingle survives only in its lowest-doc_id holder, and when
    * overlapping shingles of one passage have different min-doc_id
    * holders the nominal keeper can lose interior tokens too (the
    * passage then survives nowhere intact — ExactSubstr's known
    * behavior, which trades occasional fragmentation for a fully
    * deterministic, join-local decision). Docs with nothing
    * duplicated pass unchanged; fully-duplicated docs come out empty
    * (md5 of "").
    *
    * Scale shape: the keep decision is per shingle hash (one
    * aggregation: count distinct docs + min doc); scrub positions
    * merge to maximal spans per doc (per-doc windows, never global);
    * the token-level removal is ONE anti join keyed on doc_id with a
    * range residual — each doc meets only its own few spans, no
    * explode of span ranges. Reconstruction sorts each doc's kept
    * tokens in one per-doc array_sort (no global order). Only 16-byte
    * digests and (id, position) pairs ever shuffle — never text. */
  def scrubDuplicatedSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val sh = positionedShingles(docs, n)
    val dupMin = sh.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"), min(col("doc_id")).as("keeper"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("keeper"))
    val scrubPos = sh.join(dupMin, Seq("h"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("p"))
    val spans = mergeIslands(scrubPos, n)
    val toks = PartitionUtil.spread(docs)
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.alias("t")
      .join(spans.alias("s"),
        col("t.doc_id") === col("s.doc_id") &&
          col("t.pos") >= col("s.start") && col("t.pos") < col("s.end"),
        "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("scrubbed"))
    docs.select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("scrubbed"), lit("")).cast("binary")).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[scrubDuplicatedSpans]]: same positioned
    * shingles, same min-doc keeper rule, same islands merge, token
    * removal as an independent NOT EXISTS over the span ranges, and
    * ordered string_agg reconstruction. */
  private[graft] def scrubDuplicatedSpansOracleSql(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      pos AS (SELECT doc_id, t, unnest(range(1, len(t) - $n + 2)) AS p
        FROM toks WHERE len(t) >= $n),
      sh AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS p,
          md5(array_to_string(list_slice(t, p, p + $n - 1), ' ')) AS h
        FROM pos),
      dupmin AS (SELECT h, MIN(doc_id) AS keeper FROM sh
        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      sp AS (SELECT s.doc_id, s.p FROM sh s JOIN dupmin d ON s.h = d.h
        WHERE s.doc_id <> d.keeper),
      brk AS (SELECT doc_id, p,
          CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL THEN 1
               WHEN p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + $n THEN 1
               ELSE 0 END AS b
        FROM sp),
      isl AS (SELECT doc_id, p,
          SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM brk),
      spans AS (SELECT doc_id, island, MIN(p) AS s, MAX(p) + $n AS e
        FROM isl GROUP BY doc_id, island),
      tokpos0 AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks),
      tokpos AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
          t[CAST(p AS INT)] AS tok FROM tokpos0),
      kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
        WHERE NOT EXISTS (SELECT 1 FROM spans sp2
          WHERE sp2.doc_id = tp.doc_id AND tp.pos >= sp2.s AND tp.pos < sp2.e)),
      rebuilt AS (SELECT doc_id, COUNT(*) AS kept,
          string_agg(tok, ' ' ORDER BY pos) AS scrubbed
        FROM kept GROUP BY doc_id)
      SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tokens,
        CAST(COALESCE(r.kept, 0) AS BIGINT) AS n_kept,
        md5(COALESCE(r.scrubbed, '')) AS scrubbed_md5
      FROM toks tk LEFT JOIN rebuilt r ON r.doc_id = tk.doc_id
      ORDER BY tk.doc_id"""

  /** Heavy hitters: tokens with frequency > N/(k+1), exactly.
    *
    * Two phases: (1) a mergeable Misra–Gries sketch proposes ≤ k
    * candidates in bounded memory (map-side partial buffers of k
    * entries; the full vocabulary never aggregates); (2) the ≤ k
    * candidates broadcast back and an exact recount + threshold filter
    * produces the answer. The sketch's internal weights are
    * order-dependent, but its GUARANTEE (every token above threshold
    * survives) is not — so the exact phase restores full determinism,
    * the same approx-prefilter + exact-verify shape as the Bloom
    * decontamination and LSH near-dup paths. */
  def heavyHitters(docs: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val tok = PartitionUtil.spread(docs)
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(k), Encoders.STRING)
    // One scan proposes the ≤ k candidates AND counts the stream — the
    // result is a single bounded row (k strings + a long), so pulling it
    // to the driver is the broadcast-threshold pattern, not a collect of
    // data. The second (final) scan recounts candidates via an InSet
    // filter (codegen'd, no join) — 2 total scans of the token stream.
    val sketchRow = tok.agg(mg(col("tok")).as("cand"), count(lit(1)).as("n_total")).head()
    val candidates: Seq[String] = sketchRow.getSeq[String](0)
    val nTotal: Long = sketchRow.getLong(1)
    tok.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > nTotal)
      .select(col("tok"), col("cnt"), lit(nTotal).as("n_total"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** DuckDB oracle for [[heavyHitters]] — the direct definition:
    * GROUP BY with an integer-exact threshold (the sketch only prunes
    * work; it never changes the answer). */
  private[graft] def heavyHittersOracleSql(k: Int = 64): String =
    s"""WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
      n AS (SELECT COUNT(*) AS n_total FROM tok)
      SELECT tok, COUNT(*) AS cnt, (SELECT n_total FROM n) AS n_total
      FROM tok GROUP BY tok
      HAVING COUNT(*) * ${k + 1} > (SELECT n_total FROM n)
      ORDER BY cnt DESC, tok"""

  /** C4/CCNet-style corpus-level boilerplate REMOVAL at chunk
    * granularity (the transform counterpart of q74's duplicate-chunk
    * detection): documents split into fixed `n`-token chunks, a chunk
    * appearing in ≥ `minDocs` DISTINCT documents is boilerplate
    * (headers, footers, navigation, license blurbs), and each
    * document is rewritten with its boilerplate chunks dropped —
    * emitted as chunk counts plus the md5 of the cleaned text.
    *
    * Scale shape: one shuffle builds per-doc chunks (explicit
    * sort-in-group — collect_list has no order guarantee), one
    * map-side-combining hash aggregation computes chunk document
    * frequency, and the boilerplate set flows into the flag join as
    * `xxhash64(ctext)` ONLY — 8 bytes per entry, never the chunk
    * text. The join is a plain shuffle equi-join on the hash: on a
    * web crawl the chunks repeated across ≥ minDocs documents are
    * precisely the nav bars / footers / license blurbs — an enormous
    * set at 100 TB, so a forced driver-side broadcast of full chunk
    * strings is an OOM hazard, while AQE remains free to pick a
    * broadcast of the 8-byte hashes when the set really is small.
    * Reconstruction is a second group-by-doc with the same explicit
    * ordering. */
  def removeBoilerplate(docs: DataFrame, n: Int = 8, minDocs: Int = 3): DataFrame = {
    val tok = PartitionUtil.spread(docs)
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
    val chunks = tok
      .withColumn("cid", expr(s"pos div $n").cast("long"))
      .groupBy(col("doc_id"), col("cid"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("ctext"))
    // df is still counted on the exact chunk text (that aggregation
    // shuffles the chunk stream anyway); only the post-filter survivor
    // set is reduced to its hash for the join back
    val boiler = chunks.groupBy(col("ctext"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(xxhash64(col("ctext")).as("chash")).distinct()
      .withColumn("boiler", lit(true))
    chunks.withColumn("chash", xxhash64(col("ctext")))
      .join(boiler, Seq("chash"), "left")
      .withColumn("boiler", coalesce(col("boiler"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
        // collect_list skips the nulls when() produces for boilerplate
        md5(array_join(transform(array_sort(collect_list(
            when(!col("boiler"), struct(col("cid"), col("ctext"))))),
          x => x.getField("ctext")), " ").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[removeBoilerplate]] — the direct definition
    * with ordered string_agg reconstruction; FILTER drops boilerplate
    * chunks and COALESCE matches Spark's empty-join on fully-removed
    * docs. */
  private[graft] def removeBoilerplateOracleSql(n: Int = 8, minDocs: Int = 3): String =
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      tokr AS (SELECT doc_id, unnest(t) AS tok,
        unnest(range(1, len(t) + 1)) AS i FROM toks WHERE len(t) > 0),
      chunks AS (SELECT doc_id, CAST((i - 1) // $n AS BIGINT) AS cid,
          string_agg(tok, ' ' ORDER BY i) AS ctext
        FROM tokr GROUP BY doc_id, (i - 1) // $n),
      freq AS (SELECT ctext, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY ctext),
      flagged AS (SELECT c.doc_id, c.cid, c.ctext, f.df >= $minDocs AS boiler
        FROM chunks c JOIN freq f USING (ctext))
      SELECT doc_id, COUNT(*) AS n_chunks,
        CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        md5(COALESCE(string_agg(ctext, ' ' ORDER BY cid) FILTER (WHERE NOT boiler), ''))
          AS clean_md5
      FROM flagged GROUP BY doc_id ORDER BY doc_id"""

  /** Per-document fingerprint summary: count + min/max fingerprint.
    * Deterministic, ordered. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), winnowUdf(Dedup.tokens(col("text"))).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy(col("doc_id"))

  /** DuckDB oracle for [[fingerprints]]: the rolling-hash winnowing
    * recomputed exactly in SQL — [[HashSql]] emulates the fnv64/mix64
    * wraparound arithmetic in HUGEINT, the mix stages run as successive
    * list_transform columns, hashes convert to SIGNED BIGINT before the
    * window mins (Scala Long ordering), and the summary aggregates are
    * order-independent, so the result is bit-exact. */
  private[graft] def fingerprintOracleSql(k: Int = 4, window: Int = 4): String = {
    import HashSql._
    s"""WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      g AS (SELECT doc_id, CASE WHEN len(t) >= $k
          THEN list_transform(range(1, len(t) - ${k - 2}),
            i -> array_to_string(list_slice(t, i, i + ${k - 1}), ' '))
          ELSE CAST([] AS VARCHAR[]) END AS grams FROM toks),
      f AS (SELECT doc_id, list_transform(grams, s -> ${fnv64("s")}) AS h FROM g),
      m1 AS (SELECT doc_id, list_transform(h, x -> ${mixStage1("x")}) AS h FROM f),
      m2 AS (SELECT doc_id, list_transform(h, x -> ${mixStage2("x")}) AS h FROM m1),
      m3 AS (SELECT doc_id, list_transform(h, x -> ${mixStage3("x")}) AS h FROM m2),
      m4 AS (SELECT doc_id, list_transform(h, x -> ${toSigned(mixStage4("x"))}) AS h FROM m3),
      mins AS (SELECT doc_id, CASE
          WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
          WHEN len(h) <= $window THEN [list_min(h)]
          ELSE list_transform(range(1, len(h) - ${window - 2}),
            i -> list_min(list_slice(h, i, i + ${window - 1})))
          END AS fps FROM m4)
      SELECT doc_id, CAST(len(list_distinct(fps)) AS BIGINT) AS n_fp,
             list_min(fps) AS min_fp, list_max(fps) AS max_fp
      FROM mins ORDER BY doc_id"""
  }

  /** Intra-document repetition metrics — the Gopher/RefinedWeb
    * repetition filters (Rae et al. 2021 §A1.1; Penedo et al. 2023):
    * templated or looping text (boilerplate, scraped nav, generation
    * artifacts) shows up as a dominant repeated n-gram long before
    * any cross-document signal fires. Integer-exact on the 1e6 grid:
    *
    *   top2_q6 = 1e6 · (count of the most frequent bigram) div n_bigrams
    *   dup3_q6 = 1e6 · (positions in trigram types seen ≥ 2×) div n_trigrams
    *
    * with keep flags r_2g: top2 ≤ 20% and r_3g: dup3 ≤ 60% (the
    * published thresholds for these two statistics). Docs with fewer
    * than 2 (resp. 3) tokens score 0 on the fraction — nothing to
    * repeat.
    *
    * Scale shape: n-grams derive INSIDE each row's token array
    * (slice+zip, codegen'd — no per-doc window) and reduce through
    * (doc, gram) hash aggregations — two linear map-side-combined
    * passes, one doc-keyed join to merge the bigram and trigram
    * summaries, no corpus-wide sort but the output ORDER BY. */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val base = PartitionUtil.spread(docs)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
    val b2 = base.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max2"), sum(col("c")).as("n2"))
    val t3 = base.filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 2),
        slice(col("t"), lit(2), size(col("t")) - 2),
        slice(col("t"), lit(3), size(col("t")) - 2))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup3"),
           sum(col("c")).as("n3"))
    base.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(b2, Seq("doc_id"), "left")
      .join(t3, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(expr("(1000000 * max2) div n2"), lit(0L)).as("top2_q6"),
        coalesce(expr("(1000000 * dup3) div n3"), lit(0L)).as("dup3_q6"))
      .withColumn("r_2g", when(col("top2_q6") <= 200000, 1L).otherwise(0L))
      .withColumn("r_3g", when(col("dup3_q6") <= 600000, 1L).otherwise(0L))
      .withColumn("keep", col("r_2g") * col("r_3g"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[repetitionMetrics]] — grams spelled as
    * space-joined strings (injective: tokens cannot contain the
    * separator), 1-based list indexing. */
  private[graft] def repetitionMetricsOracleSql: String =
    """WITH toks AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      bg AS (SELECT doc_id, t[p] || ' ' || t[p + 1] AS g
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p
              FROM toks WHERE len(t) >= 2)),
      bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      b2 AS (SELECT doc_id, MAX(c) AS max2, SUM(c) AS n2 FROM bc GROUP BY doc_id),
      tg AS (SELECT doc_id, t[p] || ' ' || t[p + 1] || ' ' || t[p + 2] AS g
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS p
              FROM toks WHERE len(t) >= 3)),
      tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
      t3 AS (SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3,
               SUM(c) AS n3 FROM tc GROUP BY doc_id),
      m AS (SELECT k.doc_id, CAST(len(k.t) AS BIGINT) AS n_tokens,
          CAST(COALESCE((1000000 * b2.max2) // b2.n2, 0) AS BIGINT) AS top2_q6,
          CAST(COALESCE((1000000 * t3.dup3) // t3.n3, 0) AS BIGINT) AS dup3_q6
        FROM toks k LEFT JOIN b2 ON b2.doc_id = k.doc_id
                    LEFT JOIN t3 ON t3.doc_id = k.doc_id)
      SELECT doc_id, n_tokens, top2_q6, dup3_q6,
        CAST(CASE WHEN top2_q6 <= 200000 THEN 1 ELSE 0 END AS BIGINT) AS r_2g,
        CAST(CASE WHEN dup3_q6 <= 600000 THEN 1 ELSE 0 END AS BIGINT) AS r_3g,
        CAST(CASE WHEN top2_q6 <= 200000 AND dup3_q6 <= 600000
             THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM m ORDER BY doc_id"""
}
