package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ContentHashExpression, SaltedHashExpression}

/** Trained document-quality classifier — the fastText-style quality
  * filter every production LLM data pipeline runs (CCNet, GPT-3,
  * LLaMA all gate web text on a linear classifier over cheap lexical
  * features; the reference has rule filters but nothing trained).
  *
  * Model: logistic regression over feature-HASHED unigram presence
  * (`nFeatures` buckets of mix64∘fnv64, the countMin/vocab hashing
  * family) plus two engineered integer-derived features — token count
  * and distinct-token count, each scaled by 1/100 — and a bias.
  * Labels are a deterministic weak rule (distilling rules into a
  * classifier is exactly how production quality filters are
  * bootstrapped): a document is "good" when it has ≥ `minToks` tokens
  * AND type-token ratio ≥ 1/3 (3·distinct ≥ total — integer
  * cross-multiplication, so the rule is exact in any engine).
  *
  * Scale shape: the FIT is corpus-size-free — a deterministic
  * hash-ordered sample of ≤ `maxFitSample` featurized docs is
  * collected once (the q46/q151 quantizer-fit pattern) and full-batch
  * gradient descent runs driver-side on a `nFeatures+3`-dim problem;
  * SCORING is one corpus scan with zero shuffles and zero UDFs — the
  * margin is a codegen'd `aggregate` over the doc's hashed feature
  * array against a literal weight array (presentation ORDER BY
  * belongs to the consuming query).
  *
  * Cross-engine exactness: scores are GRID INTEGERS. Per-bucket
  * weights are inlined as `floor(w·10⁴)` BIGINTs (no doubles cross
  * the engine boundary at all), and the two engineered terms are
  * `floor(w · (count/100.0) · 10⁴)` — each a fixed left-associated
  * chain of correctly-rounded IEEE ops on a round-tripping literal,
  * so Spark and DuckDB agree bit-for-bit; the BIGINT sum is
  * order-independent. `pred` is the sign of the gridded margin.
  */
object QualityClassifier {

  /** Fitted model. `wGrid(f)` = floor(w_f·10⁴) for hashed bucket f;
    * the engineered weights (token count, distinct count, type-token
    * margin `3·distinct−total`, each scaled 1/100) stay doubles —
    * their contributions are gridded at scoring time, see class doc.
    * `trace` is the per-iteration mean log-loss (monotonicity
    * asserted in spec). */
  final case class Model(wGrid: Array[Long], wLen: Double, wDist: Double,
                         wRatio: Double, bias: Double, nFeatures: Int,
                         minToks: Int, trace: Array[Double], accuracy: Double)

  val DefaultMinToks = 35

  private def toksCol(text: Column): Column = Dedup.tokens(text)

  /** The weak label rule on precomputed counts — the ONE definition
    * both engines derive from: [[featurized]] applies it to the
    * n_toks/n_dist columns; [[labelSqlExpr]] is its SQL twin. */
  private def labelFromCounts(nToks: Column, nDist: Column, minToks: Int): Column =
    when(nToks >= minToks && nDist * 3 >= nToks, 1L).otherwise(0L)

  private[graft] def labelSqlExpr(minToks: Int, nt: String, nd: String): String =
    s"CASE WHEN $nt >= $minToks AND 3 * $nd >= $nt THEN 1 ELSE 0 END"

  // feature bucket = pmod of the native content hash into a
  // power-of-two bucket count — unsigned `%` parity with DuckDB
  // relies on the power of two, exactly like countMin's width.

  /** Featurize: doc_id, feats (distinct buckets), n_toks, n_dist, y.
    * Tokenizes once into an intermediate column; everything else is
    * arithmetic over it. */
  private def featurized(docs: DataFrame, nFeatures: Int, minToks: Int): DataFrame = {
    ContentHashExpression.register(docs.sparkSession)
    docs.select(col("doc_id"), toksCol(col("text")).as("tk"))
      .select(col("doc_id"),
        array_distinct(transform(col("tk"),
          t => pmod(ContentHashExpression.contentHash64(t), lit(nFeatures.toLong))
            .cast("int"))).as("feats"),
        size(col("tk")).cast("long").as("n_toks"),
        size(array_distinct(col("tk"))).cast("long").as("n_dist"))
      .withColumn("label", labelFromCounts(col("n_toks"), col("n_dist"), minToks))
  }

  /** Fit results memoized per input-path set: the fit is
    * bit-deterministic, and q159 needs the same model on the query
    * side, the Verify-time oracle, Bench's three passes, and the
    * plan audit — refitting each time would repeat a corpus featurize
    * plus the full driver GD. DEFAULT hyperparameters only (the key
    * is the docs plan's input files; empty for non-file relations →
    * no caching). Deliberately signature-free: if an overload taking
    * hyperparameters is ever added, the hyperparameters MUST fold
    * into the cache key, or callers would silently receive the
    * default-hyperparameter model. Rewriting the same paths within
    * one JVM also serves the memoized model — call [[fit]] directly
    * when the files may have changed. */
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[String, Model]

  def fitCached(docs: DataFrame): Model = {
    val key = docs.inputFiles.sorted.mkString(",")
    if (key.isEmpty) fit(docs)
    else fitCache.getOrElseUpdate(key, fit(docs))
  }

  // StrictMath, not math: HotSpot may swap math.exp/log between the
  // fdlibm path and a C2 intrinsic mid-run, so two fits (query-side
  // vs Verify-time oracle inlining, or across JVMs) could diverge by
  // ulps and compound over the iterations — StrictMath pins the exact
  // fdlibm bits everywhere, which is what the inlined-oracle
  // determinism contract needs.
  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + StrictMath.exp(-z))
    else { val e = StrictMath.exp(z); e / (1.0 + e) }

  /** Fit by full-batch ADAGRAD (per-coordinate adaptive steps — plain
    * fixed-step GD oscillates here because the near-constant presence
    * features make the problem ill-conditioned; Adagrad's
    * accumulated-curvature scaling converges monotonically) on a
    * deterministic hash-ordered sample (≤ maxFitSample docs).
    * Bit-deterministic: the sample order is a total order (salted
    * doc-id hash, then doc_id) and all loops run in array order, so
    * refitting on the same data reproduces the exact same weights —
    * the property the Verify-time inlined oracle relies on.
    *
    * `maxFitSample` defaults low (8 Ki docs): a 259-parameter linear
    * model saturates long before that, and the fit stays
    * corpus-size-free — at 100 TB the classifier trains on this
    * bounded sample and only SCORING touches the corpus. */
  def fit(docs: DataFrame, nFeatures: Int = 256, iters: Int = 1500,
          lr: Double = 1.0, l2: Double = 1e-4, minToks: Int = DefaultMinToks,
          maxFitSample: Int = 8192): Model = {
    require(nFeatures > 0 && (nFeatures & (nFeatures - 1)) == 0,
      "qualityClassifier: nFeatures must be a power of two (cross-engine " +
        "bucket parity relies on low-bit masking semantics)")
    SaltedHashExpression.register(docs.sparkSession)
    val sample = featurized(docs, nFeatures, minToks)
      .orderBy(SaltedHashExpression.saltedHash64(col("doc_id"), lit(97L)),
        col("doc_id"))
      .limit(maxFitSample)
      .select(col("feats"), col("n_toks"), col("n_dist"), col("label"))
      .collect()
      .map(r => (r.getSeq[Int](0).toArray, r.getLong(1).toInt,
        r.getLong(2).toInt, r.getLong(3).toInt))
    require(sample.nonEmpty, "qualityClassifier: no documents to fit on")
    val n = sample.length
    val nw = nFeatures + 4 // hashed ++ (len, dist, ratio) ++ bias
    val w = new Array[Double](nw)
    val acc2 = new Array[Double](nw) // adagrad squared-gradient sums
    val trace = new Array[Double](iters)
    def x3(nt: Int, nd: Int): (Double, Double, Double) =
      (nt / 100.0, nd / 100.0, (3 * nd - nt) / 100.0)
    var it = 0
    while (it < iters) {
      val g = new Array[Double](nw)
      var loss = 0.0
      var i = 0
      while (i < n) {
        val (fs, nt, nd, y) = sample(i)
        val (xl, xd, xr) = x3(nt, nd)
        var m = w(nw - 1) + w(nFeatures) * xl + w(nFeatures + 1) * xd +
          w(nFeatures + 2) * xr
        var j = 0
        while (j < fs.length) { m += w(fs(j)); j += 1 }
        val p = sigmoid(m)
        loss += (if (y == 1) -StrictMath.log(math.max(p, 1e-15))
                 else -StrictMath.log(math.max(1.0 - p, 1e-15)))
        val err = p - y
        j = 0
        while (j < fs.length) { g(fs(j)) += err; j += 1 }
        g(nFeatures) += err * xl; g(nFeatures + 1) += err * xd
        g(nFeatures + 2) += err * xr; g(nw - 1) += err
        i += 1
      }
      var f = 0
      while (f < nw) {
        var gf = g(f) / n
        if (f < nw - 1) gf += l2 * w(f) // no penalty on the bias
        acc2(f) += gf * gf
        w(f) -= lr * gf / (math.sqrt(acc2(f)) + 1e-8)
        f += 1
      }
      trace(it) = loss / n
      it += 1
    }
    // training accuracy at the GRIDDED decision rule (the one scoring
    // and the oracle apply), not the raw-double rule
    val wg = java.util.Arrays.copyOf(w, nFeatures)
      .map(x => math.floor(x * 10000.0).toLong)
    val (wLen, wDist, wRatio, b) =
      (w(nFeatures), w(nFeatures + 1), w(nFeatures + 2), w(nw - 1))
    var correct = 0
    sample.foreach { case (fs, nt, nd, y) =>
      var mg = math.floor(b * 10000.0).toLong +
        math.floor(wLen * (nt / 100.0) * 10000.0).toLong +
        math.floor(wDist * (nd / 100.0) * 10000.0).toLong +
        math.floor(wRatio * ((3 * nd - nt) / 100.0) * 10000.0).toLong
      fs.foreach(f => mg += wg(f))
      if ((if (mg > 0L) 1 else 0) == y) correct += 1
    }
    Model(wg, wLen, wDist, wRatio, b, nFeatures, minToks, trace,
      correct.toDouble / n)
  }

  /** Gridded margin terms shared by [[score]] and the spec. */
  private def gridTerm(weight: Double, cnt: Column): Column =
    floor(lit(weight) * (cnt.cast("double") / lit(100.0)) * lit(10000.0))
      .cast("long")

  /** Unsorted scoring core: ONE scan, margin via codegen'd aggregate
    * over the literal weight array — no join, no shuffle, no UDF, and
    * STATELESS per row, so the same plan runs unchanged over a
    * stream (see [[graft.streaming.EventStreams.streamingQualityScore]]). */
  def scoreUnsorted(docs: DataFrame, model: Model): DataFrame = {
    val f = featurized(docs, model.nFeatures, model.minToks)
    val wLit = typedLit(model.wGrid.toSeq)
    val mg = aggregate(col("feats"), lit(0L),
      (acc, fi) => acc + element_at(wLit, fi + 1)) +
      gridTerm(model.wLen, col("n_toks")) +
      gridTerm(model.wDist, col("n_dist")) +
      gridTerm(model.wRatio, col("n_dist") * 3 - col("n_toks")) +
      lit(math.floor(model.bias * 10000.0).toLong)
    f.select(col("doc_id"), col("n_toks"), col("n_dist"), col("label"),
      mg.as("margin_grid"),
      when(mg > 0L, 1L).otherwise(0L).as("pred"))
  }

  /** Score every document, presented in doc_id order (the gate shape). */
  def score(docs: DataFrame, model: Model): DataFrame =
    scoreUnsorted(docs, model).orderBy(col("doc_id"))

  /** Persist a fitted [[Model]] as a one-row parquet — the model
    * artifact a production pipeline trains once and ships to every
    * scoring job (the q167 build-once/serve-many split applied to the
    * classifier). Grid weights are exact longs and the engineered
    * weights are doubles, both of which parquet round-trips
    * bit-for-bit, so scoring from a reloaded model is bit-identical
    * to scoring from the fresh fit (q171 gates this). */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                 path: String): Unit = {
    import spark.implicits._
    Seq((model.wGrid.toSeq, model.wLen, model.wDist, model.wRatio, model.bias,
        model.nFeatures, model.minToks, model.trace.toSeq, model.accuracy))
      .toDF("w_grid", "w_len", "w_dist", "w_ratio", "bias",
        "n_features", "min_toks", "trace", "accuracy")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[writeModel]] artifact, VALIDATED: a stale, truncated,
    * or foreign parquet (missing column, extra rows, weight vector
    * shorter than n_features, non-power-of-two n_features) fails
    * loudly here instead of scoring garbage downstream — the schema
    * guard a shipped artifact needs because the scoring job has no
    * other way to know the file it was handed is really a model. */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val required = Seq("w_grid", "w_len", "w_dist", "w_ratio", "bias",
      "n_features", "min_toks", "trace", "accuracy")
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"qualityClassifier model artifact at $path is missing column(s) " +
        s"${missing.mkString(", ")} — not a writeModel output " +
        s"(found: ${df.columns.mkString(", ")})")
    val rows = df
      .select(required.map(col): _*)
      .as[(Seq[Long], Double, Double, Double, Double, Int, Int, Seq[Double], Double)]
      .take(2)
    require(rows.length == 1,
      s"qualityClassifier model artifact at $path has ${rows.length} rows " +
        "(expected exactly 1) — truncated or not a writeModel output")
    val r = rows.head
    require(r._1 != null,
      s"qualityClassifier model artifact at $path: null weight vector " +
        "(w_grid) — corrupt or foreign artifact")
    require(r._6 > 0 && (r._6 & (r._6 - 1)) == 0,
      s"qualityClassifier model artifact at $path: n_features ${r._6} " +
        "must be a positive power of two")
    require(r._1.length == r._6,
      s"qualityClassifier model artifact at $path: weight vector has " +
        s"${r._1.length} entries but n_features is ${r._6} — truncated " +
        "or mismatched artifact")
    Model(r._1.toArray, r._2, r._3, r._4, r._5, r._6, r._7,
      Option(r._8).map(_.toArray).getOrElse(Array.empty), r._9)
  }

  /** Pure per-row scoring core — the row twin of [[scoreUnsorted]]'s
    * column arithmetic (same tokenization, same mix64∘fnv64 bucket
    * as `content_hash64`, same left-associated grid chain the fit's
    * accuracy loop runs), for call sites that score one document at
    * a time outside a DataFrame plan — the streaming curation
    * flatMap ([[graft.streaming.EventStreams.streamingCuration]]).
    * Row-for-row equality with the column path is asserted in
    * StreamingSpec. Returns (n_toks, n_dist, label, margin_grid,
    * pred). */
  def scoreRow(text: String, model: Model): (Long, Long, Long, Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nt = toks.length.toLong
    val nd = toks.distinct.length.toLong
    val label = if (nt >= model.minToks && 3 * nd >= nt) 1L else 0L
    var mg = math.floor(model.bias * 10000.0).toLong +
      math.floor(model.wLen * (nt / 100.0) * 10000.0).toLong +
      math.floor(model.wDist * (nd / 100.0) * 10000.0).toLong +
      math.floor(model.wRatio * ((3 * nd - nt) / 100.0) * 10000.0).toLong
    toks.map(t => java.lang.Math.floorMod(
        Dedup.mix64(Dedup.fnv64(t)), model.nFeatures.toLong).toInt)
      .distinct.foreach(f => mg += model.wGrid(f))
    (nt, nd, label, mg, if (mg > 0L) 1L else 0L)
  }

  /** Measured classifier quality INSIDE the hash gate (the q152/q153
    * audit pattern applied to the classifier): the (pred, label)
    * confusion counts as exact BIGINTs — accuracy, precision, recall
    * are all derivable, and a wrong-but-deterministic model can no
    * longer ride the gate unnoticed. One aggregation over the
    * shuffle-free scoring scan; output is ≤ 4 rows. */
  def confusion(docs: DataFrame, model: Model): DataFrame =
    scoreUnsorted(docs, model)
      .groupBy(col("pred"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pred"), col("label"))

  /** DuckDB replay of [[confusion]] — [[oracleSql]]'s scoring CTEs
    * reduced to the (pred, label) counts. */
  def confusionOracleSql(model: Model): String = {
    val scored = oracleSql(model)
    // reuse the full scoring replay as a subquery; it ends in an
    // ORDER BY that DuckDB allows inside a FROM (...) subselect
    s"""SELECT pred, label, COUNT(*) AS n FROM ($scored) s
      GROUP BY pred, label ORDER BY pred, label"""
  }

  /** DuckDB replay with the fitted weights inlined (the q46/q93
    * Verify-time dataOracle pattern): same tokenization, same
    * mix64∘fnv64 bucket, same BIGINT grid arithmetic. Distinct tokens
    * are hashed ONCE and joined back (the countMin staging trick);
    * docs with zero matching buckets keep a row via LEFT JOIN. */
  def oracleSql(model: Model): String = {
    import HashSql._
    val wRows = model.wGrid.zipWithIndex
      .map { case (wg, f) => s"($f, $wg)" }.mkString(", ")
    val bGrid = math.floor(model.bias * 10000.0).toLong
    // engineered weights render through the Similarity.dlit E-notation
    // pattern: a bare decimal literal parses as DECIMAL in DuckDB and
    // the widening DECIMAL→DOUBLE conversion is not correctly rounded
    // for ~0.4% of shortest-repr doubles — an exponent forces DOUBLE
    // parsing, which round-trips Java's shortest repr bit-for-bit
    val (wLenL, wDistL, wRatioL) = (Similarity.dlit(model.wLen),
      Similarity.dlit(model.wDist), Similarity.dlit(model.wRatio))
    s"""WITH n AS (SELECT doc_id,
        len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks,
        len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_dist
        FROM documents),
      toks AS (SELECT doc_id,
          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents),
      ut AS (SELECT DISTINCT tok FROM toks),
      f0 AS MATERIALIZED (SELECT tok, ${fnv64("tok")} AS h FROM ut),
      f1 AS (SELECT tok, ${mixStage1("h")} AS h FROM f0),
      f2 AS (SELECT tok, ${mixStage2("h")} AS h FROM f1),
      f3 AS (SELECT tok, ${mixStage3("h")} AS h FROM f2),
      tb AS MATERIALIZED (SELECT tok,
          CAST(${mixStage4("h")} % ${model.nFeatures} AS BIGINT) AS f FROM f3),
      feats AS (SELECT DISTINCT t.doc_id, tb.f FROM toks t JOIN tb USING (tok)),
      w(f, wg) AS (SELECT * FROM (VALUES $wRows) v(f, wg)),
      m AS (SELECT doc_id, SUM(wg) AS mg FROM feats JOIN w USING (f) GROUP BY doc_id),
      scored AS (SELECT n.doc_id,
          CAST(n.n_toks AS BIGINT) AS n_toks, CAST(n.n_dist AS BIGINT) AS n_dist,
          CAST(${labelSqlExpr(model.minToks, "n.n_toks", "n.n_dist")} AS BIGINT) AS label,
          CAST(COALESCE(m.mg, 0) AS BIGINT) +
            CAST(FLOOR($wLenL * (n.n_toks / 100.0) * 10000.0) AS BIGINT) +
            CAST(FLOOR($wDistL * (n.n_dist / 100.0) * 10000.0) AS BIGINT) +
            CAST(FLOOR($wRatioL * ((3 * n.n_dist - n.n_toks) / 100.0) * 10000.0) AS BIGINT) +
            $bGrid AS margin_grid
        FROM n LEFT JOIN m USING (doc_id))
      SELECT doc_id, n_toks, n_dist, label, margin_grid,
        CAST(CASE WHEN margin_grid > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
      FROM scored ORDER BY doc_id"""
  }
}
