package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training corpora.
  *
  * All sampling here is content-hash bucketing, not RNG: a row is in
  * or out based on `md5(content) % 100`, so samples are reproducible
  * across runs, engines, partitionings and cluster sizes, and a
  * re-run after appending data keeps every previously-selected row
  * (the property train/val/test splits need — `rand()` has none of
  * these). Same convention as the q57 split.
  */
object Sampling {

  /** Hash bucket in [0, 100) from the row's content column. */
  def hashBucket(content: Column): Column =
    pmod(conv(substring(md5(content.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(100L))

  /** Stratified deterministic sample: per-stratum percentage rates
    * (0..100), `defaultRate` for strata not in `rates`. Pure filter —
    * no shuffle, no RNG, fully pushdown-friendly: at 100 TB this is a
    * scan with a cheap predicate, nothing more. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, contentCol: Column,
                           rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(contentCol))
      .filter(col("bucket") < rate)
  }

  /** Temperature-weighted mixture allocation (the multilingual-LM
    * α-sampling rebalance, α = 0.5): a token `budget` is split across
    * sources ∝ n_tokens^α, so low-resource sources are upweighted
    * relative to their raw share, capped at what each source actually
    * has. Integer-exact across engines: the only floating step is
    * sqrt (IEEE-required correct rounding), quantized to a 1e6 grid
    * BIGINT weight before the ratio — the budget·w/Σw arithmetic is
    * all integral, so the allocation is bit-identical anywhere.
    *
    * Scale shape: one map-side-combining aggregation to |sources|
    * rows; the global-total window runs on that constant-size result,
    * never on the corpus. */
  def mixtureAllocation(docs: DataFrame, budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("source"), size(Dedup.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("w_q", floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0)).cast("long"))
    counts
      .withColumn("total_w", sum(col("w_q")).over(Window.partitionBy()))
      // integral `div` throughout: budget·w_q can exceed 2^53, where a
      // double division would drift off the exact quotient
      .withColumn("alloc_tokens",
        least(col("n_tokens"), expr(s"(${budget}L * w_q) div total_w")))
      .select(col("source"), col("n_tokens"), col("w_q"), col("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Deterministic corpus shuffle + sharding — the layout step before
    * training ingestion: every document gets a shard (content-hash
    * modulo) and a position within its shard (ordered by hash, then
    * doc_id). The "shuffle" is a pure function of content: identical
    * across runs, partitionings, and engines, and adding documents
    * never reorders existing shards' relative hash order. No global
    * sort or single-partition window — the only shuffle is the
    * per-shard hash partition, so it scales to any corpus. */
  def corpusShards(docs: DataFrame, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = docHash(docs, col("text"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    // no output ordering here: a consumer writing shards wants the
    // per-shard partitioning as-is (the oracle-facing query adds its
    // own presentation ORDER BY)
    PartitionUtil.spread(docs)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Leakage-safe train/val/test split: assignment is by near-dup
    * GROUP, not by document — every member of a connected near-dup
    * component lands in the SAME split, so a benchmark document's
    * near-duplicate can never leak from train into val/test (the
    * failure mode a per-document hash split — q57 — cannot prevent).
    *
    * The bucket hashes the group REPRESENTATIVE's text (content-
    * defined, like every split here): stable across runs/engines and,
    * because the rep is the group's min id, stable under appends that
    * join an existing group.
    *
    * Scale shape: the pair graph and CC labels are the dedup
    * pipeline's own artifacts (reused, not recomputed, when both
    * steps run); on top of them this is two linear hash joins — docs
    * ⋈ labels on id (unpaired docs keep themselves as rep via the
    * left join + coalesce) and rep → rep-text — then a pure per-row
    * bucket projection. No window, no global sort. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = Dedup.dedupGroups(pairs) // (id, rep), paired ids only
    val withRep = docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col("doc_id")))
    val repText = docs.select(col("doc_id").as("rep"), col("text").as("rep_text"))
    withRep.join(repText, Seq("rep"))
      .withColumn("bucket", hashBucket(col("rep_text")))
      .select(col("doc_id"), col("rep"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
  }

  /** DuckDB oracle for [[leakageSafeSplit]] over
    * [[Dedup.minhashLshPairs]] candidates: mirrored MinHash pair SQL →
    * recursive-CTE component fixpoint → same md5 bucket of the rep's
    * text. */
  private[graft] def leakageSafeSplitOracleSql(shingleN: Int, numHashes: Int,
                                               bands: Int): String = {
    val pairsBody = Dedup.minhashLshOracleSqlBody(shingleN, numHashes, bands)
    s"""WITH RECURSIVE
    pairs AS ($pairsBody),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
    reps AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
    alldocs AS (SELECT d.doc_id, COALESCE(reps.rep, d.doc_id) AS rep
      FROM documents d LEFT JOIN reps ON reps.id = d.doc_id),
    b AS (SELECT a.doc_id, a.rep,
        CAST(concat('0x', substr(md5(rd.text), 1, 8)) AS UBIGINT) % 100 AS bucket
      FROM alldocs a JOIN documents rd ON rd.doc_id = a.rep)
    SELECT doc_id, rep,
      CASE WHEN bucket < 80 THEN 'train'
           WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
    FROM b ORDER BY doc_id"""
  }

  /** mix64(fnv64(text)) — the engine's standard content hash (same
    * fold the fingerprint/minhash/CDC paths use; mirrored bit-exactly
    * in SQL by [[HashSql]]), as the NATIVE codegen'd expression
    * `content_hash64` — no Scala-closure UDF boundary in the
    * scan → hash → shuffle hot path. Registration is idempotent. */
  private def docHash(df: DataFrame, c: Column): Column = {
    graft.functions.ContentHashExpression.register(df.sparkSession)
    graft.functions.ContentHashExpression.contentHash64(c)
  }

  /** 2-D skyline (Pareto frontier), both dimensions MAXIMIZED: rows
    * not dominated by any other row (dominance = >= on both integer
    * dims, > on at least one; rows tied on BOTH dims are mutually
    * non-dominating and all kept). Data-curation use: "best quality at
    * every size" corpus selection under a token budget.
    *
    * Shape: one aggregation per distinct `xCol` level (max y + the
    * level itself), a strict-prefix running max over those levels in
    * descending x order — the only single-reducer step, bounded by
    * |distinct x| (use an integer quality GRID, not a raw float, to
    * keep it constant at corpus scale) — then the surviving levels
    * broadcast back to filter the corpus in one scan. Never the
    * quadratic all-pairs dominance join. */
  def skyline(df: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__mx"))
    val pm = byX.withColumn("__pm",
      max(col("__mx")).over(Window.orderBy(col(xCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    val lvls = pm.filter(col("__mx") > coalesce(col("__pm"), lit(Long.MinValue)))
      .select(col(xCol), col("__mx"))
    df.join(broadcast(lvls), Seq(xCol))
      .filter(col(yCol) === col("__mx"))
      .select(col(idCol), col(xCol), col(yCol))
  }

  /** Temperature-balanced mixture sampling across groups — the
    * data-MIXING step of a multilingual / multi-source training run
    * (the α-smoothed multinomial of Conneau & Lample 2019): each
    * group's sampling weight is count^α with α = 1/2, so dominant
    * groups are down-weighted and rare groups over-represented
    * relative to their share. Exactly integer-replayable: the weight
    * is floor(sqrt(count)) — IEEE sqrt is correctly rounded and the
    * counts sit far below 2^52, so floor∘sqrt is bit-identical in
    * every engine — and each group's quota is `budget·w div Σw`.
    * WITHIN a group the quota picks the lowest (content-hash, id)
    * rows: deterministic, reproducible, append-stable (the corpus
    * sampling convention here — no RNG anywhere).
    *
    * Scale shape: one count aggregation (|groups| rows, broadcast
    * back), then BOUNDED per-group selection via
    * [[PartitionUtil.saltedTopK]] — the map-side-combining k-smallest
    * aggregator with cap = max quota (≤ budget), so no task ever sorts
    * or buffers a whole group. The per-group rank-window formulation
    * ([[temperatureMixtureViaWindow]]) would put EVERY row of a group
    * on one task — for a low-cardinality key like language that is a
    * multi-TB single-task sort at corpus scale, a straggler by
    * construction; here the hot group's rows pre-select across salt
    * buckets and shuffle volume is O(quota · buckets) per group.
    * Output is ≤ budget rows at any corpus size. */
  def temperatureMixture(docs: DataFrame, groupCol: String,
                         budget: Long): DataFrame = {
    require(budget > 0, "temperatureMixture: budget must be positive")
    val quota = mixtureQuotas(docs, groupCol, budget)
    // the buffer cap: the LARGEST group quota — bounded by budget and
    // read from the |groups|-row quota relation, not the corpus
    val maxQuota = Option(quota.agg(max(col("quota"))).head().get(0))
      .fold(0L)(_.asInstanceOf[Long])
    val hashed = docs.select(col("doc_id"), col(groupCol),
      docHash(docs, col("text")).as("h"))
    if (maxQuota <= 0L)
      return hashed
        .select(col("doc_id"), col(groupCol), lit(0L).as("pos"), lit(0L).as("quota"))
        .limit(0)
    // the aggregator's buffer cap is an Int; a quota past 2^31 would
    // silently truncate the selection, so fail LOUDLY instead (a
    // 2-billion-row single-group sample is a mis-set budget anyway)
    require(maxQuota <= Int.MaxValue.toLong,
      s"temperatureMixture: per-group quota $maxQuota exceeds the Int buffer cap")
    val ranked = PartitionUtil.saltedTopK(hashed, groupCol,
      k = maxQuota.toInt, ordCol = "h", idCol = "doc_id")
    ranked.join(broadcast(quota), Seq(groupCol))
      .filter(col("pos") <= col("quota"))
      .select(col("doc_id"), col(groupCol), col("pos"), col("quota"))
      .orderBy(col("doc_id"))
  }

  /** The α=½ quota relation shared by both mixture formulations:
    * (group, quota) with quota = budget·⌊√count⌋ div Σ⌊√count⌋. */
  private def mixtureQuotas(docs: DataFrame, groupCol: String,
                            budget: Long): DataFrame = {
    val wts = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("c"))
      .select(col(groupCol),
        floor(sqrt(col("c").cast("double"))).cast("long").as("wt"))
    // Σw: one row pulled to the driver — bounded by |groups|, not corpus
    val totW = wts.agg(sum(col("wt"))).head().getLong(0)
    wts.select(col(groupCol), expr(s"($budget * wt) div $totW").as("quota"))
  }

  /** The rank-window formulation of [[temperatureMixture]] — row-for-
    * row identical output, kept ONLY as the straggler comparison
    * baseline for ScaleProbe and the equality spec: `row_number() OVER
    * (PARTITION BY group)` ranks the ENTIRE corpus with one task per
    * group, the exact shape the bounded TopK replaces. Never call this
    * from a query. */
  private[graft] def temperatureMixtureViaWindow(docs: DataFrame, groupCol: String,
                                                 budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "temperatureMixture: budget must be positive")
    val quota = mixtureQuotas(docs, groupCol, budget)
    docs.select(col("doc_id"), col(groupCol),
        docHash(docs, col("text")).as("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("h"), col("doc_id"))))
      .join(broadcast(quota), Seq(groupCol))
      .filter(col("pos") <= col("quota"))
      .select(col("doc_id"), col(groupCol), col("pos").cast("long").as("pos"),
        col("quota"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[temperatureMixture]] over `documents`
    * grouped by `lang` — same isqrt weights, integer quota, and
    * (mix64∘fnv64 content hash, doc_id) rank via the HashSql mirror. */
  private[graft] def temperatureMixtureOracleSql(budget: Long): String = {
    import HashSql._
    s"""WITH f AS (SELECT doc_id, lang, ${fnv64("text")} AS h FROM documents),
      m1 AS (SELECT doc_id, lang, ${mixStage1("h")} AS h FROM f),
      m2 AS (SELECT doc_id, lang, ${mixStage2("h")} AS h FROM m1),
      m3 AS (SELECT doc_id, lang, ${mixStage3("h")} AS h FROM m2),
      sgn AS (SELECT doc_id, lang, ${toSigned(mixStage4("h"))} AS h FROM m3),
      counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
      wts AS (SELECT lang, CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) AS wt
        FROM counts),
      tot AS (SELECT SUM(wt) AS t FROM wts),
      quota AS (SELECT lang, CAST(($budget * wt) // (SELECT t FROM tot) AS BIGINT)
        AS quota FROM wts),
      ranked AS (SELECT doc_id, lang,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS pos
        FROM sgn)
      SELECT r.doc_id, r.lang, CAST(r.pos AS BIGINT) AS pos, q.quota
      FROM ranked r JOIN quota q ON q.lang = r.lang
      WHERE r.pos <= q.quota ORDER BY r.doc_id"""
  }

  /** Per-domain caps with a blocklist — the RefinedWeb/C4-style
    * domain curation step: drop every document from a blocklisted
    * domain, then keep AT MOST `cap` documents per surviving domain so
    * no single crawl host dominates the mixture. Within a domain the
    * survivors are the lowest (content-hash, doc_id) rows — the same
    * deterministic, append-stable convention as [[temperatureMixture]]
    * (no RNG; a re-crawl that appends documents keeps every previously
    * selected row whose hash rank still clears the cap).
    *
    * Scale shape: the blocklist is a RELATION, not a literal `isin`
    * list — production blocklists run to millions of hosts and arrive
    * as data. It joins as a LEFT ANTI join (hinted broadcast: even a
    * 10M-row hostname list is ~100 MB, far under executor memory; drop
    * the hint and the same plan degrades gracefully to a shuffled anti
    * join). The cap is enforced by [[PartitionUtil.saltedTopK]], never
    * a rank window: a hot domain (a crawl is OFTEN 90% one host)
    * pre-selects its cap-sized survivor set across salt buckets
    * map-side, so shuffle volume is O(cap · buckets) per domain and no
    * task ever sorts a whole domain's rows. */
  def sourceCaps(docs: DataFrame, domainCol: String, blocklist: DataFrame,
                 cap: Int): DataFrame = {
    require(cap > 0, "sourceCaps: cap must be positive")
    val kept = docs.join(broadcast(blocklist), Seq(domainCol), "left_anti")
    val hashed = kept.select(col("doc_id"), col(domainCol),
      docHash(docs, col("text")).as("h"))
    PartitionUtil.saltedTopK(hashed, domainCol, k = cap,
        ordCol = "h", idCol = "doc_id")
      .select(col("doc_id"), col(domainCol), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[sourceCaps]] over `documents` grouped by
    * `source` — the blocklist inlined as VALUES, the content-hash rank
    * replayed via the [[HashSql]] mirror, the cap as a rank filter
    * (the oracle may use the rank window the engine deliberately
    * avoids — it only has to be CORRECT, not scale). */
  private[graft] def sourceCapsOracleSql(blocked: Seq[String], cap: Int): String = {
    import HashSql._
    val bl = blocked.map(s => s"('$s')").mkString(", ")
    s"""WITH bl(source) AS (VALUES $bl),
      kept AS (SELECT d.doc_id, d.source, d.text FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bl.source = d.source)),
      f AS (SELECT doc_id, source, ${fnv64("text")} AS h FROM kept),
      m1 AS (SELECT doc_id, source, ${mixStage1("h")} AS h FROM f),
      m2 AS (SELECT doc_id, source, ${mixStage2("h")} AS h FROM m1),
      m3 AS (SELECT doc_id, source, ${mixStage3("h")} AS h FROM m2),
      sgn AS (SELECT doc_id, source, ${toSigned(mixStage4("h"))} AS h FROM m3),
      ranked AS (SELECT doc_id, source,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS pos
        FROM sgn)
      SELECT doc_id, source, CAST(pos AS BIGINT) AS pos
      FROM ranked WHERE pos <= $cap ORDER BY doc_id"""
  }
}
