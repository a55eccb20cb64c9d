package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding vocabulary training — the tokenizer-
  * construction step of an LLM data pipeline (Sennrich et al. 2016's
  * subword-nmt algorithm, re-expressed as the classic two-table Spark
  * formulation): tokenize the corpus ONCE into a (word, freq) table,
  * then run every merge round against that vocab-sized table, never
  * the corpus.
  *
  * Segmentations travel as a single string with every symbol wrapped
  * in U+001F sentinels (`␟s1␟␟s2␟…`): the pair (a, b) is adjacent
  * exactly when the substring `␟a␟␟b␟` occurs, so applying a merge is
  * one literal `replace` — and both the JVM and DuckDB scan
  * left-to-right non-overlapping, which reproduces subword-nmt's
  * greedy-left merge of runs (`[a a a]` + merge (a,a) → `[aa a]`,
  * verified in PipelineSpec). U+001F never occurs in corpus tokens, so
  * a merged symbol can never be confused with a symbol boundary (the
  * naive space-joined encoding breaks exactly there: pattern `a b`
  * matches inside `xa b`).
  *
  * Each round is: (1) adjacent-pair counts weighted by word freq — an
  * in-array zip exploded then map-side combined, vocab-bounded output;
  * (2) argmax pair by (count DESC, left, right) — a ONE-row driver
  * pull (bounded by construction, the same |groups|-scalar discipline
  * as the k-means fits); (3) the merge applied as a narrow per-row
  * `replace` over the word table. The word table is persisted per
  * round and the previous round unpersisted — R actions over a
  * bounded-lineage relation, the [[Graph]] iterative discipline. At
  * 100 TB the corpus-scale work is exactly one tokenize+count pass;
  * every round after touches only the ~10^8-row word table.
  */
object Bpe {

  private[graft] val Sep = "\u001f"

  /** One merge round's pair-count body: adjacent symbol pairs derive
    * INSIDE each word's symbol array (slice + zip, codegen'd — no
    * per-word window), weighted by word frequency and reduced through
    * a map-side-combined (l, r) hash aggregation whose output is
    * bounded by the live pair vocabulary. Exposed for the plan assert
    * in ScaleTechniquesSpec. */
  private[graft] def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(regexp_replace(col("seg"), s"^$Sep|$Sep$$", ""), s"$Sep$Sep")
    words
      .select(col("freq"), syms.as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(arrays_zip(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1))).as("p"))
      .groupBy(col("p.0").as("l"), col("p.1").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** `rounds` BPE merges learned from the corpus's whitespace words.
    * Output: one row per round — (round, left_sym, right_sym, cnt,
    * sym_count), where cnt is the merged pair's weighted frequency at
    * selection time and sym_count the total corpus symbol count AFTER
    * the merge (each merge removes exactly cnt symbols — the invariant
    * the spec asserts). */
  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds > 0, "bpeTrain: rounds must be positive")
    val spark = docs.sparkSession
    val words0 = PartitionUtil.spread(docs)
      .select(explode(Dedup.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seg", regexp_replace(col("word"), "(.)", s"$Sep$$1$Sep"))
      .persist()

    val merges = Seq.newBuilder[(Long, String, String, Long, Long)]
    var words = words0
    var r = 1
    while (r <= rounds) {
      // the argmax merge: ONE row to the driver, bounded by construction
      val best = pairCounts(words).orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).head()
      val (l, rt, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      val next = words.withColumn("seg",
          replace(col("seg"), lit(s"$Sep$l$Sep$Sep$rt$Sep"), lit(s"$Sep$l$rt$Sep")))
        .persist()
      val symCount = next
        .select((col("freq") *
          size(split(regexp_replace(col("seg"), s"^$Sep|$Sep$$", ""), s"$Sep$Sep")))
          .as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      words.unpersist()
      words = next
      merges += ((r.toLong, l, rt, cnt, symCount))
      r += 1
    }
    words.unpersist()

    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("sym_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result().map(Row.fromTuple), 1), schema)
      .orderBy(col("round"))
  }

  /** DuckDB oracle for [[bpeTrain]] over `documents` — the `rounds`
    * merge rounds UNROLLED as materialized CTE stages (the same
    * inlining discipline as the k-core oracle: without MATERIALIZED
    * each round's relation would be re-expanded 3^rounds times). The
    * segmentation encoding is built with list functions rather than
    * the engine's regexp — an independent formulation of the same
    * wrapping. */
  private[graft] def bpeTrainOracleSql(rounds: Int): String = {
    val S = "chr(31)"
    def symsOf(seg: String) = s"string_split(trim($seg, $S), $S || $S)"
    val stages = new StringBuilder
    stages.append(s"""WITH w AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM
        (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
         FROM documents) GROUP BY word),
      s0 AS MATERIALIZED (SELECT freq,
        array_to_string(list_transform(string_split(word, ''), c -> $S || c || $S), '') AS seg
        FROM w)""")
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      stages.append(s""",
      p$r AS MATERIALIZED (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM
        (SELECT freq, syms[p] AS l, syms[p + 1] AS r FROM
          (SELECT freq, syms, unnest(range(1, len(syms))) AS p FROM
            (SELECT freq, ${symsOf("seg")} AS syms FROM $prev)
           WHERE len(syms) >= 2))
        GROUP BY l, r),
      b$r AS MATERIALIZED (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
      s$r AS MATERIALIZED (SELECT freq,
        replace(seg, $S || b.l || $S || $S || b.r || $S, $S || b.l || b.r || $S) AS seg
        FROM $prev, b$r b),
      c$r AS (SELECT CAST(SUM(freq * len(${symsOf("seg")})) AS BIGINT) AS sym_count
        FROM s$r)""")
    }
    val union = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, l AS left_sym, r AS right_sym, cnt,
        (SELECT sym_count FROM c$r) AS sym_count FROM b$r"""
    }.mkString("\n      UNION ALL\n      ")
    stages.append(s"""
      $union
      ORDER BY round""").toString
  }
}
