package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot management: content-level diff between two crawls /
  * ingests of the same id space. A continuously refreshed training
  * corpus needs the delta feed (what appeared, vanished, or changed)
  * to drive incremental downstream work — re-embedding, re-dedup,
  * decontamination — instead of reprocessing the full corpus.
  */
object Snapshot {

  /** Classify each doc id across two snapshots as added / removed /
    * changed / unchanged by comparing content hashes.
    *
    * Scale shape: each side reduces to (doc_id, md5) in its own scan —
    * the text column never crosses the shuffle, only 32-byte digests —
    * then ONE full-outer shuffle join on doc_id and a per-row CASE.
    * With both snapshots bucketed/sorted by doc_id (the natural layout
    * for an id-keyed corpus) the join is a shuffle-free merge; either
    * way cost is O(|old| + |new|), never O(corpus²) and never a
    * re-read of unchanged payloads. Output: (doc_id, status),
    * unordered.
    */
  /** Apply a change feed to a snapshot — upserts (insert-or-replace)
    * and deletes — producing the next snapshot: the Delta/Iceberg
    * MERGE INTO shape restated as Spark joins.
    *
    * Scale shape: the base corpus NEVER shuffles — deletes and
    * replaced rows both drop out of ONE broadcast left-anti join
    * against the change feed's key set (small by CDC nature), and the
    * upsert rows union in afterwards: scan + broadcast anti + union.
    * No full-outer join, no sort, one pass over the base. A key both
    * deleted and upserted resolves to the upsert (anti removes the
    * old row either way; the union adds the new one). If a feed ever
    * rivaled the base in size the same algebra holds, with the anti
    * join degrading gracefully to a shuffled hash join on doc_id. */
  def upsert(base: DataFrame, upserts: DataFrame,
             deletes: DataFrame): DataFrame = {
    val hot = upserts.select(col("doc_id"))
      .union(deletes.select(col("doc_id"))).distinct()
    base.join(broadcast(hot), Seq("doc_id"), "left_anti")
      .unionByName(upserts)
  }

  def diff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h_old"))
    val n = newSnap.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
