package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter sketch (Misra & Gries '82;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12 —
  * public algorithms): at most `k` (token, weight) entries per buffer.
  *
  * Guarantee used downstream: after any sequence of reduces and merges
  * over N tokens, every token with true frequency > N/(k+1) is present
  * in the summary. The summary's WEIGHTS are order-dependent (not
  * deterministic under partitioning) — so the engine never emits them:
  * the sketch only proposes candidates, and an exact recount of the
  * ≤ k candidates (a broadcast semi-join, not a vocabulary aggregate)
  * produces the deterministic output. This is the standard
  * bounded-memory shape for "frequent items over 100 TB": the full
  * vocabulary never aggregates anywhere.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
    val cur = buf.getOrElse(tok, 0L)
    if (cur > 0 || buf.size < k) buf.updated(tok, cur + 1L)
    else buf.map { case (t, c) => t -> (c - 1L) }.filter(_._2 > 0L) // classic MG decrement
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (combined.size <= k) combined
    else {
      // mergeable-summaries trim: subtract the (k+1)-th largest weight
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.map { case (t, c) => t -> (c - cut) }.filter(_._2 > 0L)
    }
  }

  override def finish(buf: Map[String, Long]): Array[String] = buf.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
