package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group k-SMALLEST as a typed [[Aggregator]]: (ord, id) long pairs
  * reduce into a bounded k-element buffer ordered by (ord asc, id asc)
  * — the ascending-rank mirror of [[TopKAggregator]].
  *
  * This is the scale-safe replacement for `ROW_NUMBER() OVER
  * (PARTITION BY g ORDER BY ord, id) <= k`: the window places every
  * row of a group on ONE task (a straggler/OOM when the group is a
  * low-cardinality key like language), while this aggregator combines
  * map-side, so each map partition ships at most k pairs per group and
  * no task ever sorts or buffers a whole group. The buffer is kept
  * sorted, so `finish` emits the group's k smallest pairs in rank
  * order — index + 1 IS the row_number. Deterministic and
  * partition-invariant: the global k-smallest set is invariant to how
  * rows are split across partial buffers, and ties cannot occur when
  * `id` is unique.
  */
class KSmallestAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  // "a ranks before b" under (ord asc, id asc)
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.length < k) insert(buf, x)
    else if (beats(x, buf.last)) insert(buf.dropRight(1), x)
    else buf

  private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    val i = buf.indexWhere(e => beats(x, e))
    if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
