package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed [[Aggregator]]: (score, id) pairs reduce
  * into a bounded k-element buffer ordered by (score desc, id asc).
  *
  * Scale property vs the window-function top-k (`ROW_NUMBER() OVER
  * (PARTITION BY g ORDER BY score) <= k`): the window needs a full
  * shuffle + sort of every candidate row; this aggregator combines
  * map-side, so each map partition ships at most k rows per group and
  * the reducer merges k-element buffers. For ANN with |corpus| rows per
  * query, shuffle volume drops from O(N) to O(k · partitions). Ties
  * break on id, so results are deterministic and partition-invariant.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  // "a beats b" under (score desc, id asc)
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length < k) insert(buf, x)
    else if (beats(x, buf.last)) insert(buf.dropRight(1), x)
    else buf

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val i = buf.indexWhere(e => beats(x, e))
    if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
