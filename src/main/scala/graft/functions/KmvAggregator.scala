package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]]: keeps the k smallest DISTINCT hash values seen,
  * sorted ascending. With values hashed uniformly into [0, 2^62), the
  * classic bottom-k estimator is `(k-1) * 2^62 / kth_smallest` —
  * every step of which is exact integer arithmetic, so unlike an HLL
  * register file the whole sketch replays bit-for-bit in any engine
  * that shares the hash (the DuckDB oracle does, via the HashSql
  * mirror). Standard error ~ 1/sqrt(k-2).
  *
  * Scale shape: the buffer is a bounded k-element sorted vector that
  * combines MAP-SIDE — each map partition ships at most k longs per
  * group, the reducer merges k-element buffers — where the exact
  * `countDistinct` it approximates must shuffle every distinct value.
  * Duplicate hashes collapse inside the buffer (KMV is defined over
  * the distinct hash set), so no pre-`distinct` pass is needed.
  *
  * Reference behavior (approxCountDistinct over image tables):
  * kmader/spark-ij exposes Spark's HLL; this sketch is the
  * oracle-checkable counterpart with the same accuracy knob.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    val i = buf.indexWhere(_ >= h)
    if (i < 0) buf :+ h
    else if (buf(i) == h) buf
    else (buf.take(i) :+ h) ++ buf.drop(i)
  }

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length < k) insert(buf, h)
    else if (h < buf.last) {
      val nb = insert(buf, h)
      if (nb.length > k) nb.dropRight(1) else nb
    } else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Merge aggregator over KMV SKETCHES (each input row is already a
  * sorted bottom-k array): the union of bottom-k sets is itself
  * computed bottom-k — the property that makes KMV sketches
  * distributively mergeable, which is what lets the HyperBall-style
  * neighborhood iteration ([[graft.pipeline.Graph.neighborhoodFunction]])
  * run as one groupBy per round. Same deterministic semantics as
  * feeding every element through [[KmvAggregator]]. */
class KmvMergeAggregator(k: Int)
    extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  require(k > 0)
  private val one = new KmvAggregator(k)
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], sketch: Seq[Long]): Seq[Long] =
    if (sketch == null) buf else sketch.foldLeft(buf)(one.reduce)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = reduce(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
