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

  // hot path (round 16): binary-search + arraycopy insert instead of
  // indexWhere + take/:+/drop over an immutable Vector — identical
  // contents (sorted ascending, distinct, bottom-k), a fraction of
  // the allocations per element. Wrapped arrays compare element-wise
  // like any Seq, so buffers and outputs are value-identical.
  private def insertCapped(buf: Seq[Long], h: Long): Seq[Long] = {
    val n = buf.length
    // binary search for the insertion point (first index with >= h)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) >= h) hi = mid else lo = mid + 1
    }
    if (lo < n && buf(lo) == h) return buf // duplicate hash: KMV is a set
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    var i = 0
    while (i < lo && i < outLen) { out(i) = buf(i); i += 1 }
    if (lo < outLen) out(lo) = h
    i = lo
    while (i + 1 < outLen) { out(i + 1) = buf(i); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length < k || h < buf.last) insertCapped(buf, h)
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    KmvAggregator.mergeSortedCapped(a, b, k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvAggregator {
  /** Two-pointer union of two SORTED-DISTINCT sequences, truncated at
    * the k smallest — the bottom-k-of-union property that makes KMV
    * sketches mergeable, computed in one linear pass instead of
    * repeated element inserts. Value-identical to folding every
    * element of `b` through [[KmvAggregator.reduce]]. */
  private[functions] def mergeSortedCapped(a: Seq[Long], b: Seq[Long],
                                           k: Int): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      mergeSortedCappedArr(a.toArray, b.toArray, k))

  /** Primitive-array form of the capped sorted union — the
    * [[KmvMergeAggregator]] hot path (no boxing anywhere). */
  private[functions] def mergeSortedCappedArr(a: Array[Long], b: Array[Long],
                                              k: Int): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty && b.length <= k) return b
    val na = a.length; val nb = b.length
    val out = new Array[Long](math.min(k, na + nb))
    var i = 0; var j = 0; var m = 0
    while (m < out.length && (i < na || j < nb)) {
      val v =
        if (j >= nb) { val x = a(i); i += 1; x }
        else if (i >= na) { val x = b(j); j += 1; x }
        else {
          val av = a(i); val bv = b(j)
          if (av < bv) { i += 1; av }
          else if (bv < av) { j += 1; bv }
          else { i += 1; j += 1; av } // equal: one element of the union
        }
      out(m) = v
      m += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }
}

/** Merge aggregator over KMV SKETCHES (each input row is already a
  * sorted bottom-k array): the union of bottom-k sets is itself
  * computed bottom-k — the property that makes KMV sketches
  * distributively mergeable, which is what lets the HyperBall-style
  * neighborhood iteration ([[graft.pipeline.Graph.neighborhoodFunction]])
  * run as one groupBy per round. Same deterministic semantics as
  * feeding every element through [[KmvAggregator]]. */
class KmvMergeAggregator(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(k > 0)
  private val empty = Array.emptyLongArray
  override def zero: Array[Long] = empty
  // each input row IS a sorted-distinct bottom-k sketch, so the union
  // is one linear two-pointer merge over PRIMITIVE arrays (round 16:
  // was an O(k) immutable insert per element over boxed Seqs — the
  // q134 HyperBall hot loop pays one of these per edge per round).
  // Array[Long] encoders move array<bigint> columns without
  // per-element boxing; the column type is unchanged.
  override def reduce(buf: Array[Long], sketch: Array[Long]): Array[Long] =
    if (sketch == null) buf
    else KmvAggregator.mergeSortedCappedArr(buf, sketch, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
