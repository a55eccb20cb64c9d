package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Gram / second-moment matrix: Σ v·vᵀ over the corpus,
  * upper triangle only, as ONE typed aggregation — the building block
  * of covariance estimation, PCA whitening, and embedding-drift
  * checks in a training-data pipeline.
  *
  * Scale property: the buffer is a single d(d+1)/2 array (2080 longs
  * at d=64) per map partition, combined map-side — the corpus never
  * explodes into (row, i, j) triples, so shuffle volume is
  * O(partitions · d²) regardless of N. That is the same
  * partial-aggregate shape a 1000-executor covariance job needs; the
  * naive posexplode²+groupBy formulation shuffles N·d² rows.
  *
  * Determinism: each product quantizes to the repo's 1e-4 grid
  * (`floor(vᵢ·vⱼ·10000)` as BIGINT — the dsum convention) BEFORE
  * summation, so the sum is exact integer arithmetic: bit-identical
  * for any partitioning, row order, or engine. Production use at raw
  * double precision just drops the floor — the aggregation shape is
  * unchanged.
  */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
  require(d > 0)
  private val size = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val a = v.toArray
    var idx = 0
    var i = 0
    while (i < d) {
      val vi = a(i).toDouble
      var j = i
      while (j < d) {
        buf(idx) += math.floor(vi * a(j).toDouble * 10000.0).toLong
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** First moment + count on the same 1e-4 grid: buffer = d quantized
  * per-dimension sums with the row count in the last slot. Runs
  * alongside [[GramAggregator]] in ONE aggregation so a
  * fit-then-transform consumer (PCA whitening) gets mean, second
  * moment, and n in a single corpus scan. */
class VecMomentAggregator(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
  require(d > 0)

  override def zero: Array[Long] = new Array[Long](d + 1)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    var k = 0
    while (k < d) { buf(k) += math.floor(v(k).toDouble * 10000.0).toLong; k += 1 }
    buf(d) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= d) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
