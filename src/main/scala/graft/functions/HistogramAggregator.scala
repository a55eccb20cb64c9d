package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.{ImageHistogram, Kernels, SparkImage}

/** Cross-image histogram aggregation (SURVEY A6's corpus-level path):
  * a typed [[Aggregator]] with a fixed binning so partial buffers are
  * plain count arrays — map-side combine applies, the shuffle carries
  * one `bins`-length array per partition per group, never pixels.
  * This is the distributed analogue of the reference's per-image
  * `hist3` + driver-side merge, without ever collecting images.
  */
class HistogramAggregator(min: Double, max: Double, bins: Int)
    extends Aggregator[SparkImage, Array[Long], ImageHistogram] {

  override def zero: Array[Long] = new Array[Long](bins)

  override def reduce(buf: Array[Long], img: SparkImage): Array[Long] = {
    val h = Kernels.histogram(img, min, max, bins)
    var i = 0
    while (i < bins) { buf(i) += h.counts(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): ImageHistogram =
    ImageHistogram(ImageHistogram.centers(min, max, bins), buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[ImageHistogram] = Encoders.product[ImageHistogram]
}
