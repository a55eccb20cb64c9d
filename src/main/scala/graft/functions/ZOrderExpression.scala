package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleave helpers for Z-order (Morton) clustering. Pure static
  * long arithmetic — the codegen path calls these directly (Scala
  * objects compile with static forwarders, so generated Java sees
  * ordinary static methods). */
object ZOrderUtil {
  /** Spread the low 31 bits of v one position apart (classic
    * magic-mask doubling). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton-interleave the low 31 bits of x (even positions) and y
    * (odd positions); always non-negative, order-preserving along
    * both axes. Inputs OUTSIDE [0, 2^31) fail loudly: masking would
    * silently wrap a negative axis value to the top of the curve and
    * split locality across the wrap boundary — a layout bug that
    * produces no wrong answers (predicates re-apply after the scan),
    * only quietly useless pruning, which is why it must throw. */
  def interleave(x: Long, y: Long): Long = {
    if ((x | y) < 0L || x > 0x7FFFFFFFL || y > 0x7FFFFFFFL)
      throw new IllegalArgumentException(
        s"z_order inputs must be in [0, 2^31): got ($x, $y) — offset the axis " +
          "from its corpus minimum before interleaving")
    spread(x) | (spread(y) << 1)
  }
}

/** `z_order(x, y)` — the Z-order (Morton) curve value of two
  * non-negative integer columns, as a native codegen'd expression.
  *
  * Why it exists: a 100 TB lake can only be SORTED one way. Sorting by
  * a single column prunes scans that filter on that column and nothing
  * else; laying files out along the Z-curve of two columns keeps rows
  * close in BOTH dimensions, so parquet min/max footer stats prune
  * files/row-groups for 2-D box predicates (the
  * `repartitionByRange(z).sortWithinPartitions(z)` ingest in q106).
  * Same role as Delta/Iceberg OPTIMIZE ZORDER BY, built from public
  * bit-twiddling (Morton 1966).
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // Declared as Seq[DataType] (covariant override) — the parent's
  // AbstractDataType is private[sql] in the Spark 4 build and must not
  // be named here.
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_order"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpression {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order", exprs => ZOrder(exprs(0), exprs(1)), "scala_udf")

  def zOrder(x: Column, y: Column): Column = call_function("z_order", x, y)
}
