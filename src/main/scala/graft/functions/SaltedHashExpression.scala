package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel for [[SaltedHash64]]: the engine's hash-permutation
  * family `mix64(base + i·GOLDEN)` — the same recurrence the minhash
  * permutations use (`Dedup.scala` minhash signature) — with Java
  * wrap-around arithmetic. Kept OUT of Spark's `+`/`*` on purpose:
  * under ANSI mode (Spark 4's default) a wrapped Long overflow throws,
  * while hash mixing REQUIRES modular wrap-around. */
object SaltedHashUtil {
  val Golden = 0x9e3779b97f4a7c15L
  def hash(base: Long, i: Long): Long =
    graft.pipeline.Dedup.mix64(base + i * Golden)
}

/** `salted_hash64(h, i)` — the i-th hash permutation of a 64-bit base
  * hash as a native codegen'd expression (no ScalaUDF boundary, no
  * ANSI-overflow hazard). Feeds the Count-Min sketch's per-depth
  * bucket hashes and any future d-wise independent hash family;
  * mirrored bit-exactly in DuckDB through [[graft.pipeline.HashSql]]
  * (addMod of the wrapped i·GOLDEN constant, then the four mix
  * stages). */
case class SaltedHash64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "salted_hash64"

  override def nullSafeEval(base: Any, i: Any): Any =
    SaltedHashUtil.hash(base.asInstanceOf[Long], i.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, i) => s"graft.functions.SaltedHashUtil.hash($b, $i)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SaltedHash64 = copy(left = newLeft, right = newRight)
}

object SaltedHashExpression {
  /** Idempotent per-session registration (same contract as
    * [[ContentHashExpression.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "salted_hash64", exprs => SaltedHash64(exprs.head, exprs(1)), "scala_udf")

  def saltedHash64(base: Column, i: Column): Column =
    call_function("salted_hash64", base, i)
}
