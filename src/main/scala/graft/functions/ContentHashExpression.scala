package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[ContentHash]] — the engine's standard content
  * hash mix64(fnv64(s)), bit-identical to the Scala fold in
  * [[graft.pipeline.Dedup]] (fnv64 iterates UTF-16 code units, so the
  * UTF8String converts through a String first) and to the DuckDB
  * mirror in [[graft.pipeline.HashSql]]. Codegen calls this as an
  * ordinary static method. */
object ContentHashUtil {
  def hash(s: UTF8String): Long =
    graft.pipeline.Dedup.mix64(graft.pipeline.Dedup.fnv64(s.toString))
}

/** `content_hash64(text)` — mix64∘fnv64 of a string column as a
  * NATIVE codegen'd expression, replacing the Scala-closure UDF the
  * hash-bucketing paths (corpus sharding, mixture sampling, KMV
  * distinct) previously used.
  *
  * Why it exists: a Scala UDF forces a codegen break — every row
  * crosses the generated-Java/closure boundary with boxing and a
  * null-check wrapper, and the expression becomes a black box to the
  * optimizer. As a native expression the hash inlines into
  * WholeStageCodegen like any built-in, keeping the scan → hash →
  * shuffle pipeline in one generated loop — the "functions, not
  * UDFs" rule applied to the engine's own hot path. */
case class ContentHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "content_hash64"

  override def nullSafeEval(input: Any): Any =
    ContentHashUtil.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ContentHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): ContentHash =
    copy(child = newChild)
}

object ContentHashExpression {
  /** Idempotent per-session registration (library callers invoke it
    * before use; SQL deployments get it from [[graft.GraftExtensions]]
    * instead). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "content_hash64", exprs => ContentHash(exprs.head), "scala_udf")

  def contentHash64(c: Column): Column = call_function("content_hash64", c)
}
