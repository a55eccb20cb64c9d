package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ContentHash, SaltedHash64, VectorDot, VectorNorm}

/** Session-extension entry point:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * injects the native vector expressions into every session's function
  * registry at build time — no per-session `register` call needed, and
  * the functions resolve in pure-SQL deployments (thriftserver, SQL
  * files) where no driver code runs. The UDF surface
  * ([[graft.functions.ImageFunctions.registerAll]]) stays per-session
  * because Scala-closure UDFs can't be injected as builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "vec_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorNorm(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("content_hash64"),
      new ExpressionInfo(classOf[ContentHash].getName, "content_hash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ContentHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("salted_hash64"),
      new ExpressionInfo(classOf[SaltedHash64].getName, "salted_hash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SaltedHash64(exprs(0), exprs(1))))
    // band-join rewrite (opt-in via spark.graft.rangeJoin.bucketWidth):
    // turns inequality-only joins into bucketized equi-joins instead of
    // Catalyst's BroadcastNestedLoopJoin fallback
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
