package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ContentHash, MinhashBands, MinhashExpressions, SaltedHash64, VectorDot, VectorNorm, WordShingles}

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
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs.head,
          MinhashExpressions.litInt(exprs(1), "word_shingles n"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashBands(exprs.head,
          MinhashExpressions.litInt(exprs(1), "minhash_bands numHashes"),
          MinhashExpressions.litInt(exprs(2), "minhash_bands r"))))
    // band-join rewrite (opt-in via spark.graft.rangeJoin.bucketWidth):
    // turns inequality-only joins into bucketized equi-joins instead of
    // Catalyst's BroadcastNestedLoopJoin fallback
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
