package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the dedup hot path's two remaining Scala-closure
  * UDFs — word shingling and the MinHash signature+banding — as native
  * codegen'd expressions (the [[ContentHash]] / [[VectorDot]] rule:
  * "functions, not UDFs" applied to the engine's own operators).
  *
  * Why: every minhash/jaccard consumer (q31, q32, q96, q112, q153,
  * q157, q160, decontam, dup-span queries) pays the UDF boundary per
  * document — the catalyst array deserializes to Seq[String], the
  * closure runs, the result serializes back. These kernels read the
  * unsafe array data in place and return catalyst arrays directly;
  * whole-stage codegen pastes the call into the generated operator
  * loop. Bit-identity with the Scala folds is pinned by PropertySpec
  * (same fnv64-over-UTF-16, same mix64, same band fold, same
  * first-occurrence distinct). */
object MinhashUtil {
  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles over a token array — byte-identical
    * to `toks.sliding(n).map(_.mkString(" ")).toSeq.distinct` (UTF-8
    * concatenation of valid strings == concatenation of their UTF-8
    * bytes; LinkedHashSet == first-occurrence distinct). A null or
    * short token array yields an EMPTY array (the UDF's guard), not
    * null — callers need empty-shingle docs to keep their rows. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    if (toks == null) return new GenericArrayData(Array.empty[Any])
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
  }

  /** MinHash banding in one pass: the `numHashes`-slot signature
    * (slot i = min over shingles of mix64(fnv64(s) + i·GOLDEN), empty
    * set ⇒ Long.MaxValue) folded into numHashes/r band hashes
    * (h = mix64(h ^ slot), FNV offset basis) — the exact
    * [[graft.pipeline.Dedup.minhashSignature]] ∘
    * [[graft.pipeline.Dedup.bandHashes]] composition. */
  def minhashBands(sh: ArrayData, numHashes: Int, r: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (sh != null) {
      val n = sh.numElements()
      var i = 0
      while (i < n) {
        val base = graft.pipeline.Dedup.fnv64(sh.getUTF8String(i).toString)
        var j = 0
        while (j < numHashes) {
          val h = graft.pipeline.Dedup.mix64(base + j * 0x9e3779b97f4a7c15L)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
    }
    val bands = numHashes / r
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < r) { h = graft.pipeline.Dedup.mix64(h ^ sig(b * r + k)); k += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(tokens, n)` — native distinct word n-grams. NOT
  * null-intolerant: a null token array maps to the empty shingle set
  * (the UDF contract — such docs still band-collide with each other
  * in the minhash path and survive with empty prefixes in q31's). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_shingles: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def eval(input: InternalRow): Any =
    MinhashUtil.shingles(child.eval(input).asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.MinhashUtil.shingles(
          ${c.isNull} ? null : ${c.value}, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `minhash_bands(shingles, numHashes, r)` — native MinHash signature
  * + band fold, one array<bigint> of numHashes/r band hashes. Not
  * null-intolerant for the same reason as [[WordShingles]]: a null /
  * empty shingle set keeps the all-MaxValue signature. */
case class MinhashBands(child: Expression, numHashes: Int, r: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && r >= 1 && numHashes % r == 0,
    s"minhash_bands: r must divide numHashes, got ($numHashes, $r)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_bands"

  override def eval(input: InternalRow): Any =
    MinhashUtil.minhashBands(child.eval(input).asInstanceOf[ArrayData], numHashes, r)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.MinhashUtil.minhashBands(
          ${c.isNull} ? null : ${c.value}, $numHashes, $r);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashExpressions {
  private[graft] def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Idempotent per-session registration (the [[ContentHashExpression]]
    * pattern; SQL deployments get both from [[graft.GraftExtensions]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head, litInt(exprs(1), "word_shingles n")),
      "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      exprs => MinhashBands(exprs.head,
        litInt(exprs(1), "minhash_bands numHashes"),
        litInt(exprs(2), "minhash_bands r")),
      "scala_udf")
  }

  def wordShingles(toks: Column, n: Int): Column =
    call_function("word_shingles", toks, org.apache.spark.sql.functions.lit(n))
  def minhashBands(sh: Column, numHashes: Int, r: Int): Column =
    call_function("minhash_bands", sh,
      org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(r))
}
