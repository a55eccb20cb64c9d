package graft.pipeline

/** DuckDB SQL fragments that mirror the engine's Scala hash family
  * ([[Dedup.fnv64]] / [[Dedup.mix64]]) bit-for-bit, so hash-based
  * operators (winnowing fingerprints, MinHash) can be oracle-checked
  * instead of rows-only checked.
  *
  * Technique: DuckDB integer arithmetic THROWS on overflow rather than
  * wrapping, so 64-bit wraparound math is emulated in HUGEINT (128-bit)
  * reduced `% 2^64`. A 64×64-bit product can reach 2^128 (overflowing
  * HUGEINT), so multiplication splits the left operand into 32-bit
  * halves: `(hi·c mod 2^32)·2^32 + lo·c (mod 2^64)` — every
  * intermediate stays below 2^97. Values travel as UBIGINT bit
  * patterns; Scala's SIGNED Long comparisons are reproduced by
  * converting to BIGINT (two's complement) before any ordering. The
  * corpus is ASCII, where Scala's UTF-16 `charAt` fold and DuckDB's
  * `unicode()` codepoints agree.
  */
private[graft] object HashSql {

  private val Mod = "18446744073709551616" // 2^64
  private val Half = "9223372036854775808" // 2^63

  private def u(c: Long): String = java.lang.Long.toUnsignedString(c)

  /** (a * c) mod 2^64 — `a` a UBIGINT expression, `c` a 64-bit constant. */
  def mulMod(a: String, c: Long): String =
    s"CAST(((CAST(($a) >> 32 AS HUGEINT) * ${u(c)} % 4294967296) * 4294967296" +
      s" + CAST(($a) & 4294967295 AS HUGEINT) * ${u(c)}) % $Mod AS UBIGINT)"

  /** (a + c) mod 2^64. */
  def addMod(a: String, c: Long): String =
    s"CAST((CAST($a AS HUGEINT) + ${u(c)}) % $Mod AS UBIGINT)"

  /** (a + b) mod 2^64 — both UBIGINT expressions. */
  def addModExpr(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $Mod AS UBIGINT)"

  /** a ^ (a >>> k) on the UBIGINT bit pattern (logical shift). */
  def xorShift(a: String, k: Int): String = s"xor($a, ($a) >> $k)"

  /** Reinterpret a UBIGINT bit pattern as a signed BIGINT (two's
    * complement) — Scala Long comparison semantics. */
  def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= $Half THEN CAST($x AS HUGEINT) - $Mod" +
      s" ELSE CAST($x AS HUGEINT) END AS BIGINT)"

  /** Reinterpret a signed BIGINT as its UBIGINT bit pattern (inverse
    * of [[toSigned]]). */
  def fromSigned(x: String): String =
    s"CAST(CASE WHEN ($x) < 0 THEN CAST($x AS HUGEINT) + $Mod" +
      s" ELSE CAST($x AS HUGEINT) END AS UBIGINT)"

  /** fnv64 of a VARCHAR expression: fold `h = (h ^ char) * prime` over
    * the characters. The FNV prime is ~2^40, so the product of a
    * 64-bit value with it fits HUGEINT directly — no split needed. */
  def fnv64(s: String): String =
    s"list_reduce(list_prepend(CAST(${u(0xcbf29ce484222325L)} AS UBIGINT), " +
      s"list_transform(string_split($s, ''), ch -> CAST(unicode(ch) AS UBIGINT))), " +
      s"(h, c) -> CAST(CAST(xor(h, c) AS HUGEINT) * ${u(0x100000001b3L)} % $Mod AS UBIGINT))"

  /** The four [[Dedup.mix64]] stages as separate expressions, meant to
    * be staged through successive CTE columns (inlining the whole
    * finalizer nests the argument ~6^3 times). Apply in order:
    * stage1(b) → stage2(s1) → stage3(s2) → stage4(s3). */
  def mixStage1(b: String): String = addMod(b, 0x9e3779b97f4a7c15L)
  def mixStage2(s1: String): String = mulMod(xorShift(s1, 30), 0xbf58476d1ce4e5b9L)
  def mixStage3(s2: String): String = mulMod(xorShift(s2, 27), 0x94d049bb133111ebL)
  def mixStage4(s3: String): String = xorShift(s3, 31)
}
