package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975) — the
  * single-pass blocklist scanner a training-data pipeline runs over
  * every document (banned phrases, compliance terms, contamination
  * markers). One automaton pass finds ALL occurrences of ALL
  * patterns at O(text + matches), vs one full regex/contains scan
  * PER pattern; the automaton is a few KB, built once on the driver
  * and broadcast, so the corpus is never shuffled and never scanned
  * twice. Counterpart of the reference's per-image kernel registry:
  * a small immutable program shipped to executors and applied
  * map-side.
  *
  * Patterns are required to be BORDER-FREE (no proper prefix equals
  * a suffix): a border-free pattern can never overlap itself, so the
  * all-occurrence count this automaton reports equals the leftmost
  * non-overlapping count a `replace()`-based oracle computes — the
  * property that keeps the blocklist query hash-checkable in DuckDB.
  * Patterns that fail the check are rejected loudly at build time.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    gotoFn: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) extends Serializable {

  /** Per-pattern occurrence counts over `text` in one pass. */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      state = gotoFn(s).getOrElse(c, 0)
      val o = out(state)
      var oi = 0
      while (oi < o.length) { counts(o(oi)) += 1; oi += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  private def hasProperBorder(p: String): Boolean =
    (1 until p.length).exists(k => p.regionMatches(0, p, p.length - k, k))

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "need non-empty patterns")
    require(patterns.distinct.size == patterns.size, "duplicate patterns")
    patterns.foreach { p =>
      require(!hasProperBorder(p),
        s"pattern '$p' has a proper border (can overlap itself) — " +
          "all-occurrence counts would diverge from non-overlapping counts")
    }
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    for ((p, pi) <- patterns.zipWithIndex) {
      var s = 0
      for (c <- p) {
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      outB(s) += pi
    }
    val fail = new Array[Int](children.length)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach(queue += _) // depth-1 fail = root
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- children(u)) {
        queue += v
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
        outB(v) ++= outB(fail(v)) // inherit accepts of the longest proper suffix
      }
    }
    new AhoCorasick(patterns.toArray, children.map(_.toMap).toArray,
      fail, outB.map(_.toArray).toArray)
  }
}
