package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975) — the
  * single-pass blocklist scanner a training-data pipeline runs over
  * every document (banned phrases, compliance terms, contamination
  * markers). One automaton pass finds occurrences of ALL patterns at
  * O(text + matches), vs one full regex/contains scan PER pattern;
  * the automaton is a few KB, built once on the driver and broadcast,
  * so the corpus is never shuffled and never scanned twice.
  * Counterpart of the reference's per-image kernel registry: a small
  * immutable program shipped to executors and applied map-side.
  *
  * Counting semantics: per pattern, LEFTMOST NON-OVERLAPPING
  * occurrences — the same greedy walk `replace(text, pat, '')` does —
  * so self-overlapping (bordered) patterns like "abab" or "a a" are
  * fully supported and the counts stay replayable with `replace()`
  * length arithmetic in a DuckDB oracle. The automaton still visits
  * every occurrence end-state in one pass; a per-pattern last-match-end
  * cursor (O(P) ints per call) suppresses the overlapping ones.
  * Occurrences of a pattern arrive in increasing end position, and all
  * matches of one pattern share its length, so the greedy
  * "take-if-start-past-last-end" rule is exactly the leftmost
  * non-overlapping selection. Patterns are counted independently of
  * each other — overlap BETWEEN different patterns never suppresses
  * anything, matching the oracle's per-pattern cross join.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    patLen: Array[Int],
    gotoFn: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) extends Serializable {

  /** Per-pattern leftmost non-overlapping occurrence counts over
    * `text` in one pass (replace()-equivalent semantics). */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    val lastEnd = Array.fill(patterns.length)(-1)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      state = gotoFn(s).getOrElse(c, 0)
      val o = out(state)
      var oi = 0
      while (oi < o.length) {
        val p = o(oi)
        if (i - patLen(p) + 1 > lastEnd(p)) { // start past last taken end
          counts(p) += 1
          lastEnd(p) = i
        }
        oi += 1
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "need non-empty patterns")
    require(patterns.distinct.size == patterns.size, "duplicate patterns")
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
    new AhoCorasick(patterns.toArray, patterns.map(_.length).toArray,
      children.map(_.toMap).toArray, fail, outB.map(_.toArray).toArray)
  }
}
