package graft.functions

/** Aho–Corasick multi-pattern matcher — the C4-style PHRASE blocklist
  * needs substring search for hundreds-to-thousands of bad phrases per
  * document, and per-phrase `contains` scans the text once PER PHRASE;
  * this automaton (Aho & Corasick 1975) finds every occurrence of every
  * pattern in ONE pass over the text, cost independent of pattern count.
  *
  * Matching is exact-case, substring-level (no token boundaries) — the
  * blocklist contract real pipelines use (lowercase both sides for
  * case-folding). `countMatches` counts ALL occurrences including
  * overlaps across patterns (each pattern's ends are counted wherever
  * they occur); `anyMatch` short-circuits at the first hit — the filter
  * hot path.
  *
  * Build is driver-side over the pattern list (trie + BFS fail links,
  * per-node output counts accumulated through the links); the built
  * automaton ships to executors as a plan reference object
  * ([[TextExpressions.PhraseMatches]]), immutable and thread-safe.
  */
final class AhoCorasick private (
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    outCount: Array[Int]) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val nxt = gotoMaps(s).get(c)
      if (nxt != null) return nxt
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Total pattern occurrences in `text` (overlaps included). */
  def countMatches(text: String): Int = {
    if (text == null) return 0
    var s = 0
    var total = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      total += outCount(s)
      i += 1
    }
    total
  }

  /** True iff any pattern occurs in `text` (short-circuits). */
  def anyMatch(text: String): Boolean = {
    if (text == null) return false
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      if (outCount(s) > 0) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {

  /** Build the automaton. Empty patterns are rejected (they would match
    * everywhere); duplicate patterns each count.
    */
  def apply(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "phrase list must be non-empty")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "phrases must be non-empty strings")
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(0)
    // trie
    patterns.foreach { p =>
      var s = 0
      p.foreach { c =>
        val nxt = gotoMaps(s).get(c)
        if (nxt != null) s = nxt
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ends += 0
          gotoMaps(s).put(c, gotoMaps.length - 1)
          s = gotoMaps.length - 1
        }
      }
      ends(s) += 1
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val outCount = ends.toArray
    // BFS fail links; output counts accumulate through them so a state
    // "contains" every pattern that ends at any suffix of its path
    val queue = new java.util.ArrayDeque[Int]()
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val s = queue.poll()
      outCount(s) += outCount(fail(s))
      gotoMaps(s).forEach { (c, v) =>
        var f = fail(s)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val fnxt = gotoMaps(f).get(c)
        fail(v) = if (fnxt != null && fnxt != v) fnxt else 0
        queue.add(v)
      }
    }
    new AhoCorasick(gotoMaps.toArray, fail, outCount)
  }
}
