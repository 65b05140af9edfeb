package graft.llm

import scala.collection.mutable

/** Driver-side twin of the BPE learn loop (r15, guide §1.2-1/§2.6):
  * classic BPE runs on the word-FREQUENCY table, which is vocab-sized —
  * below [[CorpusSignals.DriverBpeVocab]] the collected (w, f) rows run
  * the [[CorpusSignals.BpeRounds]] merge rounds locally instead of
  * `rounds × (pair-agg + limit-1 + fold + eager checkpoint)` sequential
  * Spark jobs over a KB-scale frame.
  *
  * Every operation mirrors the distributed loop exactly:
  *  - characters = CODE POINTS (Spark `substring`/DuckDB `substr`
  *    semantics, not UTF-16 chars);
  *  - the argmax tie-break (n DESC, pa, pb) compares strings as unsigned
  *    UTF-8 BYTES (UTF8String/DuckDB binary collation — Java's UTF-16
  *    `compareTo` diverges above the BMP);
  *  - the merge APPLY is the literal string-fold: accumulate tokens
  *    joined on chr(31), merge when `x == mb && (acc == ma ||
  *    acc.endsWith(sep + ma))`, split back on chr(31) keeping empties
  *    (Spark `split(acc, chr(31))` has limit -1).
  * BpeDriverRegimeSpec pins both regimes value-identical; the DuckDB
  * oracle hash-checks the registered queries end to end.
  */
private[llm] object BpeDriver {

  private val Sep = 31.toChar.toString

  /** (merge rows, final word→token table): merges = (round, a, b,
    * pre-apply pair count, corpus tokens after apply); toks = (w, f,
    * token list after all rounds). */
  case class Learned(
      merges: Seq[(Long, String, String, Long, Long)],
      toks: Seq[(String, Long, Seq[String])])

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** One code point per element — Spark/DuckDB character semantics. */
  private def codePointChars(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  def learn(wf: Array[(String, Long)], rounds: Int): Learned = {
    var toks: Array[(String, Long, Array[String])] =
      wf.map { case (w, f) => (w, f, codePointChars(w)) }
    val merges = mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    (1 to rounds).foreach { r =>
      val cnt = mutable.HashMap.empty[(String, String), Long]
      toks.foreach { case (_, f, t) =>
        var i = 0
        while (i < t.length - 1) {
          val k = (t(i), t(i + 1))
          cnt(k) = cnt.getOrElse(k, 0L) + f
          i += 1
        }
      }
      require(cnt.nonEmpty,
        s"BPE round $r has no adjacent pairs — route to the distributed loop")
      var bestPa: String = null; var bestPb: String = null; var bestN = -1L
      cnt.foreach { case ((pa, pb), n) =>
        val better = n > bestN ||
          (n == bestN && (utf8Lt(pa, bestPa) ||
            (pa == bestPa && utf8Lt(pb, bestPb))))
        if (better) { bestPa = pa; bestPb = pb; bestN = n }
      }
      // the literal string-fold apply (greedy leftmost; a fresh merge
      // can't chain onto its own output because the merged last element
      // no longer equals ma)
      toks = toks.map { case (w, f, t) =>
        var acc: String = null
        t.foreach { x =>
          acc =
            if (acc == null) x
            else if (x == bestPb && (acc == bestPa || acc.endsWith(Sep + bestPa)))
              acc + x
            else acc + Sep + x
        }
        val nt =
          if (acc == null) Array.empty[String]
          else acc.split(java.util.regex.Pattern.quote(Sep), -1)
        (w, f, nt)
      }
      var after = 0L
      toks.foreach { case (_, f, t) => after += f * t.length }
      merges += ((r.toLong, bestPa, bestPb, bestN, after))
    }
    Learned(merges.toSeq,
      toks.map { case (w, f, t) => (w, f, t.toSeq) }.toSeq)
  }
}
