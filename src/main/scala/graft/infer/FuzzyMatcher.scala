package graft.infer

/** Reference-exact port of the schema-inference fuzzy name matcher
  * (graflo/util/fuzzy_matcher.py:1-281): match a table/column fragment
  * against vertex names with five strategies — exact (case-insensitive,
  * returns immediately at 1.0), substring containment with length-ratio
  * scoring (×1.2 boost capped at 0.95 for ≥3-char sides), difflib
  * `SequenceMatcher.ratio` (Ratcliff–Obershelp, implemented below),
  * prefix/suffix containment, and common key-pattern stripping
  * (`_id`/`_fk`/`fk_`/… → 0.9). The best score wins; below `threshold`
  * the match is None.
  *
  * Driver-side metadata matching (vertex-name cardinality), used by the
  * Postgres 3NF inference face — NOT a data-plane operator; the data-plane
  * fuzzy joins are [[Inference.fuzzyPairs]] / the Jaro-Winkler kernel.
  * Parity is asserted against reference-executed results in
  * `FuzzyMatcherParitySpec`.
  */
final class FuzzyMatcher(vertexNames: Seq[String], threshold: Double = 0.8) {

  // insertion-ordered lowercase → original (later duplicates overwrite,
  // matching the python dict comprehension)
  private val lowerMap: Seq[(String, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    vertexNames.foreach(vn => m(vn.toLowerCase) = vn)
    m.toSeq
  }

  def matchFragment(fragment: String): (Option[String], Double) = {
    if (vertexNames.isEmpty || fragment == null || fragment.isEmpty)
      return (None, 0.0)
    val f = fragment.toLowerCase
    lowerMap.find(_._1 == f) match {
      case Some((_, orig)) => return (Some(orig), 1.0)
      case None => ()
    }
    var best: Option[String] = None
    var bestScore = 0.0
    def consider(m: Option[String], s: Double): Unit =
      if (s > bestScore) { bestScore = s; best = m }
    val (sm, ss) = substringMatch(f); consider(sm, ss)
    val (qm, qs) = sequenceMatch(f); consider(qm, qs)
    val (pm, ps) = prefixSuffixMatch(f); consider(pm, ps)
    val (tm, ts) = patternMatch(f); consider(tm, ts)
    if (bestScore >= threshold) (best, bestScore) else (None, 0.0)
  }

  private def substringMatch(f: String): (Option[String], Double) = {
    var best: Option[String] = None
    var bestScore = 0.0
    lowerMap.foreach { case (vl, vn) =>
      if (vl.contains(f)) {
        var score = f.length.toDouble / vl.length
        if (f.length >= 3) score = math.min(score * 1.2, 0.95)
        if (score > bestScore) { bestScore = score; best = Some(vn) }
      } else if (f.contains(vl)) {
        var score = vl.length.toDouble / f.length
        if (vl.length >= 3) score = math.min(score * 1.2, 0.95)
        if (score > bestScore) { bestScore = score; best = Some(vn) }
      }
    }
    (best, bestScore)
  }

  private def sequenceMatch(f: String): (Option[String], Double) = {
    var best: Option[String] = None
    var bestScore = 0.0
    lowerMap.foreach { case (vl, vn) =>
      val sim = FuzzyMatcher.sequenceRatio(f, vl)
      if (sim > bestScore) { bestScore = sim; best = Some(vn) }
    }
    (best, bestScore)
  }

  private def prefixSuffixMatch(f: String): (Option[String], Double) = {
    var best: Option[String] = None
    var bestScore = 0.0
    lowerMap.foreach { case (vl, vn) =>
      if (f.startsWith(vl) || f.endsWith(vl)) {
        val score = vl.length.toDouble / f.length
        if (score > bestScore) { bestScore = score; best = Some(vn) }
      } else if (vl.startsWith(f)) {
        val score = f.length.toDouble / vl.length
        if (score > bestScore) { bestScore = score; best = Some(vn) }
      }
    }
    (best, bestScore)
  }

  private val patterns = Seq("_id", "_fk", "_key", "_pk", "_ref",
    "_reference", "id_", "fk_", "key_", "pk_", "ref_", "reference_")

  private def patternMatch(f: String): (Option[String], Double) = {
    var best: Option[String] = None
    var bestScore = 0.0
    patterns.foreach { p =>
      val base =
        if (f.endsWith(p)) Some(f.substring(0, f.length - p.length))
        else if (f.startsWith(p)) Some(f.substring(p.length))
        else None
      base.flatMap(b => lowerMap.find(_._1 == b)).foreach { case (_, vn) =>
        if (0.9 > bestScore) { bestScore = 0.9; best = Some(vn) }
      }
    }
    (best, bestScore)
  }
}

object FuzzyMatcher {

  /** difflib `SequenceMatcher(None, a, b).ratio()` — Ratcliff–Obershelp:
    * 2·M / (|a| + |b|) where M totals the recursively-found longest
    * matching blocks (the exact find_longest_match loop; autojunk only
    * affects |b| ≥ 200 popularity classes, inert on schema-name inputs
    * which are far shorter).
    */
  def sequenceRatio(a: String, b: String): Double = {
    if (a.length + b.length == 0) return 1.0
    val b2j = scala.collection.mutable.Map.empty[Char, List[Int]]
    b.zipWithIndex.reverse.foreach { case (c, j) =>
      b2j(c) = j :: b2j.getOrElse(c, Nil)
    }
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestSize = 0
      var j2len = Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        var newJ2len = Map.empty[Int, Int]
        b2j.getOrElse(a(i), Nil).foreach { j =>
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newJ2len += (j -> k)
            if (k > bestSize) { besti = i - k + 1; bestj = j - k + 1; bestSize = k }
          }
        }
        j2len = newJ2len
        i += 1
      }
      (besti, bestj, bestSize)
    }
    var total = 0
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = longestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        queue.push((alo, i, blo, j))
        queue.push((i + k, ahi, j + k, bhi))
      }
    }
    2.0 * total / (a.length + b.length)
  }
}
