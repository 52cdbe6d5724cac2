package graft.extract

import graft.io.{Triple, Turn}

/** Independent, obviously-correct scalar implementation of the extraction
  * contract (SURVEY.md §5): a word-level leftmost-longest scanner over the
  * normalized text. Used only by tests as the "reference extractor" oracle
  * for the P/R >= 0.95 parity gate — deliberately shares no matching code
  * with [[Extractor]] (which is regex/column based).
  */
object OracleExtractor {

  /** Alias word-sequences sorted longest-first, with their canonical ids. */
  private val aliasWords: Seq[(Array[String], String)] =
    Gazetteer.aliasToId.toSeq
      .map { case (a, id) => (a.split(' '), id) }
      .sortBy { case (w, _) => (-w.length, -w.map(_.length).sum, w.mkString(" ")) }

  private val maxAliasWords = aliasWords.map(_._1.length).max

  /** Ordered distinct canonical entity ids in `text`. */
  def mentions(text: String): Seq[String] = {
    val words = TextNorm.normalize(text).split(' ').filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < words.length) {
      var matched: Option[(Int, String)] = None
      // try longest alias first at this position
      var it = aliasWords.iterator
      while (matched.isEmpty && it.hasNext) {
        val (aw, id) = it.next()
        if (aw.length <= words.length - i) {
          var j = 0
          var ok = true
          while (ok && j < aw.length) { ok = words(i + j) == aw(j); j += 1 }
          if (ok) matched = Some((aw.length, id))
        }
      }
      matched match {
        case Some((len, id)) => out += id; i += len
        case None            => i += 1
      }
    }
    out.distinct.toSeq
  }

  /** Per-turn triples in contract order (see [[Extractor]] scaladoc). */
  def turnTriples(t: Turn): Seq[Triple] = {
    val ents = mentions(t.text)
    val types = ents.map(e => Triple(t.conv_id, t.turn_idx, e, "rdf:type", Gazetteer.byId(e).etype))
    val rels = ents.sliding(2).collect { case Seq(a, b) =>
      Triple(t.conv_id, t.turn_idx, a,
        s"d:rel_${Gazetteer.byId(a).etype.toLowerCase}_${Gazetteer.byId(b).etype.toLowerCase}", b)
    }.toSeq
    val disc = ents.headOption.toSeq.map(e =>
      Triple(t.conv_id, t.turn_idx, s"conv:${t.conv_id}", "d:discusses", e))
    val used =
      if (t.role == "tool" && t.tool.nonEmpty)
        Seq(Triple(t.conv_id, t.turn_idx, s"conv:${t.conv_id}", "d:used", s"tool:${t.tool}"))
      else Seq.empty
    types ++ rels ++ disc ++ used
  }
}
