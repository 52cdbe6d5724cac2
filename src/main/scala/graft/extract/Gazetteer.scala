package graft.extract

/** Fixed gazetteer of entity surface forms (FIXTURES.md §B): people, places,
  * orgs, tools, each with alias variants (case / punctuation / initials) so
  * MinHash-LSH canonicalization has real work. The synthesizer embeds these
  * surface forms in templated turns; the extractor detects them again —
  * because both sides share this table, per-turn expected triples are
  * derivable by construction (the P/R oracle).
  */
object Gazetteer {

  final case class Entity(id: String, etype: String, aliases: Seq[String])

  private def person(id: String, aliases: String*) = Entity(s"person:$id", "Person", aliases)
  private def place(id: String, aliases: String*)  = Entity(s"place:$id", "Place", aliases)
  private def org(id: String, aliases: String*)    = Entity(s"org:$id", "Org", aliases)
  private def tool(id: String, aliases: String*)   = Entity(s"tool:$id", "Tool", aliases)

  /** Canonical entity table. Aliases are matched case-insensitively after
    * punctuation folding (see [[TextNorm.normalize]]); they are stored here in
    * display form (what the synthesizer embeds in text).
    */
  val entities: Seq[Entity] = Seq(
    person("ada_lovelace", "Ada Lovelace", "A. Lovelace", "ada lovelace", "Ada-Lovelace"),
    person("alan_turing", "Alan Turing", "A. Turing", "alan turing", "TURING, Alan"),
    person("grace_hopper", "Grace Hopper", "G. Hopper", "grace hopper", "Grace M. Hopper"),
    person("edsger_dijkstra", "Edsger Dijkstra", "E. W. Dijkstra", "edsger dijkstra"),
    person("barbara_liskov", "Barbara Liskov", "B. Liskov", "barbara liskov"),
    person("donald_knuth", "Donald Knuth", "D. Knuth", "donald knuth", "Donald E. Knuth"),
    person("john_mccarthy", "John McCarthy", "J. McCarthy", "john mccarthy"),
    person("claude_shannon", "Claude Shannon", "C. Shannon", "claude shannon"),
    person("margaret_hamilton", "Margaret Hamilton", "M. Hamilton", "margaret hamilton"),
    person("tim_berners_lee", "Tim Berners-Lee", "T. Berners-Lee", "tim berners lee"),
    person("katherine_johnson", "Katherine Johnson", "K. Johnson", "katherine johnson"),
    person("linus_torvalds", "Linus Torvalds", "L. Torvalds", "linus torvalds"),
    person("radia_perlman", "Radia Perlman", "R. Perlman", "radia perlman"),
    person("vint_cerf", "Vint Cerf", "V. Cerf", "vint cerf"),
    person("frances_allen", "Frances Allen", "F. Allen", "frances allen"),
    person("ken_thompson", "Ken Thompson", "K. Thompson", "ken thompson"),
    place("rome", "Rome", "rome", "ROME"),
    place("london", "London", "london"),
    place("paris", "Paris", "paris"),
    place("zurich", "Zurich", "zurich", "Zürich"),
    place("new_york", "New York", "new york", "New-York", "NEW YORK"),
    place("tokyo", "Tokyo", "tokyo"),
    place("berlin", "Berlin", "berlin"),
    place("nairobi", "Nairobi", "nairobi"),
    place("sydney", "Sydney", "sydney"),
    place("toronto", "Toronto", "toronto"),
    place("sao_paulo", "Sao Paulo", "São Paulo", "sao paulo"),
    place("mumbai", "Mumbai", "mumbai"),
    org("acme_analytics", "Acme Analytics", "ACME Analytics", "acme analytics", "Acme-Analytics"),
    org("globex", "Globex", "GLOBEX", "globex"),
    org("initech", "Initech", "initech", "INITECH"),
    org("umbrella_labs", "Umbrella Labs", "umbrella labs", "Umbrella-Labs"),
    org("stark_industries", "Stark Industries", "stark industries", "Stark-Industries"),
    org("wayne_enterprises", "Wayne Enterprises", "wayne enterprises"),
    org("tyrell_corp", "Tyrell Corp", "tyrell corp", "Tyrell Corporation"),
    org("aperture_science", "Aperture Science", "aperture science"),
    org("hooli", "Hooli", "hooli", "HOOLI"),
    org("pied_piper", "Pied Piper", "pied piper", "Pied-Piper"),
    tool("web_search", "web_search", "Web Search", "web-search"),
    tool("calculator", "calculator", "Calculator"),
    tool("sql_runner", "sql_runner", "SQL Runner", "sql-runner"),
    tool("code_exec", "code_exec", "Code Exec", "code-exec"),
    tool("doc_lookup", "doc_lookup", "Doc Lookup", "doc-lookup"),
    tool("translator", "translator", "Translator"),
  )

  val byId: Map[String, Entity] = entities.map(e => e.id -> e).toMap

  /** normalized alias -> canonical entity id (the broadcast lookup table). */
  val aliasToId: Map[String, String] = (for {
    e <- entities; a <- e.aliases
  } yield TextNorm.normalize(a) -> e.id).toMap

  /** normalized alias -> entity type. */
  val aliasToType: Map[String, String] = (for {
    e <- entities; a <- e.aliases
  } yield TextNorm.normalize(a) -> e.etype).toMap

  /** All normalized alias keys, longest first (greedy leftmost-longest match). */
  val normalizedAliases: Seq[String] =
    aliasToId.keys.toSeq.sortBy(a => (-a.length, a))

  /** Regex alternation over normalized aliases with word boundaries. Applied
    * to normalized text, so the pattern contains only [a-z0-9 ] and needs no
    * quoting at all — keeping it free of Java-only constructs (\Q...\E) makes
    * the same pattern valid in RE2 engines (DuckDB oracle twin queries).
    */
  val pattern: String =
    normalizedAliases.mkString("\\b(", "|", ")\\b")

  val people: IndexedSeq[Entity] = entities.filter(_.etype == "Person").toIndexedSeq
  val places: IndexedSeq[Entity] = entities.filter(_.etype == "Place").toIndexedSeq
  val orgs: IndexedSeq[Entity]   = entities.filter(_.etype == "Org").toIndexedSeq
  val tools: IndexedSeq[Entity]  = entities.filter(_.etype == "Tool").toIndexedSeq
}

/** Shared text normalization: the single definition both the synthesizer's
  * oracle and the extractor use. Lowercase; fold [-_.,;:!?'"()] and diacritics
  * used by gazetteer aliases to spaces; collapse whitespace.
  */
object TextNorm {
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastSpace = true
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = c0 match {
        case 'ü' | 'Ü' => 'u'
        case 'ã' | 'Ã' => 'a'
        case x => x
      }
      val lower =
        if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c
        else ' '
      if (lower == ' ') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(lower); lastSpace = false }
      i += 1
    }
    // trim trailing space
    val out = sb.toString
    if (out.endsWith(" ")) out.dropRight(1) else out
  }
}
