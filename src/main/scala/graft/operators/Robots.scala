package graft.operators

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

/** robots.txt evaluation (RFC 9309) — the crawl-permission gate every
  * web pipeline applies before a URL becomes corpus bytes. (Reference
  * analog: the dispatch frame's handlers receive raw text payloads,
  * `/root/reference/src/processor.ts:69`; a crawl handler's first
  * question about a fetched URL is exactly this.)
  *
  * The grammar is deliberately forgiving (the spec says so): lines are
  * `key: value` with `#` comments; keys are case-insensitive; unknown
  * directives (crawl-delay, sitemap, ...) are ignored; rules appearing
  * before any `User-agent` line belong to no group and are dropped.
  * Consecutive `User-agent` lines share one group.
  *
  * Decision semantics (the part implementations get wrong):
  *   - group selection: all groups whose agent list contains the
  *     product token (case-insensitive) merge; if none match, the `*`
  *     groups merge; if neither exists, everything is allowed;
  *   - rule patterns are PATH-PREFIX matches where `*` matches any
  *     character run and a TRAILING `$` anchors end-of-target (a `$`
  *     elsewhere is literal); the match target is path + query;
  *   - among matching rules the LONGEST pattern wins (length of the
  *     raw pattern, wildcards included — the documented behavior of
  *     the major implementations); an allow/disallow TIE at the same
  *     length resolves to ALLOW;
  *   - no matching rule means allowed; an EMPTY `Disallow:` value
  *     matches nothing (the classic "allow everything" idiom).
  *
  * Scale: [[parse]] once per (host, robots fetch) — patterns compile to
  * anchored regexes at parse time — then [[decide]] is a per-URL probe
  * callers run map-side over the URL stream; nothing shuffles.
  */
object Robots {

  /** One access rule: allow/disallow, the raw pattern (its LENGTH is
    * the precedence key), and the compiled matcher.
    */
  final case class Rule(allow: Boolean, pattern: String, re: Pattern) {
    def len: Int = pattern.length
    def matches(target: String): Boolean = re.matcher(target).matches()
  }

  /** One group: the user-agent product tokens it names (lowercased)
    * and its rules in file order.
    */
  final case class Group(agents: Vector[String], rules: Vector[Rule])

  /** Compile a robots pattern to an anchored regex: `*` -> `.*`, a
    * trailing `$` anchors (drop it and do NOT append `.*`), everything
    * else is literal. Non-anchored patterns are prefix matches, so the
    * regex gets a trailing `.*`.
    */
  private[operators] def compilePattern(p: String): Pattern = {
    val anchored = p.endsWith("$")
    val body = if (anchored) p.substring(0, p.length - 1) else p
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val star = body.indexOf('*', i)
      if (star < 0) { sb.append(Pattern.quote(body.substring(i))); i = body.length }
      else {
        if (star > i) sb.append(Pattern.quote(body.substring(i, star)))
        sb.append(".*")
        i = star + 1
      }
    }
    if (!anchored) sb.append(".*")
    Pattern.compile(sb.toString, Pattern.DOTALL)
  }

  /** Parse a robots.txt body into groups. Never rejects — the spec
    * mandates lenient parsing; malformed lines are skipped.
    */
  def parse(txt: String): Vector[Group] = {
    val groups = ArrayBuffer.empty[(ArrayBuffer[String], ArrayBuffer[Rule])]
    var inAgentRun = false // consecutive User-agent lines share a group
    txt.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) groups += ((ArrayBuffer.empty, ArrayBuffer.empty))
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value, compilePattern(value))
          // empty Disallow: matches nothing (allow-everything idiom)
          case _ => inAgentRun = false // unknown directive: ignored
        }
      }
    }
    groups.map { case (a, r) => Group(a.toVector, r.toVector) }.toVector
  }

  /** Decide (allowed, matched-pattern-length) for an agent and a
    * path+query target under parsed groups. Length 0 = no rule matched.
    */
  def decide(groups: Vector[Group], agent: String, target: String): (Boolean, Int) = {
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(tok))
    val selected = if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
    val matching = selected.flatMap(_.rules).filter(_.matches(target))
    if (matching.isEmpty) (true, 0)
    else {
      val maxLen = matching.map(_.len).max
      val best = matching.filter(_.len == maxLen)
      (best.exists(_.allow), maxLen)
    }
  }
}
