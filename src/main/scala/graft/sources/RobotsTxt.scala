package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt evaluation — the crawl-side counterpart of the WARC
  * ingestion family (x100/x101/x106): before a URL enters the frontier,
  * the fetcher must evaluate the site's robots rules for its agent.
  *
  * Implements the RFC 9309 core: `User-agent` lines open a group
  * (consecutive UA lines share the group), `Allow`/`Disallow` rules
  * attach to the open group, comments (`#`) and unknown directives
  * (Sitemap etc.) are skipped — `Crawl-delay`, though non-standard, is
  * parsed per group into politeness hints (x111) — and matching is
  * case-insensitive on directive names. Evaluation: pick the MOST SPECIFIC group (exact
  * agent match beats `*`; rules never merge across groups), then the
  * LONGEST matching rule wins (most octets in the PATTERN, the RFC's
  * "most specific match" and what major crawlers implement), with Allow
  * beating Disallow on equal length; no match ⇒ allowed; an empty
  * Disallow value ⇒ allow all. Rule paths support the RFC's wildcards:
  * `*` matches any character run (including `/`), a trailing `$`
  * anchors the match at end-of-path; everywhere else `$` is literal —
  * real robots.txt files use both heavily (`Disallow: .pdf$`-style
  * extension rules, written with a leading slash-star).
  *
  * 100 TB shape: robots bodies are tiny and per-site — the parsed rule
  * list broadcasts (sites × rules rows), the URL stream is filtered
  * map-side with one narrow evaluation per URL; no exchange beyond the
  * site join the crawler already does.
  */
object RobotsTxt {

  private[graft] case class RobotsRule(agent: String, allow: Boolean,
      prefix: String)
  private[graft] case class RobotsDelay(agent: String, delayMs: Long)

  /** Parse one robots.txt body into (agent, allow, prefix) rules. */
  private[graft] def parseRobots(content: String): Seq[RobotsRule] =
    parseRobotsAll(content)._1

  /** One-pass parse of rules AND per-group `Crawl-delay` directives
    * (non-standard but near-universal; decimal seconds → integer ms).
    * A malformed delay value is skipped like any unknown directive —
    * politeness hints must not fail admission parsing.
    */
  private[graft] def parseRobotsAll(content: String)
      : (Seq[RobotsRule], Seq[RobotsDelay]) = {
    val out = scala.collection.mutable.ArrayBuffer[RobotsRule]()
    val delays = scala.collection.mutable.ArrayBuffer[RobotsDelay]()
    var agents = List.empty[String]
    var groupOpen = false // true while UA lines accumulate, before rules
    content.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (groupOpen) agents ::= value.toLowerCase
              else { agents = List(value.toLowerCase); groupOpen = true }
              // empty-prefix sentinel: records that this agent HAS a
              // group, so an agent with a declared-but-empty group does
              // not fall through to * (evaluate never reports it)
              out += RobotsRule(value.toLowerCase, allow = true, "")
            case "allow" | "disallow" =>
              groupOpen = false
              require(agents.nonEmpty, "robots: rule before any User-agent")
              if (value.nonEmpty)
                agents.foreach(a => out += RobotsRule(a, key == "allow", value))
              // empty Disallow/Allow: no rule — allow-all, per the RFC
            case "crawl-delay" =>
              // ends UA accumulation like every other non-group record
              groupOpen = false
              if (agents.nonEmpty && value.matches("\\d+(\\.\\d+)?") &&
                // out-of-range values are malformed hints too: a huge
                // decimal would wrap .toLong into garbage (possibly
                // negative) delays; nothing sane waits more than a day
                BigDecimal(value) <= BigDecimal(86400)) {
                val ms = (BigDecimal(value) * 1000).toLong
                agents.foreach(a => delays += RobotsDelay(a, ms))
              }
            case _ =>
              // Sitemap, unknown: skipped — but they END User-agent
              // accumulation (RFC 9309: other records are not group
              // members), else two groups separated only by such a line
              // would merge
              groupOpen = false
          }
        }
      }
    }
    (out.toSeq, delays.toSeq)
  }

  /** Effective crawl delay for an agent, with group selection
    * genuinely mirroring [[evaluate]]: if the agent has its OWN group
    * (in `rules` — the empty-prefix sentinel marks declared groups),
    * only that group's delay applies (its absence means the default,
    * NOT the `*` group's value — RFC 9309 groups never merge); only an
    * agent with no group at all falls through to `*`.
    */
  private[graft] def crawlDelayMs(rules: Seq[RobotsRule],
                                  delays: Seq[RobotsDelay], agent: String,
                                  defaultMs: Long = 1000L): Long = {
    val a = agent.toLowerCase
    val own = delays.find(_.agent == a)
    val fromGroup =
      if (rules.exists(_.agent == a)) own
      else own.orElse(delays.find(_.agent == "*"))
    fromGroup.map(_.delayMs).getOrElse(defaultMs)
  }

  /** `Sitemap:` directives of a robots.txt body — group-INDEPENDENT
    * per RFC 9309 §2.2.4 / sitemaps.org: they apply to the whole site
    * regardless of which group they appear near, which is how a
    * crawler bootstraps discovery (robots → sitemap set → x108 parse →
    * x109 frontier) before fetching anything else. The value keeps its
    * scheme-colon: only the FIRST colon separates the directive.
    */
  private[graft] def sitemapUrls(content: String): Seq[String] =
    content.split("\n").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(c + 1).trim).filter(_.nonEmpty)
      else None
    }

  /** Does `pattern` match a prefix of `path`? `*` matches any character
    * run (greedy-leftmost existence scan — complete for ordered literal
    * segments), a trailing `$` anchors at end-of-path, and without `$`
    * the pattern only needs to consume a prefix. RFC 9309 §2.2.3.
    */
  private[graft] def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1) // literal segments between '*'s
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      if (i == parts.length - 1 && anchored)
        // final segment must align to the END of the path, at/after pos
        return path.length >= pos + p.length && path.endsWith(p)
      if (p.nonEmpty) {
        val k = path.indexOf(p, pos)
        if (k < 0) return false
        pos = k + p.length
      } // empty segment = '**' run or trailing '*': free
      i += 1
    }
    // no '*' at all: plain prefix, or exact match when '$'-anchored
    if (anchored) pos == path.length else true
  }

  /** Evaluate one path for one agent: (allowed, matched-rule-or-empty). */
  private[graft] def evaluate(rules: Seq[RobotsRule], agent: String,
                              path: String): (Boolean, String) = {
    val a = agent.toLowerCase
    val group =
      if (rules.exists(_.agent == a)) rules.filter(_.agent == a)
      else rules.filter(_.agent == "*")
    val hits = group.filter(r => r.prefix.nonEmpty && ruleMatches(r.prefix, path))
    if (hits.isEmpty) (true, "")
    else {
      // most octets in the pattern wins; allow beats disallow on ties
      val best = hits.maxBy(r => (r.prefix.length, r.allow))
      (best.allow, (if (best.allow) "allow:" else "disallow:") + best.prefix)
    }
  }

  // Fixture arithmetic (oracle re-derives everything): site s = id%7;
  // robots per site — a `*` group disallowing /p{s%4} with the longer
  // Allow exception /p{s%4}/q{s%3}, PLUS the RFC wildcards: a global
  // `Disallow: /p*/q2$` (pattern length 7 — outranks the length-6 Allow
  // exception, so every j==2 path is disallowed for anybot) and an
  // `Allow: /p2*` (length 4 — outranks the length-3 Disallow when
  // s%4==2, and admits stray /p2 paths). The `graftbot` group disallows
  // /p{(s+1)%4} with exception /p{(s+1)%4}/q{(s+1)%3} plus its own
  // `Disallow: /p*/q1$`. URLs: k=3 per doc, path /p{(id+j)%4}/q{j}.
  // The gate evaluates BOTH agents, so group selection (exact beats *,
  // groups never merge) AND wildcard precedence-by-pattern-length are
  // what the hash checks.
  private[graft] def robotsOf(site: Long): String = {
    val s4 = site % 4; val s3 = site % 3
    val g4 = (site + 1) % 4; val g3 = (site + 1) % 3
    // the /$site rules apply to the numeric /{id}/{j} path space the
    // frontier gate (x109) crawls; they can never match x107's /p
    // paths, and the /p wildcard rules never match numeric paths
    s"""# site $site policy
       |User-agent: *
       |Disallow: /p$s4
       |Allow: /p$s4/q$s3
       |Disallow: /p*/q2$$
       |Allow: /p2*
       |Disallow: /$site
       |Allow: /$site$site
       |Crawl-delay: ${site % 3 + 1}.5
       |
       |User-agent: graftbot
       |Disallow: /p$g4
       |Allow: /p$g4/q$g3
       |Disallow: /p*/q1$$
       |Crawl-delay: ${site % 2 + 1}
       |Sitemap: http://site$site.example/sitemap.xml
       |""".stripMargin
  }

  /** x107 gate: per (doc, url, agent) — allowed flag + the matched rule. */
  def robotsTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val site = id % 7
        val rules = parseRobots(robotsOf(site))
        (0 until 3).flatMap { j =>
          val path = s"/p${(id + j) % 4}/q$j"
          Seq("anybot", "GraftBot").map { agent =>
            val (ok, rule) = evaluate(rules, agent, path)
            (id, j, agent, path, if (ok) 1 else 0, rule)
          }
        }
      }
      .toDF("doc_id", "j", "agent", "path", "allowed", "matched")
  }
}
