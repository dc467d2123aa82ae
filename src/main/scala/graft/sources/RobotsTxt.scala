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
  * (Crawl-delay, Sitemap) are skipped, matching is case-insensitive on
  * directive names. Evaluation: pick the MOST SPECIFIC group (exact
  * agent match beats `*`; rules never merge across groups), then the
  * LONGEST matching rule prefix wins, with Allow beating Disallow on
  * equal length; no match ⇒ allowed; an empty Disallow value ⇒ allow
  * all. The RFC's `*`/`$` wildcards inside rule PATHS are out of scope
  * and reject loudly by name rather than mis-matching.
  *
  * 100 TB shape: robots bodies are tiny and per-site — the parsed rule
  * list broadcasts (sites × rules rows), the URL stream is filtered
  * map-side with one narrow evaluation per URL; no exchange beyond the
  * site join the crawler already does.
  */
object RobotsTxt {

  private[graft] case class RobotsRule(agent: String, allow: Boolean,
      prefix: String)

  /** Parse one robots.txt body into (agent, allow, prefix) rules. */
  private[graft] def parseRobots(content: String): Seq[RobotsRule] = {
    val out = scala.collection.mutable.ArrayBuffer[RobotsRule]()
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
              if (value.nonEmpty) {
                require(!value.contains('*') && !value.contains('$'),
                  s"robots: wildcard rules unsupported ('$value')")
                agents.foreach(a => out += RobotsRule(a, key == "allow", value))
              } // empty Disallow/Allow: no rule — allow-all, per the RFC
            case _ =>
              // Crawl-delay, Sitemap, unknown: skipped — but they END
              // User-agent accumulation (RFC 9309: other records are not
              // group members), else two groups separated only by a
              // Crawl-delay line would merge
              groupOpen = false
          }
        }
      }
    }
    out.toSeq
  }

  /** Evaluate one path for one agent: (allowed, matched-rule-or-empty). */
  private[graft] def evaluate(rules: Seq[RobotsRule], agent: String,
                              path: String): (Boolean, String) = {
    val a = agent.toLowerCase
    val group =
      if (rules.exists(_.agent == a)) rules.filter(_.agent == a)
      else rules.filter(_.agent == "*")
    val hits = group.filter(r => r.prefix.nonEmpty && path.startsWith(r.prefix))
    if (hits.isEmpty) (true, "")
    else {
      // longest prefix wins; allow beats disallow on equal length
      val best = hits.maxBy(r => (r.prefix.length, r.allow))
      (best.allow, (if (best.allow) "allow:" else "disallow:") + best.prefix)
    }
  }

  // Fixture arithmetic (oracle re-derives everything): site s = id%7;
  // robots per site — a `*` group disallowing /p{s%4} with the longer
  // Allow exception /p{s%4}/q{s%3}, and a `graftbot` group disallowing
  // /p{(s+1)%4} with exception /p{(s+1)%4}/q{(s+1)%3}. URLs: k=3 per
  // doc, path /p{(id+j)%4}/q{j}. The gate evaluates BOTH agents, so the
  // group-selection rule (exact beats *, groups never merge) is what
  // the hash checks.
  private[graft] def robotsOf(site: Long): String = {
    val s4 = site % 4; val s3 = site % 3
    val g4 = (site + 1) % 4; val g3 = (site + 1) % 3
    // the /$site rules apply to the numeric /{id}/{j} path space the
    // frontier gate (x109) crawls; they can never match x107's /p paths
    s"""# site $site policy
       |User-agent: *
       |Disallow: /p$s4
       |Allow: /p$s4/q$s3
       |Disallow: /$site
       |Allow: /$site$site
       |Crawl-delay: 5
       |
       |User-agent: graftbot
       |Disallow: /p$g4
       |Allow: /p$g4/q$g3
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
