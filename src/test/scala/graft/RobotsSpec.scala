package graft

import graft.sources.RobotsTxt

/** robots.txt parser/evaluator: RFC 9309 group semantics, precedence
  * rules, and the documented wildcard reject.
  */
class RobotsSpec extends GraftSparkSpec {

  test("robots: groups never merge; exact agent beats *; UA lines stack") {
    val rules = RobotsTxt.parseRobots(
      """User-agent: alpha
        |User-agent: beta
        |Disallow: /x
        |
        |User-agent: *
        |Disallow: /y
        |""".stripMargin)
    // stacked UA lines share the group
    assert(RobotsTxt.evaluate(rules, "alpha", "/x/1")._1 === false)
    assert(RobotsTxt.evaluate(rules, "BETA", "/x/1")._1 === false)
    // exact group selected -> the * group's /y rule does NOT apply
    assert(RobotsTxt.evaluate(rules, "alpha", "/y/1")._1 === true)
    // unknown agent falls through to *
    assert(RobotsTxt.evaluate(rules, "other", "/y/1")._1 === false)
    assert(RobotsTxt.evaluate(rules, "other", "/x/1")._1 === true)
    // a non-UA directive ENDS User-agent accumulation: two groups
    // separated only by Crawl-delay must not merge (RFC 9309 — other
    // records are not group members)
    val sep = RobotsTxt.parseRobots(
      "User-agent: a\nCrawl-delay: 10\nUser-agent: *\nDisallow: /\n")
    assert(RobotsTxt.evaluate(sep, "a", "/anything")._1 === true,
      "agent a's group has no rules; * group's Disallow must not leak in")
    assert(RobotsTxt.evaluate(sep, "other", "/anything")._1 === false)
  }

  test("robots: longest prefix wins; allow beats disallow on equal length") {
    val rules = RobotsTxt.parseRobots(
      """User-agent: *
        |Disallow: /a
        |Allow: /a/pub
        |Disallow: /b
        |Allow: /b
        |""".stripMargin)
    assert(RobotsTxt.evaluate(rules, "x", "/a/private") ===
      ((false, "disallow:/a")))
    assert(RobotsTxt.evaluate(rules, "x", "/a/pub/file") ===
      ((true, "allow:/a/pub")))
    // equal length: allow wins
    assert(RobotsTxt.evaluate(rules, "x", "/b/1")._1 === true)
    // no match: allowed with empty rule
    assert(RobotsTxt.evaluate(rules, "x", "/c") === ((true, "")))
  }

  test("sitemap: urlset and sitemapindex parse; entities decode; priority is ppm") {
    import graft.sources.Sitemap
    val f = Sitemap.parseSitemap(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://x/a?p=1&amp;q=2</loc><lastmod>2026-02-03</lastmod>
        |    <changefreq>daily</changefreq><priority>1</priority></url>
        |  <url><loc>http://x/b</loc><priority>0.85</priority></url>
        |</urlset>""".stripMargin)
    assert(f.kind === "urlset")
    assert(f.entries.map(_.loc) === Seq("http://x/a?p=1&q=2", "http://x/b"))
    assert(f.entries.map(_.priorityPpm) === Seq(1000000L, 850000L))
    assert(f.entries.head.lastmod === "2026-02-03")
    val idx = Sitemap.parseSitemap(
      """<sitemapindex><sitemap><loc>http://x/s1.xml</loc>
        |<lastmod>2026-01-01</lastmod></sitemap></sitemapindex>""".stripMargin)
    assert(idx.kind === "sitemapindex")
    assert(idx.entries.map(_.loc) === Seq("http://x/s1.xml"))
    // namespace-prefixed tags resolve by local name
    val ns = Sitemap.parseSitemap(
      "<sm:urlset xmlns:sm=\"u\"><sm:url><sm:loc>http://x/c</sm:loc>" +
        "</sm:url></sm:urlset>")
    assert(ns.entries.map(_.loc) === Seq("http://x/c"))
  }

  test("sitemap: out-of-subset input rejects loudly by name") {
    import graft.sources.Sitemap
    val e1 = intercept[IllegalArgumentException] {
      Sitemap.parseSitemap("<rss><channel/></rss>")
    }
    assert(e1.getMessage.contains("unexpected root"))
    val e2 = intercept[IllegalArgumentException] {
      Sitemap.parseSitemap("<urlset><url><loc>x</url></loc></urlset>")
    }
    assert(e2.getMessage.contains("mismatched"))
    val e3 = intercept[IllegalArgumentException] {
      Sitemap.parseSitemap("<urlset><![CDATA[x]]></urlset>")
    }
    assert(e3.getMessage.contains("unsupported in this subset"))
    val e4 = intercept[IllegalArgumentException] {
      Sitemap.parseSitemap("<urlset><url><loc>x</loc>")
    }
    assert(e4.getMessage.contains("unclosed"))
  }

  test("robots: comments, unknown directives, empty disallow, rule-before-group reject") {
    val rules = RobotsTxt.parseRobots(
      """# policy
        |User-agent: * # everyone
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: http://x/s.xml
        |""".stripMargin)
    // empty Disallow = allow all: only the group-existence sentinel remains
    assert(rules.forall(_.prefix.isEmpty))
    assert(RobotsTxt.evaluate(rules, "x", "/anything") === ((true, "")))
    val e2 = intercept[IllegalArgumentException] {
      RobotsTxt.parseRobots("Disallow: /x\n")
    }
    assert(e2.getMessage.contains("before any User-agent"))
  }

  test("robots: Sitemap directives extract group-independently, first-colon split, comments stripped") {
    assert(RobotsTxt.sitemapUrls(RobotsTxt.robotsOf(3)) ===
      Seq("http://site3.example/sitemap.xml"))
    val multi = RobotsTxt.sitemapUrls(
      """User-agent: *
        |Disallow: /x
        |Sitemap: https://a.example/s1.xml # primary
        |
        |SITEMAP: https://a.example/s2.xml.gz
        |Sitemap:
        |""".stripMargin)
    assert(multi === Seq("https://a.example/s1.xml",
      "https://a.example/s2.xml.gz")) // empty value dropped, case-blind
  }

  test("robots: crawl-delay parses per group (decimal seconds to ms); groups never merge") {
    val (rules, delays) = RobotsTxt.parseRobotsAll(
      """User-agent: *
        |Disallow: /x
        |Crawl-delay: 2.5
        |
        |User-agent: fastbot
        |Crawl-delay: 0.1
        |Allow: /
        |
        |User-agent: quietbot
        |Disallow: /z
        |""".stripMargin)
    assert(RobotsTxt.crawlDelayMs(rules, delays, "FastBot") === 100L)
    assert(RobotsTxt.crawlDelayMs(rules, delays, "other") === 2500L)
    // an agent with its OWN group but no delay gets the DEFAULT, not
    // the * group's value (groups never merge — the evaluate rule)
    assert(RobotsTxt.crawlDelayMs(rules, delays, "quietbot") === 1000L)
    // ... including a group declared ONLY via an empty Disallow
    // (allow-all): the user-agent line's sentinel marks the group as
    // declared, so the * delay must NOT leak into it (r16 advice)
    val (er, ed) = RobotsTxt.parseRobotsAll(
      """User-agent: *
        |Crawl-delay: 7
        |Disallow: /x
        |
        |User-agent: emptybot
        |Disallow:
        |""".stripMargin)
    assert(RobotsTxt.crawlDelayMs(er, ed, "emptybot") === 1000L)
    assert(RobotsTxt.crawlDelayMs(er, ed, "someoneelse") === 7000L)
    // absent everywhere: the caller's default
    val (nr, none) = RobotsTxt.parseRobotsAll("User-agent: *\nDisallow:\n")
    assert(RobotsTxt.crawlDelayMs(nr, none, "x") === 1000L)
    // malformed or absurd delays are skipped hints, never failures and
    // never wrapped negatives
    val (rules2, bad) = RobotsTxt.parseRobotsAll(
      "User-agent: *\nCrawl-delay: fast\n" +
        "Crawl-delay: 99999999999999999999\nDisallow: /y\n")
    assert(bad.isEmpty)
    assert(RobotsTxt.evaluate(rules2, "x", "/y/z")._1 === false)
  }

  test("robots: RFC 9309 wildcards — '*' any-run, trailing '$' anchor, pattern-length precedence") {
    import RobotsTxt.ruleMatches
    // the RFC/Google reference examples for /*.php
    assert(ruleMatches("/*.php", "/index.php"))
    assert(ruleMatches("/*.php", "/folder/filename.php"))
    assert(ruleMatches("/*.php", "/folder/any.php.file.html"))
    assert(ruleMatches("/*.php", "/index.php5")) // '.php' occurs mid-path
    assert(!ruleMatches("/*.php", "/windows.PHP")) // paths are case-sensitive
    assert(!ruleMatches("/*.php", "/"))
    // trailing '$' anchors at end-of-path
    assert(ruleMatches("/*.php$", "/filename.php"))
    assert(!ruleMatches("/*.php$", "/filename.php?x"))
    assert(!ruleMatches("/*.php$", "/filename.php5"))
    // literal segments between stars must appear in order
    assert(ruleMatches("/fish*.php", "/fishheads/catfish.php?p"))
    assert(!ruleMatches("/fish*.php", "/catfish.php"))
    // trailing '*' is a no-op on prefix semantics
    assert(ruleMatches("/fish*", "/fish"))
    assert(ruleMatches("/fish*", "/fishheads"))
    // '$' without '*': exact-path match
    assert(ruleMatches("/foo$", "/foo"))
    assert(!ruleMatches("/foo$", "/foo/bar"))
    // '$' anywhere but the end is a literal character
    assert(ruleMatches("/a$b", "/a$b/c"))
    // '*$' tail: anything to end (equivalent to the bare prefix)
    assert(ruleMatches("/p*$", "/p/whatever"))
    // precedence: most octets in the PATTERN wins, allow wins ties
    val rules = RobotsTxt.parseRobots(
      """User-agent: *
        |Disallow: /p
        |Allow: /p*/q$
        |""".stripMargin)
    assert(RobotsTxt.evaluate(rules, "bot", "/p1/q") === ((true, "allow:/p*/q$")))
    assert(RobotsTxt.evaluate(rules, "bot", "/p1/qq") === ((false, "disallow:/p")))
  }
}
