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

  test("robots: comments, unknown directives, empty disallow, wildcard reject") {
    val rules = RobotsTxt.parseRobots(
      """# policy
        |User-agent: * # everyone
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: http://x/s.xml
        |""".stripMargin)
    assert(rules.isEmpty) // empty Disallow = allow all
    assert(RobotsTxt.evaluate(rules, "x", "/anything")._1 === true)
    val e = intercept[IllegalArgumentException] {
      RobotsTxt.parseRobots("User-agent: *\nDisallow: /*.pdf\n")
    }
    assert(e.getMessage.contains("wildcard"))
    val e2 = intercept[IllegalArgumentException] {
      RobotsTxt.parseRobots("Disallow: /x\n")
    }
    assert(e2.getMessage.contains("before any User-agent"))
  }
}
