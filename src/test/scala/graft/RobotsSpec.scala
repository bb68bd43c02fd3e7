package graft

import graft.expr.TextExpressions
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt semantics: group formation, rule extraction for
  * the `*` agent, and longest-prefix-match decisions. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(text: String): Seq[(Boolean, String)] =
    Seq(text).toDF("t")
      .select(TextExpressions.robotsRules(col("t")).as("r"))
      .select(explode(col("r")).as("x"))
      .select(col("x.allow"), col("x.prefix"))
      .as[(Boolean, String)].collect().toSeq

  private def decide(text: String, path: String): Boolean =
    Seq((text, path)).toDF("t", "p")
      .select(TextExpressions.robotsAllowed(
        TextExpressions.robotsRules(col("t")), col("p")).as("d"))
      .as[Boolean].collect().head

  test("group formation: stacked agents, rule lines close the run, comments drop") {
    val txt =
      """# policy
        |User-agent: botA
        |User-agent: *
        |Disallow: /a   # trailing comment
        |Allow: /a/ok
        |
        |User-agent: botB
        |Disallow: /b
        |""".stripMargin
    // the * group stacks with botA; botB's group contributes nothing
    assert(rulesOf(txt) === Seq((false, "/a"), (true, "/a/ok")))
    // a robots whose only groups name other agents yields EMPTY rules
    assert(rulesOf("User-agent: botB\nDisallow: /\n") === Seq.empty)
    // empty Disallow: value disallows nothing (dropped)
    assert(rulesOf("User-agent: *\nDisallow:\nAllow: /x\n") === Seq((true, "/x")))
    // crawl-delay closes the agent run: the SECOND UA starts a new group
    assert(rulesOf(
      "User-agent: *\nCrawl-delay: 5\nUser-agent: botB\nDisallow: /b\n") ===
      Seq.empty)
  }

  test("decisions: longest prefix wins, equal-length tie allows, no match allows") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    assert(decide(txt, "/p/x") === false)   // /p wins (only match)
    assert(decide(txt, "/p/ok/deep") === true) // /p/ok longer than /p
    assert(decide(txt, "/other") === true)  // nothing matches
    // equal-length tie -> allow
    assert(decide("User-agent: *\nDisallow: /p\nAllow: /p\n", "/p/x") === true)
    // digit trap: Allow /p1 is a PREFIX of /p12
    val digits = "User-agent: *\nDisallow: /p\nAllow: /p1\n"
    assert(decide(digits, "/p12") === true)
    assert(decide(digits, "/p2") === false)
    // no * group at all -> empty rules -> allowed
    assert(decide("User-agent: otherbot\nDisallow: /\n", "/anything") === true)
  }

  test("RFC 9309 patterns: * wildcards and $ end anchors") {
    import TextExpressions.robotsMatches
    assert(robotsMatches("/a/b/c.pdf", "/a/*/c.pdf"))
    assert(!robotsMatches("/a/c.pdf", "/a/*/c.pdf")) // '*' can't rewind the prefix
    assert(robotsMatches("/x/file.pdf", "/*.pdf"))
    assert(!robotsMatches("/x/file.pdfx", "/*.pdf$"))
    assert(robotsMatches("/x/file.pdf", "/*.pdf$"))
    assert(robotsMatches("/p", "/p$"))
    assert(!robotsMatches("/p/q", "/p$"))
    assert(robotsMatches("/any/thing", "/*"))
    assert(robotsMatches("/a*lit", "/a*lit")) // '*' in path is still literal there
    assert(robotsMatches("/abc", "/a*b*c$"))
    assert(!robotsMatches("/acb", "/a*b*c$"))
    // decision: wildcard disallow beaten by a LONGER wildcard allow
    val txt = "User-agent: *\nDisallow: /*.pdf$\nAllow: /ok/*.pdf$\n"
    assert(decide(txt, "/x/y.pdf") === false)
    assert(decide(txt, "/ok/y.pdf") === true)
    assert(decide(txt, "/x/y.html") === true) // nothing matches
  }
}
