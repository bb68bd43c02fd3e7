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

  private def directivesOf(text: String): (Option[Long], Seq[String]) = {
    val r = Seq(text).toDF("t")
      .select(TextExpressions.robotsDirectives(col("t")).as("d"))
      .select(col("d.crawl_delay_ms"), col("d.sitemaps"))
      .collect().head
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      r.getSeq[String](1))
  }

  test("directives: crawl-delay is *-group-scoped, last wins, millis exact") {
    // plain seconds
    assert(directivesOf("User-agent: *\nCrawl-delay: 5\n") ===
      ((Some(5000L), Seq.empty)))
    // fractional seconds honored, half-up millis
    assert(directivesOf("User-agent: *\nCrawl-delay: 0.5\n")._1 === Some(500L))
    assert(directivesOf("User-agent: *\nCrawl-delay: 1.0005\n")._1 === Some(1001L))
    // another agent's group contributes NOTHING
    assert(directivesOf("User-agent: bingbot\nCrawl-delay: 9\n")._1 === None)
    // later *-group value overrides the earlier one
    assert(directivesOf(
      "User-agent: *\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 7\n")._1 ===
      Some(7000L))
    // unparseable / negative values are ignored (earlier value stands)
    assert(directivesOf(
      "User-agent: *\nCrawl-delay: 3\nCrawl-delay: fast\nCrawl-delay: -1\n")._1 ===
      Some(3000L))
    // crawl-delay closes the agent run exactly like robotsRules: the
    // second UA starts a NEW group, so its delay is not *-scoped
    assert(directivesOf(
      "User-agent: *\nCrawl-delay: 4\nUser-agent: botB\nCrawl-delay: 8\n")._1 ===
      Some(4000L))
  }

  test("directives: sitemaps are group-independent, ordered, colon-safe") {
    val txt =
      """Sitemap: https://h.example/a.xml
        |User-agent: botB
        |Disallow: /
        |Sitemap: https://h.example/b.xml  # comment
        |User-agent: *
        |Crawl-delay: 1
        |Sitemap: https://h.example/a.xml
        |""".stripMargin
    val (delay, maps) = directivesOf(txt)
    assert(delay === Some(1000L))
    // all three collected (incl. the one inside botB's group and the
    // duplicate), file order, URL colons intact
    assert(maps === Seq("https://h.example/a.xml", "https://h.example/b.xml",
      "https://h.example/a.xml"))
    // no star group: delay null, sitemaps still global
    assert(directivesOf("User-agent: botB\nCrawl-delay: 2\nSitemap: /s.xml\n") ===
      ((None, Seq("/s.xml"))))
    // CRLF payloads (the wire form a crawler actually fetches): the
    // trailing \r must not leak into values or break group formation
    assert(directivesOf(
      "User-agent: *\r\nCrawl-delay: 3\r\nSitemap: https://h.example/s.xml\r\n") ===
      ((Some(3000L), Seq("https://h.example/s.xml"))))
    assert(rulesOf("User-agent: *\r\nDisallow: /p\r\nAllow: /p/ok\r\n") ===
      Seq((false, "/p"), (true, "/p/ok")))
    // SQL surface
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_robots_directives('User-agent: *\nCrawl-delay: 2.25\n').crawl_delay_ms")
      .collect().head.getLong(0)
    assert(viaSql === 2250L)
  }
}
