package graft

import graft.llm.Robots

/** [[graft.llm.Robots]] — RFC 9309 semantics on hand-built files:
  * longest-match-wins with Allow on ties, wildcard/`$` translation,
  * metachar escaping, group selection (exact agent beats `*`,
  * consecutive UA lines share rules, orphans drop), and the no-robots /
  * no-match defaults. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(robots: Seq[(String, String)],
                       urls: Seq[(Long, String)],
                       agent: String = "*"): Map[Long, (Boolean, Long, Long)] = {
    val rf = Robots.rules(robots.toDF("host", "robots_txt"), agent)
    Robots.allowed(urls.toDF("doc_id", "url"), rf).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("longest match wins; Allow wins length ties; no match allows") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |Disallow: /tie
        |Allow: /tie
        |""".stripMargin
    val v = verdicts(Seq(("a.com", txt)), Seq(
      1L -> "https://a.com/private/x",
      2L -> "https://a.com/private/ok/y",
      3L -> "https://a.com/public",
      4L -> "https://a.com/tie"))
    assert(v(1L) == ((false, -1L, 8L)))  // only Disallow /private matches
    assert(v(2L) == ((true, 11L, 8L)))   // longer Allow overrides
    assert(v(3L) == ((true, -1L, -1L))) // nothing matches → allowed
    assert(v(4L) == ((true, 4L, 4L)))   // tie → Allow wins
  }

  test("wildcard * and trailing $ translate; metachars stay literal") {
    val txt =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /a+b
        |""".stripMargin
    val v = verdicts(Seq(("a.com", txt)), Seq(
      1L -> "https://a.com/docs/x.pdf",
      2L -> "https://a.com/docs/x.pdfx",  // $ anchors: not blocked
      3L -> "https://a.com/a+b/c",        // literal +
      4L -> "https://a.com/aab/c"))       // + must NOT mean 'one or more'
    assert(v(1L)._1 == false && v(2L)._1 == true)
    assert(v(3L)._1 == false && v(4L)._1 == true)
  }

  test("group selection: exact agent group wins over *, consecutive UA " +
    "lines share rules, orphan rules and comments drop") {
    val txt =
      """Disallow: /orphan
        |# a comment line
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /both
        |
        |User-agent: *
        |Disallow: /everyone
        |""".stripMargin
    // as graftbot: only the shared group applies (exact beats *)
    val g = verdicts(Seq(("a.com", txt)), Seq(
      1L -> "https://a.com/both/x", 2L -> "https://a.com/everyone/x",
      3L -> "https://a.com/orphan/x"), agent = "graftbot")
    assert(g(1L)._1 == false && g(2L)._1 == true && g(3L)._1 == true)
    // as anyone else: the * group
    val s = verdicts(Seq(("a.com", txt)), Seq(
      1L -> "https://a.com/both/x", 2L -> "https://a.com/everyone/x"))
    assert(s(1L)._1 == true && s(2L)._1 == false)
  }

  test("no robots.txt for a host allows everything; empty Disallow is " +
    "a no-op; bare host matches as path /") {
    val txt =
      """User-agent: *
        |Disallow:
        |Disallow: /
        |Allow: /welcome
        |""".stripMargin
    val v = verdicts(Seq(("a.com", txt)), Seq(
      1L -> "https://a.com",              // path '/': Disallow / blocks
      2L -> "https://a.com/welcome/x",    // longer Allow
      3L -> "https://no-robots.example/anything"))
    assert(v(1L) == ((false, -1L, 1L)))
    assert(v(2L)._1 == true)
    assert(v(3L) == ((true, -1L, -1L)))
  }
}
