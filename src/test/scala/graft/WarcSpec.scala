package graft

import org.apache.spark.sql.functions._

import graft.llm.Warc

/** [[graft.llm.Warc]] — Content-Length-driven WARC splitting and field
  * extraction: the adversarial payload-contains-"WARC/1.0" case, the
  * truncation keep-direction, the header/envelope separation, and the
  * warc → html → text chain end-to-end. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val CRLF = "\r\n"

  private def record(tpe: String, payload: String,
                     extra: Seq[(String, String)] = Nil,
                     declaredLen: Option[Int] = None): String = {
    val hdrs = Seq("WARC-Type" -> tpe) ++ extra ++
      Seq("Content-Length" ->
        declaredLen.getOrElse(payload.getBytes("UTF-8").length).toString)
    "WARC/1.0" + CRLF +
      hdrs.map { case (k, v) => s"$k: $v" }.mkString(CRLF) + CRLF + CRLF +
      payload
  }
  private def stream(recs: String*): Array[Byte] =
    recs.mkString("", CRLF + CRLF, CRLF + CRLF).getBytes("UTF-8")

  private def parse(bytes: Array[Byte]) =
    Warc.parseRecords(Seq((0L, bytes)).toDF("doc_id", "warc"))

  test("a payload CONTAINING 'WARC/1.0' never starts a phantom record") {
    // the page quotes a full WARC header block — a regex splitter would
    // see three records; the Content-Length walk sees two
    val evil = "look: WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      CRLF + "fake body"
    val s = stream(
      record("response", "HTTP/1.1 200 OK" + CRLF + CRLF + evil,
        Seq("WARC-Target-URI" -> "https://a.com/x")),
      record("response", "HTTP/1.1 200 OK" + CRLF + CRLF + "real second",
        Seq("WARC-Target-URI" -> "https://b.com/y")))
    val rows = parse(s).orderBy("rec_idx").collect()
    assert(rows.length == 2, s"expected 2 records, got ${rows.length}")
    assert(rows(0).getAs[String]("body") == evil) // quoted block intact
    assert(rows(1).getAs[String]("body") == "real second")
    assert(rows.forall(_.getAs[Boolean]("len_ok")))
  }

  test("truncated tail degrades to fewer records, never corrupt ones") {
    val good = record("response",
      "HTTP/1.1 200 OK" + CRLF + CRLF + "complete page")
    val cut = record("response",
      "HTTP/1.1 200 OK" + CRLF + CRLF + "this body never arrives",
      declaredLen = Some(10000)) // declares more bytes than exist
    val rows = parse((good + CRLF + CRLF + cut).getBytes("UTF-8")).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("body") == "complete page")
  }

  test("WARC headers never bleed from the HTTP envelope; fields parse per record") {
    val s = stream(
      record("warcinfo", "software: x"),
      record("response",
        "HTTP/1.1 404 Not Found" + CRLF +
          "Content-Type: text/plain" + CRLF +
          "Content-Length: 999999" + CRLF + CRLF + // HTTP CL ≠ WARC CL
          "gone",
        Seq("WARC-Target-URI" -> "https://c.net/z",
          "WARC-Record-ID" -> "<urn:uuid:42>")))
    val rows = parse(s).orderBy("rec_idx").collect()
    val info = rows(0); val resp = rows(1)
    assert(info.getAs[String]("warc_type") == "warcinfo" &&
      info.getAs[String]("http_status") == "" &&
      info.getAs[String]("body") == "software: x" &&
      info.getAs[Boolean]("len_ok"))
    assert(resp.getAs[String]("warc_type") == "response" &&
      resp.getAs[String]("http_status") == "404" &&
      resp.getAs[String]("content_type") == "text/plain" &&
      resp.getAs[String]("target_uri") == "https://c.net/z" &&
      resp.getAs[String]("record_id") == "<urn:uuid:42>" &&
      resp.getAs[String]("body") == "gone")
    // the WARC content_length is the record's, not the envelope's lie
    assert(resp.getAs[Long]("content_length") < 999999L)
  }

  test("len_ok flags payloads whose text view is not byte-faithful (binary in a text pipe)") {
    val payload = Array[Byte]('H', 'T', 'T', 'P', '/', '1', '.', '1', ' ',
      '2', '0', '0', ' ', 'O', 'K', '\r', '\n', '\r', '\n',
      0xff.toByte, 0xfe.toByte, 'x') // invalid UTF-8 body
    val hdr = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"Content-Length: ${payload.length}" + CRLF + CRLF).getBytes("UTF-8")
    val rows = parse(hdr ++ payload ++ (CRLF + CRLF).getBytes("UTF-8")).collect()
    assert(rows.length == 1 && !rows(0).getAs[Boolean]("len_ok"),
      "mojibake payload must not read as length-faithful text")
  }

  test("responses(): only intact 200 text/html records; chains into Extract") {
    val page = "<html><body><nav><a href='/'>Home</a> <a href='/m'>More</a>" +
      "</nav><p>actual article text here</p></body></html>"
    val s = stream(
      record("warcinfo", "software: x"),
      record("response",
        "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF + CRLF +
          page, Seq("WARC-Target-URI" -> "https://site.com/a")),
      record("response",
        "HTTP/1.1 301 Moved" + CRLF + "Content-Type: text/html" + CRLF +
          CRLF + "<a href='/n'>moved</a>",
        Seq("WARC-Target-URI" -> "https://site.com/old")),
      record("response",
        "HTTP/1.1 200 OK" + CRLF + "Content-Type: image/png" + CRLF + CRLF +
          "PNGBYTES", Seq("WARC-Target-URI" -> "https://site.com/i.png")))
    val resp = Warc.responses(Seq((7L, s)).toDF("doc_id", "warc"))
    val got = resp.collect()
    assert(got.length == 1 && got(0).getAs[String]("url") == "https://site.com/a")
    // the full chain: warc -> html -> main content
    val text = graft.llm.Extract.mainContent(resp, "html")
      .select("text").as[String].head()
    assert(text == "actual article text here")
  }

  test("robotsTxt(): the policy table comes from the crawl itself; " +
    "re-fetch replicas tie-break deterministically; chains into Robots") {
    val policy = "User-agent: *\nDisallow: /private\n"
    val s1 = stream(
      record("response", "HTTP/1.1 200 OK" + CRLF +
        "Content-Type: text/plain" + CRLF + CRLF + policy,
        Seq("WARC-Target-URI" -> "https://Site.com/robots.txt")),
      record("response", "HTTP/1.1 200 OK" + CRLF +
        "Content-Type: text/html" + CRLF + CRLF + "<p>not robots</p>",
        Seq("WARC-Target-URI" -> "https://site.com/robots.txt.html")))
    // a later re-fetch of the same host returns a different body: the
    // lexicographically least must win regardless of arrival order
    val s2 = stream(
      record("response", "HTTP/1.1 200 OK" + CRLF +
        "Content-Type: text/plain" + CRLF + CRLF + "zzz-later-policy",
        Seq("WARC-Target-URI" -> "https://site.com/robots.txt")),
      record("response", "HTTP/1.1 404 Not Found" + CRLF + CRLF + "nope",
        Seq("WARC-Target-URI" -> "https://other.com/robots.txt")))
    val rt = Warc.robotsTxt(
      Seq((1L, s1), (2L, s2)).toDF("doc_id", "warc")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // host lowercased, one row, min body; the 404 host and the
    // robots.txt.html path never enter
    assert(rt == Map("site.com" -> policy))
    // and the table drives Robots end-to-end
    val verdicts = graft.llm.Robots.allowed(
      Seq((1L, "https://site.com/private/x"),
        (2L, "https://site.com/pub")).toDF("doc_id", "url"),
      graft.llm.Robots.rules(
        Warc.robotsTxt(Seq((1L, s1), (2L, s2)).toDF("doc_id", "warc"))))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts == Map(1L -> false, 2L -> true))
  }
}
