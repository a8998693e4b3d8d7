package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC (ISO 28500) record parsing — the step BEFORE [[Extract]]: crawl
  * corpora arrive as WARC streams (Common Crawl's distribution format),
  * and this turns a raw stream column into one row per record with the
  * WARC headers, the HTTP envelope and the payload body split out —
  * `warc → html → text` closes the whole crawl-ingestion chain
  * ([[Extract.mainContent]] consumes the body, [[Curation.domainDedup]]
  * the target URI).
  *
  * Two layers, each the right tool:
  *
  *   1. RECORD SPLITTING is the native [[graft.functions.WarcSplit]]
  *      walk — Content-Length-driven, because a regex split corrupts
  *      the moment any payload CONTAINS "WARC/1.0" (spec-pinned
  *      adversarial case). Bytes in, record bytes out.
  *   2. FIELD EXTRACTION is an RE2-safe regex chain over the record —
  *      WARC headers read from the header BLOCK only (an HTTP payload
  *      has its own Content-Length/Content-Type lines that must not
  *      bleed in), HTTP status/type from the payload's envelope, body
  *      after the envelope's first blank line. Missing fields are ''
  *      (both engines' regexp_extract no-match convention), so the
  *      DuckDB oracle replays the chain verbatim.
  *
  * The parsed `body` column is the UTF-8 STRING view — right for the
  * text pipeline (HTML pages); byte-exact handling of binary payloads
  * (images in WARC) stops at the splitter's binary records, where a
  * media pipeline picks them up ([[Multimodal]]). `len_ok` audits each
  * record's declared Content-Length against its actual payload bytes —
  * the truncation check a resumable crawl fetch needs.
  *
  * Scale shape: one native split pass + posexplode (fan-out = records
  * per stream row) + per-record regex arithmetic — zero shuffles, a
  * pure map stage that pipelines into extraction. */
object Warc {

  private val HdrBlockRe = "(?s)^(.*?)\\r\\n\\r\\n"
  private val StripToPayloadRe = "(?s)^.*?\\r\\n\\r\\n"

  private def warcHeader(hdr: Column, name: String): Column =
    regexp_extract(hdr, s"(?im)^$name:[ \\t]*([^\\r\\n]*)", 1)

  /** Parse every record of the WARC stream in `rawCol` (binary):
    * one output row per record —
    * (doc_id, rec_idx, warc_type, record_id, target_uri, content_length,
    * http_status, content_type, body, len_ok). Rows with unparseable
    * streams simply contribute the records the splitter could walk
    * (malformed tails degrade to fewer records, never corrupt ones). */
  def parseRecords(docs: DataFrame, rawCol: String = "warc"): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.WarcSplit.register(spark)
    val recs = docs.select(col("doc_id"),
      posexplode(expr(s"${graft.functions.WarcSplit.FunctionName}($rawCol)"))
        .as(Seq("rec_idx", "rec")))
    val recStr = col("rec").cast("string")
    val hdr = regexp_extract(recStr, HdrBlockRe, 1)
    val payload = regexp_replace(recStr, StripToPayloadRe, "")
    val httpHdr = regexp_extract(payload, HdrBlockRe, 1)
    recs
      .withColumn("warc_type", warcHeader(hdr, "WARC-Type"))
      .withColumn("record_id", warcHeader(hdr, "WARC-Record-ID"))
      .withColumn("target_uri", warcHeader(hdr, "WARC-Target-URI"))
      .withColumn("content_length",
        warcHeader(hdr, "Content-Length").cast(LongType))
      .withColumn("http_status",
        regexp_extract(payload, "^HTTP/[0-9.]+ ([0-9]{3})", 1))
      .withColumn("content_type", warcHeader(httpHdr, "Content-Type"))
      // first blank line ends the HTTP envelope; a payload without one
      // (warcinfo, metadata records) passes through whole
      .withColumn("body", regexp_replace(payload, StripToPayloadRe, ""))
      .withColumn("len_ok",
        octet_length(payload) === col("content_length"))
      .select("doc_id", "rec_idx", "warc_type", "record_id", "target_uri",
        "content_length", "http_status", "content_type", "body", "len_ok")
  }

  /** The response records' pages, keyed for the downstream pipeline:
    * (doc_id, rec_idx, url, html) — the frame [[Extract.mainContent]]
    * and [[Curation.domainDedup]] consume. Only records that declare
    * themselves HTTP 200 text/html responses with intact lengths. */
  def responses(docs: DataFrame, rawCol: String = "warc"): DataFrame =
    parseRecords(docs, rawCol)
      .filter(col("warc_type") === "response" && col("http_status") === "200" &&
        col("content_type").startsWith("text/html") && col("len_ok"))
      .select(col("doc_id"), col("rec_idx"),
        col("target_uri").as("url"), col("body").as("html"))

  /** The (host, robots_txt) table [[Robots.rules]] consumes, sourced
    * from the crawl ITSELF: every intact 200 response whose target path
    * is exactly `/robots.txt` (crawlers fetch it before anything else,
    * so it is in the stream). One policy per host: if replicas disagree
    * (re-fetches during the crawl window), the LEXICOGRAPHICALLY LEAST
    * body wins — an arbitrary but deterministic tie-break, same in both
    * engines, and honest about what a point-in-time snapshot can say.
    * Closes the loop `crawl → robots → verdicts over the same crawl`. */
  def robotsTxt(docs: DataFrame, rawCol: String = "warc"): DataFrame =
    parseRecords(docs, rawCol)
      .filter(col("warc_type") === "response" && col("http_status") === "200" &&
        col("len_ok") &&
        regexp_extract(col("target_uri"),
          "(?i)^(?:[a-z]+://)?[^/]+(/.*)?$", 1) === "/robots.txt")
      .select(
        lower(regexp_extract(col("target_uri"),
          "(?i)^(?:[a-z]+://)?([^/?#:]+)", 1)).as("host"),
        col("body"))
      .groupBy("host")
      .agg(min(col("body")).as("robots_txt"))
}
