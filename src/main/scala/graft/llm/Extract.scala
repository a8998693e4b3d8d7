package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** HTML main-content extraction — the actual STEP 0 of every crawl
  * pipeline (RefinedWeb/CCNet run trafilatura-class extraction before
  * any filter downstream of here), previously assumed away: the whole
  * pipeline started from a `text` column someone else extracted. This
  * is a deterministic, oracle-replayable boilerplate-stripper over raw
  * HTML in three layers:
  *
  *   1. DOC level: drop `<head>…</head>`, `<script>…</script>`,
  *      `<style>…</style>` and comments wholesale; turn BLOCK-level
  *      tags (`p div br li h1…`) into newlines so the document falls
  *      apart into candidate lines at its structural boundaries.
  *   2. LINE level: the classic LINK-DENSITY rule (Kohlschütter et al.
  *      boilerplate detection, simplified to a deterministic ratio) —
  *      a line whose anchor text is more than `maxLinkDensity` of its
  *      visible text is chrome (nav bars, footers, related-links
  *      blocks), not content; empty lines drop too.
  *   3. Kept lines re-join in document order with tags stripped,
  *      whitespace squeezed, and the five standard entities decoded
  *      (`&amp;` LAST, the single-pass convention).
  *
  * Every step is an RE2-safe regex (`(?is)` flags, lazy `.*?`, char
  * classes — no lookarounds, no backrefs in patterns), so the DuckDB
  * oracle replays the identical chain ([[oracleExtractSql]] is GENERATED
  * from the same rule list — the [[Bpe.oracleCountSql]] no-drift rule).
  * This is a rule extractor, not a DOM parser: malformed HTML degrades
  * to keeping a little chrome, never to dropping content — the right
  * failure direction for a corpus filter.
  *
  * Scale shape: doc-level regex chain is a zero-shuffle map; the line
  * stage is posexplode → per-line arithmetic → one groupBy(doc_id)
  * re-join (fan-out bounded by lines-per-doc, the [[Curation
  * .removeBoilerplate]] shape); nothing driver-side, nothing
  * corpus-keyed. */
object Extract {

  /** (pattern, replacement) doc-level chain — shared by both engines.
    * Order matters: containers drop before block tags become newlines. */
  private val DocRules: Seq[(String, String)] = Seq(
    "(?is)<head[^>]*>.*?</head>" -> " ",
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    ("(?is)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section" +
      "|article|header|footer|blockquote|nav|aside|form|figure|figcaption" +
      "|pre|hr)[^>]*>") -> "\n")

  private val TagRe = "(?s)<[^>]*>"
  private val AnchorRe = "(?is)<a[^>]*>(.*?)</a>"

  /** tag-strip + whitespace-squeeze + trim — the visible text of a
    * fragment, BEFORE entity decoding (the density ratio measures both
    * sides on the same undecoded footing). */
  private def visible(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, TagRe, " "), "[ \\t\\r]+", " "))

  /** The five standard entities, `&amp;` decoded LAST. */
  private val Entities = Seq("&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (s, (e, v)) => replace(s, lit(e), lit(v)) }

  /** Extract the main content of `htmlCol` for every document: returns
    * (doc_id, text, n_kept, n_dropped) — `text` is the newline-joined
    * kept lines, counts make the cut auditable per document. Documents
    * whose html is NULL are absent from the output (callers guard —
    * [[graft.Pipeline]] requires html non-null loudly). `maxLinkDensity`
    * defaults to 0.5: a line more than half links is chrome. Dyadic
    * default on purpose — `0.5 · len` is exact in both engines. */
  def mainContent(docs: DataFrame, htmlCol: String = "html",
                  maxLinkDensity: Double = 0.5): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"maxLinkDensity must be in [0, 1], got $maxLinkDensity")
    val cleaned = DocRules.foldLeft(col(htmlCol)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val lines = docs
      .select(col("doc_id"), posexplode(split(cleaned, "\n", -1))
        .as(Seq("idx", "line")))
    val vis = visible(col("line"))
    val aTxt = visible(array_join(
      expr(s"regexp_extract_all(line, '${AnchorRe.replace("'", "\\'")}', 1)"),
      " "))
    val keep = length(vis) > 0 &&
      length(aTxt).cast("double") <= lit(maxLinkDensity) * length(vis)
    lines
      .withColumn("__keep__", keep)
      .withColumn("__vis__", vis)
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep__"),
            struct(col("idx"), decodeEntities(col("__vis__")).as("t"))))),
          x => x("t")), "\n").as("text"),
        sum(when(col("__keep__"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep__"), 0L).otherwise(1L)).cast(LongType)
          .as("n_dropped"))
  }

  /** The page `<title>` — the field retrieval weights above body text
    * ([[Search.bm25fTopK]]'s classic second field) and the display
    * string of every search result. Read from the RAW html
    * ([[mainContent]] drops `<head>` wholesale, and the title lives
    * there), inner tags stripped, whitespace squeezed, entities decoded
    * (the [[mainContent]] line treatment); missing/empty `<title>` = ''
    * (both engines' regexp_extract no-match convention). Zero-shuffle
    * per-row map. */
  def title(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    docs.select(col("doc_id"),
      decodeEntities(trim(regexp_replace(regexp_replace(
        regexp_extract(col(htmlCol), "(?is)<title[^>]*>(.*?)</title>", 1),
        TagRe, " "), "\\s+", " "))).as("title"))
      // \s+ (not the line-stage [ \t\r]+): a title is ONE string — a
      // newline inside the tag is formatting, not structure

  /** [[mainContent]] as a ZERO-SHUFFLE per-row map — the same three
    * layers with the line stage as array HOFs over `split(html, '\n')`
    * instead of posexplode → groupBy(doc_id): no corpus shuffle at all,
    * which is also what makes it STATELESS-STREAMING legal (append mode;
    * the explode twin's re-join aggregate forces complete mode) — the
    * crawl chain `warc → responses → mainContentRow` streams end-to-end.
    * This is literally the oracle's own shape ([[oracleExtractSql]] has
    * always been list_transform/list_filter per row). Same output,
    * row-for-row (spec-pinned ≡ [[mainContent]]), except NULL html is
    * filtered here where the explode twin loses it to the groupBy —
    * both absent, callers guard loudly either way. The HOF lambdas
    * evaluate interpreted (the r17 media_resize lesson), so per-row cost
    * is higher than the codegen'd explode path — but the explode path
    * pays a full corpus shuffle; §6 prices the trade at sf0.1. */
  def mainContentRow(docs: DataFrame, htmlCol: String = "html",
                     maxLinkDensity: Double = 0.5): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"maxLinkDensity must be in [0, 1], got $maxLinkDensity")
    val cleaned = DocRules.foldLeft(col(htmlCol)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val parts = transform(split(cleaned, "\n", -1), { l =>
      val vis = visible(l)
      val aTxt = visible(array_join(
        regexp_extract_all(l, lit(AnchorRe), lit(1)), " "))
      struct(vis.as("vis"),
        (length(vis) > 0 &&
          length(aTxt).cast("double") <= lit(maxLinkDensity) * length(vis))
          .as("keep"))
    })
    docs.filter(col(htmlCol).isNotNull)
      .select(col("doc_id"), parts.as("__p__"))
      .select(col("doc_id"),
        filter(col("__p__"), x => x("keep")).as("__k__"),
        size(col("__p__")).cast(LongType).as("__n__"))
      .select(col("doc_id"),
        array_join(transform(col("__k__"),
          x => decodeEntities(x("vis"))), "\n").as("text"),
        size(col("__k__")).cast(LongType).as("n_kept"),
        (col("__n__") - size(col("__k__"))).cast(LongType).as("n_dropped"))
  }

  /** Anchor element: the whole `<a …>…</a>` span (group 0 — the
    * two-field zip problem dissolved: extract the ELEMENTS once, then
    * read href and anchor text out of each element independently, so
    * the two fields can never misalign). */
  private val AnchorElemRe = "(?is)<a[^>]*>.*?</a>"
  /** href attribute inside one anchor element — double- OR single-quoted
    * (the char-class trick keeps it one RE2-safe group; a URL containing
    * the OTHER quote character truncates there, the right degradation
    * for a corpus link miner). Unquoted hrefs read as '' (dropped by
    * [[LinkGraph]] anyway — they are overwhelmingly relative). */
  private val HrefRe = "(?is)href\\s*=\\s*[\"']([^\"']*)[\"']"
  /** Host of an ABSOLUTE link: `https://h/…`, `http://h/…` or the
    * protocol-relative `//h/…`; port and path/query/fragment cut at the
    * char class. Relative hrefs (no match) read as ''. */
  private val LinkHostRe = "(?i)^(?:https?:)?//([^/?#:]+)"
  private val HostLenient = "(?i)^(?:[a-z]+://)?([^/?#:]+)"
  private def anchorHostSpark(href: Column): Column =
    lower(regexp_extract(href, LinkHostRe, 1))

  /** Every out-link of every document: (doc_id, link_idx, href, anchor,
    * host) — one row per `<a>` element in document order; `anchor` is
    * the visible anchor TEXT (inner tags stripped, whitespace squeezed,
    * entities decoded — the [[mainContent]] line treatment, because
    * anchor text is retrieval-grade text: the classic anchor field of
    * web search), `host` the lowercased target host for absolute links
    * ('' for relative — the caller's own host by definition). The edge
    * list [[LinkGraph.hostEdges]] aggregates and the anchor corpus
    * BM25F-style field search consume the same extraction.
    *
    * Scale shape: regexp_extract_all + posexplode — a pure zero-shuffle
    * map with fan-out bounded by anchors-per-page; streams in append
    * mode like the rest of the crawl chain. */
  def links(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val elems = expr(
      s"regexp_extract_all($htmlCol, '${AnchorElemRe.replace("'", "\\'")}', 0)")
    val href = regexp_extract(col("__a__"), HrefRe, 1)
    val rawAnchor = regexp_extract(col("__a__"), AnchorRe, 1)
    docs
      .select(col("doc_id"), posexplode(elems).as(Seq("link_idx", "__a__")))
      .select(col("doc_id"), col("link_idx").cast(LongType).as("link_idx"),
        href.as("href"),
        decodeEntities(visible(rawAnchor)).as("anchor"),
        anchorHostSpark(href).as("host"))
  }

  /** DuckDB replay of [[links]] over `rel` (doc_id, html) — same element
    * extraction, same per-element field regexes, positions from a
    * range-zip (the repo's list-explode idiom). */
  def oracleLinksSql(rel: String): String = {
    def q(s: String) = s.replace("'", "''")
    def vis(c: String) =
      "trim(regexp_replace(regexp_replace(" + c +
        ", '(?s)<[^>]*>', ' ', 'g'), '[ \\t\\r]+', ' ', 'g'))"
    val dec = Entities.foldLeft(vis(s"regexp_extract(x.a, '${q(AnchorRe)}', 1)")) {
      case (s, (e, v)) => s"replace($s, '${q(e)}', '${q(v)}')"
    }
    val href = s"regexp_extract(x.a, '${q(HrefRe)}', 1)"
    s"""SELECT doc_id, CAST(x.i AS BIGINT) AS link_idx,
       |  $href AS href,
       |  $dec AS anchor,
       |  lower(regexp_extract($href, '${q(LinkHostRe)}', 1)) AS host
       |FROM (SELECT doc_id,
       |    regexp_extract_all(html, '${q(AnchorElemRe)}', 0) AS es
       |  FROM $rel),
       |  LATERAL (SELECT unnest(list_transform(range(0, len(es)),
       |    i -> struct_pack(i := i, a := es[i + 1]))) AS x)""".stripMargin
  }

  /** The host of a document's own URL — lenient scheme (any `scheme://`
    * or none), port/path cut; '' when the url itself is NULL/hostless.
    * [[LinkGraph]]'s source side. */
  private[llm] def urlHostSpark(url: Column): Column =
    lower(regexp_extract(url, HostLenient, 1))
  private[llm] def urlHostSql(url: String): String =
    s"lower(regexp_extract($url, '${HostLenient.replace("'", "''")}', 1))"

  /** DuckDB replay of [[mainContent]], generated from the same rule
    * lists: a SELECT over `rel` (doc_id, html) yielding
    * (doc_id, text, n_kept, n_dropped). List lambdas stand in for the
    * explode/groupBy — same per-line expressions, same order. */
  def oracleExtractSql(rel: String, maxLinkDensity: Double = 0.5): String = {
    def q(s: String) = s.replace("'", "''").replace("\n", "' || chr(10) || '")
    val cleaned = DocRules.foldLeft("html") { case (c, (p, r)) =>
      s"regexp_replace($c, '${q(p)}', '${q(r)}', 'g')"
    }
    def visSql(c: String) =
      "trim(regexp_replace(regexp_replace(" + c +
        ", '(?s)<[^>]*>', ' ', 'g'), '[ \\t\\r]+', ' ', 'g'))"
    // coalesce: DuckDB's array_to_string over an EMPTY list is NULL
    // where Spark's array_join is '' — a no-anchor line must read as
    // zero link text, not NULL-poison the keep flag
    val aJoin = s"coalesce(array_to_string(" +
      s"regexp_extract_all(l, '${q(AnchorRe)}', 1), ' '), '')"
    val dec = Entities.foldLeft("x.vis") { case (s, (e, v)) =>
      s"replace($s, '${q(e)}', '${q(v).replace("''", "''")}')"
    }
    s"""SELECT doc_id,
       |  array_to_string(list_transform(
       |    list_filter(parts, x -> x.keep), x -> $dec), chr(10)) AS text,
       |  CAST(len(list_filter(parts, x -> x.keep)) AS BIGINT) AS n_kept,
       |  CAST(len(parts) - len(list_filter(parts, x -> x.keep)) AS BIGINT)
       |    AS n_dropped
       |FROM (SELECT doc_id, list_transform(string_split($cleaned, chr(10)),
       |    l -> struct_pack(
       |      vis := ${visSql("l")},
       |      keep := length(${visSql("l")}) > 0 AND
       |        length(${visSql(aJoin)}) <= $maxLinkDensity * length(${visSql("l")})))
       |  AS parts FROM $rel)""".stripMargin
  }
}
