package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) — the crawl's COMPLIANCE gate,
  * and the one stage of the chain that was still missing: a pipeline
  * that parses WARC ([[Warc]]), extracts content ([[Extract]]), caps
  * domains ([[Curation.domainDedup]]) and ranks hosts ([[LinkGraph]])
  * must also be able to answer "was this URL allowed to be fetched at
  * all" — retroactive robots filtering is how published crawl corpora
  * honor opt-outs (Common Crawl re-filters on robots changes).
  *
  * Deterministic subset of RFC 9309, all of it replayed by the DuckDB
  * oracle:
  *
  *   - GROUPS: a `User-agent:` line starts a new group unless the
  *     previous line is also a `User-agent:` line (consecutive UA lines
  *     share their rules). Rules before any UA line are orphans and
  *     drop. Comments (`#…`) strip first; matching is case-insensitive
  *     on field names and agent names.
  *   - GROUP SELECTION: groups naming `agent` exactly (case-insensitive)
  *     if any exist, else the `*` groups — the RFC's most-specific rule
  *     collapsed to exact-vs-wildcard (substring-longest-match agent
  *     names are a crawler-identity subtlety, not a data-pipeline one).
  *   - RULES: `Allow:` / `Disallow:` patterns with `*` wildcards and the
  *     trailing `$` anchor, compiled to RE2 by an escape chain BOTH
  *     engines apply verbatim. Empty patterns are no-ops (the classic
  *     `Disallow:` = allow-all line) and drop at parse.
  *   - DECISION: longest-match-wins, Allow wins length ties, no match =
  *     allowed (RFC 9309 §2.2.2 exactly, with rule LENGTH as the
  *     specificity measure — the pattern's character count, the
  *     published interpretation Google's parser uses).
  *
  * Scale shape: parsing is per-host (robots tables are hosts-sized —
  * model-sized next to the corpus); the verdict joins the PACKED rule
  * arrays to the corpus BY HOST as a broadcast, then evaluates
  * longest-match per row with array HOFs — zero corpus shuffle, no
  * per-URL explode (a URL × rules explode would re-shuffle the corpus
  * on doc_id to re-aggregate; the array form never leaves the row). */
object Robots {

  /** Characters RE2 treats specially, escaped in pattern order —
    * backslash FIRST (later escapes introduce backslashes). `*` and `$`
    * are NOT here: they are robots-pattern syntax, translated after. */
  private val EscapeChars: Seq[String] =
    Seq("\\", ".", "^", "+", "?", "(", ")", "[", "]", "{", "}", "|")

  /** robots pattern → anchored RE2: escape, `*` → `.*`, then a trailing
    * escaped `\$` becomes the real end anchor; `^` prefixes the result
    * (robots rules are path prefixes). */
  private def patToRe(pat: Column): Column = {
    val escaped = EscapeChars.foldLeft(pat) { (c, ch) =>
      replace(c, lit(ch), lit("\\" + ch))
    }
    val starred = replace(escaped, lit("*"), lit(".*"))
    concat(lit("^"), regexp_replace(starred, "\\\\\\$$", "\\$"))
  }

  /** Parse every host's robots.txt into its applicable rule list for
    * `agent`: (host, pat, allow, plen, re) — one row per effective
    * rule. Hosts whose file yields no applicable rules are absent
    * (= everything allowed, the no-robots default). */
  def rules(robots: DataFrame, agent: String = "*",
            hostCol: String = "host", txtCol: String = "robots_txt")
  : DataFrame = {
    val w = Window.partitionBy("host").orderBy("idx")
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(txtCol), lit("")), "\n"))
          .as(Seq("idx", "raw")))
      .select(col("host"), col("idx"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("l"))
      .select(col("host"), col("idx"),
        lower(regexp_extract(col("l"), "(?i)^user-agent:\\s*(.*)$", 1))
          .as("ua"),
        lower(regexp_extract(col("l"), "(?i)^(allow|disallow):", 1))
          .as("kind"),
        trim(regexp_extract(col("l"), "(?i)^(?:allow|disallow):(.*)$", 1))
          .as("pat"))
      .withColumn("is_ua", col("ua") =!= "")
      // a UA line starts a group unless the previous line was also UA
      .withColumn("starts", col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
      .withColumn("grp",
        sum(when(col("starts"), 1L).otherwise(0L)).over(w))
    val groups = lines.filter(col("is_ua"))
      .select(col("host"), col("grp"), col("ua")).distinct()
    val ruleRows = lines
      .filter(col("kind") =!= "" && col("pat") =!= "" && col("grp") > 0)
      .select(col("host"), col("grp"), col("pat"),
        (col("kind") === "allow").as("allow"))
    // exact-agent groups if the host has any, else the * groups
    val hostHasExact = groups.filter(col("ua") === lit(agent.toLowerCase))
      .select(col("host")).distinct().withColumn("has_exact", lit(true))
    val wanted = groups.join(hostHasExact, Seq("host"), "left")
      .filter(when(coalesce(col("has_exact"), lit(false)),
        col("ua") === lit(agent.toLowerCase)).otherwise(col("ua") === "*"))
      .select(col("host"), col("grp")).distinct()
    ruleRows.join(wanted, Seq("host", "grp"))
      .select(col("host"), col("pat"), col("allow"),
        length(col("pat")).cast("long").as("plen"),
        patToRe(col("pat")).as("re"))
      .distinct()
  }

  /** URL path+query (what robots rules match against): everything from
    * the first `/` after the host; a bare host reads as "/". */
  private[llm] def urlPath(url: Column): Column = {
    val p = regexp_extract(url, "(?i)^(?:[a-z]+://)?[^/]*(/.*)?$", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** The verdict for every document URL: (doc_id, host, path, allowed,
    * matched_allow, matched_disallow) — `matched_*` are the LONGEST
    * matching rule lengths (−1 = none), so the decision is auditable
    * per row. `ruleFrame` is [[rules]] output; hosts without rules
    * allow everything. Broadcast by host + per-row array HOFs — the
    * corpus never shuffles. */
  def allowed(docs: DataFrame, ruleFrame: DataFrame,
              urlCol: String = "url"): DataFrame = {
    val packed = ruleFrame.groupBy("host")
      .agg(collect_list(struct(col("plen"), col("allow"), col("re")))
        .as("__rules__"))
    def best(rulesCol: Column, path: Column, wantAllow: Boolean): Column =
      coalesce(array_max(transform(
        filter(rulesCol, r =>
          r("allow") === lit(wantAllow) && regexp_like(path, r("re"))),
        r => r("plen"))), lit(-1L))
    val host = Extract.urlHostSpark(col(urlCol))
    val path = urlPath(col(urlCol))
    docs.select(col("doc_id"), host.as("host"), path.as("path"))
      .join(broadcast(packed), Seq("host"), "left")
      .withColumn("matched_allow", best(col("__rules__"), col("path"), true))
      .withColumn("matched_disallow",
        best(col("__rules__"), col("path"), false))
      .withColumn("allowed",
        col("matched_allow") >= col("matched_disallow"))
      .drop("__rules__")
      .select(col("doc_id"), col("host"), col("path"), col("allowed"),
        col("matched_allow"), col("matched_disallow"))
  }

  // ------------------------------------------------------------ oracle

  private def q(s: String) = s.replace("'", "''")

  /** DuckDB replay of [[patToRe]] over SQL expression `pat`. */
  private def patToReSql(pat: String): String = {
    val escaped = EscapeChars.foldLeft(pat) { (c, ch) =>
      s"replace($c, '${q(ch)}', '${q("\\" + ch)}')"
    }
    val starred = s"replace($escaped, '*', '.*')"
    // RE2 rewrite strings take a literal '$' bare (Java needs the \$)
    s"'^' || regexp_replace($starred, '\\\\\\$$$$', '$$')"
  }

  /** DuckDB replay of [[rules]] over `rel` (host, robots_txt). */
  def oracleRulesSql(rel: String, agent: String = "*"): String = {
    val ag = q(agent.toLowerCase)
    s"""SELECT host, pat, allow, CAST(length(pat) AS BIGINT) AS plen,
       |  ${patToReSql("pat")} AS re
       |FROM (
       |  WITH lines AS (
       |    SELECT host, x.i AS idx,
       |      trim(regexp_replace(x.raw, '#.*$$', '')) AS l
       |    FROM (SELECT host,
       |        string_split(coalesce(robots_txt, ''), chr(10)) AS ls
       |      FROM $rel),
       |      LATERAL (SELECT unnest(list_transform(range(0, len(ls)),
       |        i -> struct_pack(i := i, raw := ls[i + 1]))) AS x)),
       |  fields AS (
       |    SELECT host, idx,
       |      lower(regexp_extract(l, '(?i)^user-agent:\\s*(.*)$$', 1)) AS ua,
       |      lower(regexp_extract(l, '(?i)^(allow|disallow):', 1)) AS kind,
       |      trim(regexp_extract(l, '(?i)^(?:allow|disallow):(.*)$$', 1))
       |        AS pat
       |    FROM lines),
       |  flagged AS (
       |    SELECT *, (ua <> '') AS is_ua,
       |      ((ua <> '') AND NOT coalesce(lag(ua <> '') OVER
       |        (PARTITION BY host ORDER BY idx), false)) AS starts
       |    FROM fields),
       |  grouped AS (
       |    SELECT *, sum(CASE WHEN starts THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY host ORDER BY idx
       |       ROWS UNBOUNDED PRECEDING) AS grp
       |    FROM flagged),
       |  groups AS (SELECT DISTINCT host, grp, ua FROM grouped
       |    WHERE is_ua),
       |  has_exact AS (SELECT DISTINCT host FROM groups WHERE ua = '$ag'),
       |  wanted AS (
       |    SELECT DISTINCT g.host, g.grp FROM groups g
       |    LEFT JOIN has_exact e ON g.host = e.host
       |    WHERE CASE WHEN e.host IS NOT NULL THEN g.ua = '$ag'
       |          ELSE g.ua = '*' END),
       |  rulerows AS (
       |    SELECT DISTINCT r.host, r.pat, (r.kind = 'allow') AS allow
       |    FROM grouped r JOIN wanted w ON r.host = w.host AND r.grp = w.grp
       |    WHERE r.kind <> '' AND r.pat <> '' AND r.grp > 0)
       |  SELECT * FROM rulerows)""".stripMargin
  }

  /** DuckDB replay of [[allowed]] over `docsRel` (doc_id, url) and
    * `robotsRel` (host, robots_txt). `preamble` prepends fixture CTEs. */
  def oracleAllowedSql(docsRel: String, robotsRel: String,
                       agent: String = "*", preamble: String = ""): String = {
    val pathSql = "CASE WHEN regexp_extract(url, " +
      "'(?i)^(?:[a-z]+://)?[^/]*(/.*)?$', 1) = '' THEN '/' ELSE " +
      "regexp_extract(url, '(?i)^(?:[a-z]+://)?[^/]*(/.*)?$', 1) END"
    def best(want: String) =
      "coalesce(list_aggregate(list_transform(list_filter(rules, " +
        s"r -> r.allow = $want AND regexp_matches(path, r.re)), " +
        "r -> r.plen), 'max'), -1)"
    s"""WITH ${preamble}rr AS (${oracleRulesSql(robotsRel, agent)}),
       |packed AS (SELECT host,
       |    list(struct_pack(plen := plen, allow := allow, re := re))
       |      AS rules
       |  FROM rr GROUP BY host),
       |du AS (SELECT doc_id, ${Extract.urlHostSql("url")} AS host,
       |    $pathSql AS path FROM $docsRel),
       |m AS (SELECT du.doc_id, du.host, du.path,
       |    ${best("true")} AS matched_allow,
       |    ${best("false")} AS matched_disallow
       |  FROM du LEFT JOIN packed ON du.host = packed.host)
       |SELECT doc_id, host, path,
       |  (matched_allow >= matched_disallow) AS allowed,
       |  CAST(matched_allow AS BIGINT) AS matched_allow,
       |  CAST(matched_disallow AS BIGINT) AS matched_disallow
       |FROM m""".stripMargin
  }
}
