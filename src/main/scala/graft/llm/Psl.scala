package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Public-suffix-list registrable domains — the real grouping key behind
  * per-domain crawl policies ([[Curation.domainDedup]]'s cap, robots
  * budgets, per-site quality priors). The last-two-labels simplification
  * ([[Curation.urlDomain]]) collapses every `*.co.uk` site into ONE
  * "domain", so a domain cap under it throttles entire national webs; the
  * PSL (publicsuffix.org — public data, MPL-licensed) is the standard fix
  * and this is its lookup, in the three rule classes the list defines:
  *
  *   - plain rules (`co.uk`): the suffix itself is public;
  *   - wildcard rules (`*.ck`): every single label under the base is
  *     public;
  *   - exception rules (`!www.ck`): carve-outs from a wildcard — the
  *     exception itself IS a registrable domain.
  *
  * Matching follows the published algorithm: scan the host's label
  * suffixes longest-first, first (= longest) matching rule wins with
  * exception rules taking priority at equal length; the registrable
  * domain is the matched public suffix plus one more label (for an
  * exception, the exception itself). No rule matching is the list's
  * implicit `*` default — the TLD is public, registrable = last two
  * labels, which is exactly the no-table fallback, so plugging a table in
  * only ever REFINES the grouping.
  *
  * Hosts that fail the well-formedness guard (`^[^.]+(\.[^.]+)+$` — at
  * least two labels, all non-empty) group as themselves, mirroring the
  * fallback's behaviour on malformed crawl URLs.
  *
  * Two implementations, spec-pinned equal ([[registrable]] for the
  * streaming state machine's per-row calls, [[withRegistrableDomain]] for
  * batch frames). The frame path is broadcast joins of the exploded label
  * suffixes (≤ labels-per-host rows per input row) against the rule
  * table — it scales to the FULL ~15k-rule list, where a literal-map
  * column expression would linear-probe the whole list per candidate.
  */
final case class PublicSuffixes(plain: Set[String],
                                wildcardBases: Set[String],
                                exceptions: Set[String]) {

  /** Registrable domain of one canonical host — the Scala twin of
    * [[PublicSuffixes.withRegistrableDomain]] for per-row callers (the
    * streaming domain-cap state machine). */
  def registrable(host: String): String =
    if (!host.matches("[^.]+(\\.[^.]+)+")) host
    else {
      val labels = host.split('.')
      val n = labels.length
      var m = 0 // 1-based index of the longest (leftmost) matching rule
      var exc = false
      var i = 0
      while (i < n && m == 0) {
        val cand = labels.slice(i, n).mkString(".")
        if (exceptions(cand)) { m = i + 1; exc = true }
        else if (plain(cand)) m = i + 1
        else if (i + 1 < n && wildcardBases(labels.slice(i + 1, n).mkString(".")))
          m = i + 1
        i += 1
      }
      val regStart =
        if (m == 0) math.max(n - 1, 1) // implicit `*` rule: last two labels
        else if (exc) m                // the exception IS registrable
        else math.max(m - 1, 1)        // suffix + one label
      labels.slice(regStart - 1, n).mkString(".")
    }
}

object PublicSuffixes {

  /** Parse rules in the published file format: one rule per line, `//`
    * comments and blank lines skipped, `!` marks exceptions, `*.` marks
    * wildcards (the base after `*.` is stored). Rules are lowercased —
    * [[Curation.urlKey]] hosts already are. (IDN rules appear in the file
    * in both unicode and punycode; canonical keys carry whichever form
    * the crawler emitted, so load the form your pipeline uses.) */
  def parse(lines: Iterable[String]): PublicSuffixes = {
    val rules = lines.iterator.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//")).toSeq
    PublicSuffixes(
      plain = rules.filter(r => !r.startsWith("!") && !r.startsWith("*.")).toSet,
      wildcardBases = rules.collect { case r if r.startsWith("*.") => r.drop(2) }.toSet,
      exceptions = rules.collect { case r if r.startsWith("!") => r.drop(1) }.toSet)
  }

  /** Load the full list from a local copy of
    * https://publicsuffix.org/list/public_suffix_list.dat. */
  def load(path: String): PublicSuffixes = {
    import scala.jdk.CollectionConverters._
    parse(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala)
  }

  /** A curated SUBSET of the list — the major second-level ccTLD families
    * plus the common hosted-site private suffixes, and the `ck`/`kobe.jp`
    * wildcard+exception pairs (exercising all three rule classes). This is
    * a sane default where shipping the full 15k-rule file is not wanted;
    * production crawls should [[load]] the real list — the operators take
    * ANY [[PublicSuffixes]]. */
  val Common: PublicSuffixes = parse(Seq(
    // United Kingdom / Ireland
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    // Japan (plus the wildcard city domains and their exceptions)
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "lg.jp", "*.kobe.jp", "!city.kobe.jp",
    // Korea / China / Taiwan / Hong Kong / Singapore
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    // India / Indonesia / Malaysia / Vietnam / Philippines
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "gov.my",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph",
    // Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar",
    "com.co", "net.co", "org.co",
    // Europe / Middle East / Africa
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    "co.il", "org.il", "ac.il", "gov.il", "muni.il",
    "co.za", "net.za", "org.za", "web.za", "gov.za",
    "co.ke", "com.eg", "com.sa", "com.ng", "com.pk", "com.bd",
    // the Cook Islands wildcard + its published exception
    "*.ck", "!www.ck",
    // common hosted-site private suffixes
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "workers.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "readthedocs.io", "wordpress.com"))

  /** Add a `domain` column (registrable domain of `url_key`'s host) to a
    * frame — the batch lookup [[Curation.domainDedup]] plugs in.
    *
    * Shape: explode the host's label suffixes (≤ labels-per-host rows per
    * input row, hosts are shallow), broadcast-join them against the rule
    * table twice (self-match for plain/exception rules, parent-match for
    * wildcards), take the leftmost hit per row with exception priority as
    * one map-side-combinable `min(struct)` — never a corpus-sized shuffle,
    * and the rule table is always the broadcast side even at the full
    * ~15k-rule list. Rows keep their other columns untouched; `rowKey`
    * names a UNIQUE key column used to join the matches back. */
  def withRegistrableDomain(keyed: DataFrame, psl: PublicSuffixes,
                            rowKey: String = "doc_id"): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val lb = keyed
      .withColumn("__host__", regexp_extract(col("url_key"), "^[^/?]*", 0))
      .withColumn("__lb__", split(col("__host__"), "\\."))
      .withColumn("__n__", size(col("__lb__")))
      .withColumn("__ok__", col("__host__").rlike("^[^.]+(\\.[^.]+)+$"))
    val cands = lb.filter(col("__ok__"))
      .select(col(rowKey), col("__lb__"), col("__n__"),
        explode(sequence(lit(1), col("__n__"))).as("__i__"))
      .withColumn("__cand__", array_join(
        slice(col("__lb__"), col("__i__"), col("__n__") - col("__i__") + 1), "."))
      .withColumn("__tail__", when(col("__i__") < col("__n__"), array_join(
        slice(col("__lb__"), col("__i__") + 1, col("__n__") - col("__i__")), ".")))
    val selfRules = (psl.plain.toSeq.sorted.map((_, false)) ++
      psl.exceptions.toSeq.sorted.map((_, true)))
      .toDF("__sfx__", "__exc__")
    val wildRules = psl.wildcardBases.toSeq.sorted.toDF("__wsfx__")
    val hits = cands.join(broadcast(selfRules), col("__cand__") === col("__sfx__"))
      .select(col(rowKey), col("__i__"), col("__exc__"))
      .unionByName(
        cands.join(broadcast(wildRules), col("__tail__") === col("__wsfx__"))
          .select(col(rowKey), col("__i__"), lit(false).as("__exc__")))
    // leftmost (longest-suffix) hit; at equal i an exception beats a
    // plain/wildcard hit — struct min with NOT(exc) as the tiebreak
    val best = hits.groupBy(rowKey)
      .agg(min(struct(col("__i__"), not(col("__exc__")).as("__ne__"))).as("__m__"))
    val mi = col("__m__.__i__")
    val regStart = when(col("__m__").isNull,
        greatest(col("__n__") - 1, lit(1)))          // implicit `*` rule
      .when(not(col("__m__.__ne__")), mi)            // exception
      .otherwise(greatest(mi - lit(1), lit(1)))      // suffix + one label
      .cast(IntegerType)
    lb.join(best, Seq(rowKey), "left")
      .withColumn("domain", when(not(col("__ok__")), col("__host__"))
        .otherwise(array_join(
          slice(col("__lb__"), regStart, col("__n__") - regStart + 1), ".")))
      .drop("__host__", "__lb__", "__n__", "__ok__", "__m__")
  }

  /** DuckDB replay of [[withRegistrableDomain]], GENERATED from the same
    * rule set so the two definitions cannot drift (the
    * [[Bpe.oracleCountSql]] rule): a SELECT over `rel` (any relation with
    * `doc_id, url_key`) yielding `doc_id, url_key, domain`. The join-free
    * replay walks the label suffixes with a list lambda — fine at oracle
    * scale. */
  def oracleDomainsSql(rel: String, psl: PublicSuffixes): String = {
    def set(s: Set[String], in: String) =
      if (s.isEmpty) "FALSE"
      else s"$in IN (${s.toSeq.sorted.map(r => s"'$r'").mkString(", ")})"
    val selfHit = set(psl.plain ++ psl.exceptions,
      "array_to_string(labels[i:], '.')")
    val wildHit = set(psl.wildcardBases,
      "array_to_string(labels[i+1:], '.')")
    val excHit = set(psl.exceptions, "array_to_string(labels[m:], '.')")
    s"""SELECT doc_id, url_key,
       |  CASE WHEN NOT ok THEN host
       |    WHEN m = 0 THEN array_to_string(labels[greatest(n - 1, 1):], '.')
       |    WHEN $excHit THEN array_to_string(labels[m:], '.')
       |    ELSE array_to_string(labels[greatest(m - 1, 1):], '.') END AS domain
       |FROM (SELECT doc_id, url_key, host, labels, n, ok,
       |    CASE WHEN ok THEN coalesce(list_filter(range(1, n + 1),
       |        i -> $selfHit OR (i < n AND $wildHit))[1], 0)
       |      ELSE 0 END AS m
       |  FROM (SELECT doc_id, url_key, host, string_split(host, '.') AS labels,
       |      len(string_split(host, '.')) AS n,
       |      regexp_matches(host, '^[^.]+(\\.[^.]+)+$$') AS ok
       |    FROM (SELECT doc_id, url_key,
       |        regexp_extract(url_key, '^[^/?]*') AS host FROM $rel)))""".stripMargin
  }
}
