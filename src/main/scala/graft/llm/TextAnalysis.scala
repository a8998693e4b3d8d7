package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting. Pure column expressions
  * (whole-stage codegen), deterministic, engine-portable (md5 hashing only).
  */
object TextAnalysis {

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "del", "las", "que", "por"))

  private def toks: Column = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

  private def hits(lang: String): Column =
    size(filter(col("tk"), t => array_contains(lit(Stopwords(lang).toArray), t)))

  /** Stopword-hit language ID with a deterministic argmax tie-break
    * (en > de > fr > es). */
  def languageId(docs: DataFrame): DataFrame =
    docs.withColumn("tk", toks)
      .withColumn("en_hits", hits("en")).withColumn("de_hits", hits("de"))
      .withColumn("fr_hits", hits("fr")).withColumn("es_hits", hits("es"))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
          .when(col("fr_hits") >= col("es_hits"), "fr")
          .otherwise("es"))
      .select("doc_id", "pred_lang", "en_hits", "de_hits", "fr_hits", "es_hits")

  /** Length / punctuation / stopword-ratio quality score. */
  def quality(docs: DataFrame): DataFrame = {
    val allStops = Stopwords.values.flatten.toArray.distinct.sorted
    docs.withColumn("tk", toks)
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_words", size(col("tk")).cast(LongType))
      .withColumn("n_punct", size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).cast(LongType))
      .withColumn("n_stop",
        size(filter(col("tk"), t => array_contains(lit(allStops), t))).cast(LongType))
      .withColumn("punct_ratio",
        when(col("n_chars") === 0, 0.0)
          .otherwise(round(col("n_punct").cast(DoubleType) / col("n_chars").cast(DoubleType), 6)))
      .withColumn("stop_ratio",
        when(col("n_words") === 0, 0.0)
          .otherwise(round(col("n_stop").cast(DoubleType) / col("n_words").cast(DoubleType), 6)))
      .withColumn("quality_score",
        round(least(col("n_words").cast(DoubleType) / 100.0, lit(1.0)) * 0.5 +
          col("stop_ratio") * 0.3 + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
      .select("doc_id", "n_chars", "n_words", "n_punct", "n_stop",
        "punct_ratio", "stop_ratio", "quality_score")
  }

  /** Whitespace tokens + BPE-ish segment counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)")).cast(LongType).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]', 0)"))
        .cast(LongType).as("bpe_tokens"))

  /** Shannon entropy (nats) of the a-z0-9/space character distribution —
    * the classic gibberish/spam floor: natural text sits near ~2.8-3.0,
    * repeated-character spam collapses toward 0. Counts come from 37
    * single-char `replace` passes (len − len(removed)), so the whole signal
    * is one codegen'd row-local expression with a deterministic
    * left-associated sum — bit-reproducible in any engine. */
  def entropy(docs: DataFrame): DataFrame = {
    val alphabet = ('a' to 'z') ++ ('0' to '9') :+ ' '
    val lowered = lower(col("text"))
    // Counts land in ONE array column and the sums run as array folds over
    // it: inlining the 37-replace count expressions into every entropy term
    // (the naive `counts.reduce` form) was measured 37× the work — Catalyst
    // duplicates, it does not CSE across branches. The folds start at 0.0
    // and associate left, exactly like the oracle's written-out sums.
    val cnts = array(alphabet.map(ch =>
      (length(lowered) - length(replace(lowered, lit(ch.toString), lit(""))))
        .cast(DoubleType)): _*)
    val n = col("__n__")
    docs
      .withColumn("__cnts__", cnts)
      .withColumn("__n__", aggregate(col("__cnts__"), lit(0.0), (a, c) => a + c))
      .select(col("doc_id"),
        n.cast(LongType).as("n_alpha"),
        when(n === 0, 0.0)
          .otherwise(round(aggregate(col("__cnts__"), lit(0.0),
            (a, c) => a + when(c > 0, -(c / n) * log(c / n)).otherwise(lit(0.0))), 6))
          .as("char_entropy"))
  }

  /** Corpus-typicality score: the average natural log of the corpus-wide
    * frequency of each word bigram occurrence in the doc — a cheap
    * unigram/bigram "language model" signal that flags out-of-distribution
    * text (very negative = rare constructions everywhere) without an
    * external model.
    *
    * Two-pass shape that any corpus statistic shares: bigram counts are a
    * bounded-key groupBy (key space = observed vocab², group size = corpus
    * frequency); the scoring join shuffles on the same bounded key; the
    * final per-doc average is map-side combined. No broadcast assumption —
    * at 100 TB the count table is itself large and the shuffle join is the
    * right plan. */
  def typicality(docs: DataFrame): DataFrame = {
    val grams = Dedup.rawNgrams(docs, 2) // (doc_id, g) with duplicates
    val counts = grams.groupBy("g").agg(count(lit(1)).as("cf"))
    val scored = grams.join(counts, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        avg(log(col("cf").cast(DoubleType))).as("avg_ln_freq"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("avg_ln_freq"), lit(0.0)), 6).as("avg_ln_freq"))
  }

  /** Column form of [[graft.functions.NormalizeText]] — Unicode
    * normalization (NFC default; NFKC for compatibility folding) as a
    * native codegen'd per-row map. Run it FIRST in a curation chain:
    * every byte-keyed operator downstream (exact-dedup hashes, substring
    * grams, CDC chunks, winnow fingerprints) treats é and e+◌́ as
    * different documents until this runs. */
  def normalizeUnicode(c: Column, mode: String = "NFC"): Column =
    org.apache.spark.sql.GraftExpr.column(
      graft.functions.NormalizeText(
        org.apache.spark.sql.GraftExpr.expression(c), mode))

  /** PMI collocation extraction (Church & Hanks 1990; Manning & Schütze
    * ch. 5 — the corpus-analysis step that surfaces multiword units:
    * "new york", "machine learning"): pointwise mutual information of
    * each adjacent word pair against its unigram independence baseline,
    *
    *   pmi(w1,w2) = log2( p(w1,w2) / (p(w1)·p(w2)) ),
    *   p(w1,w2) = c12/N_bigrams, p(w) = c(w)/N_tokens,
    *
    * reported for pairs with c12 ≥ `minCount` (the standard guard — PMI
    * over-rewards hapax pairs), top-`topK` by (pmi desc, w1, w2). The
    * output feeds tokenizer vocab seeding and blocklist/boilerplate
    * discovery upstream of [[blocklist]].
    *
    * Scale shape: one token explode feeding two map-side-combined
    * aggregates (bigram- and token-keyed); the unigram count table is
    * vocab-bounded and BROADCASTS into the minCount-pruned bigram frame;
    * the two corpus totals ride one-row broadcast crossJoins (no driver
    * collect); the final cut is a TakeOrderedAndProject over a
    * vocab²-bounded frame — nothing after the explode scales with corpus
    * rows. Determinism: counts are exact integers, the ratio is built
    * with a fixed parenthesization mirrored token-for-token by the
    * oracle, pmi rounds at 6, and the top-K order ties break on the
    * words. */
  def collocations(docs: DataFrame, minCount: Long = 5,
                   topK: Int = 20): DataFrame = {
    def w1of(g: Column) = element_at(split(g, " "), 1)
    def w2of(g: Column) = element_at(split(g, " "), 2)
    val uni = Dedup.rawNgrams(docs, 1)
    val c1 = uni.groupBy("g").agg(count(lit(1)).as("c"))
    val nTok = c1.agg(sum("c").cast(DoubleType).as("ntok"))
    val c2 = Dedup.rawNgrams(docs, 2)
      .select(w1of(col("g")).as("w1"), w2of(col("g")).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val nBig = c2.agg(sum("c12").cast(DoubleType).as("nbig"))
    c2.filter(col("c12") >= minCount)
      .join(broadcast(c1.select(col("g").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(c1.select(col("g").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBig))
      .withColumn("pmi", round(log2(
        (col("c12").cast(DoubleType) / col("nbig")) /
          ((col("c1").cast(DoubleType) / col("ntok")) *
            (col("c2").cast(DoubleType) / col("ntok")))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select("w1", "w2", "c12", "c1", "c2", "pmi")
  }

  /** Reference-LM perplexity (CCNet, Wenzek et al. 2020 — the quality/
    * domain filter that scores every document against a language model
    * trained on a TRUSTED reference corpus, keeping low-perplexity docs):
    * an add-α-smoothed bigram LM whose counts come from the reference
    * subset (`refFilter`), scoring ALL docs —
    *
    *   ln P(w_i | w_{i-1}) = ln((c2(w_{i-1}, w_i) + α) / (c1(w_{i-1}) + α·V))
    *   ppl(doc) = exp(−avg_i ln P)
    *
    * Unlike [[typicality]] (joint bigram frequency over the whole corpus,
    * model-free), this is a proper CONDITIONAL probability with smoothing
    * and a reference-conditioned model — the cross-domain scoring shape:
    * text unlike the reference (other languages, gibberish, boilerplate)
    * scores high-perplexity even when it is typical of the raw corpus.
    *
    * Scale shape (same budget as typicality): reference counts are two
    * bounded-key groupBys (vocab / vocab² keys); scoring joins shuffle on
    * the same bounded keys — no broadcast assumption for the count tables
    * (at 100 TB the reference LM is itself large); V rides a one-row
    * broadcast crossJoin, so the plan has no driver-side collect. */
  def perplexity(docs: DataFrame, refFilter: Column,
                 alpha: Double = 1.0): DataFrame = {
    val grams = Dedup.rawNgrams(docs, 2) // (doc_id, g = "w1 w2") occurrences
    val ref = docs.filter(refFilter)
    val c1 = Dedup.rawNgrams(ref, 1)
      .groupBy(col("g").as("w1")).agg(count(lit(1)).as("c1"))
    val c2 = Dedup.rawNgrams(ref, 2)
      .groupBy("g").agg(count(lit(1)).as("c2"))
    val vocab = c1.agg(count(lit(1)).cast(DoubleType).as("v")) // one row
    val occ = grams
      .withColumn("w1", element_at(split(col("g"), " "), 1))
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lnp", log(
        (coalesce(col("c2"), lit(0L)).cast(DoubleType) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)).cast(DoubleType) + lit(alpha) * col("v"))))
    val sc = occ.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        avg(col("lnp")).as("__alp__"))
    docs.select("doc_id").join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(exp(-col("__alp__")), lit(0.0)), 6).as("ppl"))
  }

  /** Interpolated Kneser–Ney bigram perplexity (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form — the KenLM estimator CCNet actually
    * ships, where [[perplexity]] is its add-α stand-in): per bigram,
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·) + D·N1+(w1·)/c(w1·) · Pc(w2)
    *   Pc(w2)   = (N1+(·w2) + 1) / (T + V + 1)
    *
    * with D = `discount` (0.75, the textbook fixed discount), c(w1·) the
    * context count, N1+(w1·)/N1+(·w2) the distinct-successor/-predecessor
    * TYPE counts, T = Σ N1+(·w2) = distinct bigram types. The +1/(T+V+1)
    * on the continuation distribution is an add-one floor over
    * vocab ∪ {unk} — it keeps P total (sums to 1) and strictly positive,
    * so OOV bigrams score finite instead of −∞ (KenLM's <unk> role),
    * and the convention is exactly replayable in SQL. An unseen CONTEXT
    * backs off to Pc(w2) with weight 1 (the c(w1·)=0 limit of the
    * interpolation). Continuation counts are what separate KN from add-α:
    * "francisco" is frequent but follows only "san", so its unigram
    * weight is high yet its CONTINUATION weight is 1 — KN scores novel
    * bigrams by how promiscuous w2 is, not how common.
    *
    * Same output contract as [[perplexity]]: (doc_id, n_bigrams, ppl),
    * ppl = round-6 exp(−avg ln P), 0.0 for bigram-less docs. Same 100 TB
    * shape too: every count table is vocab/bigram-TYPE-bounded with
    * map-side combine, the model tables broadcast into the scoring join,
    * the per-doc aggregate keys on doc_id — no corpus-sized shuffle. */
  def perplexityKn(docs: DataFrame, refFilter: Column,
                   discount: Double = 0.75): DataFrame = {
    def w1of(g: Column) = element_at(split(g, " "), 1)
    def w2of(g: Column) = element_at(split(g, " "), 2)
    val ref = docs.filter(refFilter)
    val big = Dedup.rawNgrams(ref, 2)
      .select(w1of(col("g")).as("w1"), w2of(col("g")).as("w2"), col("g"))
    val c2 = big.groupBy("g").agg(count(lit(1)).as("c2"))
    val ctx = big.groupBy("w1").agg(count(lit(1)).as("c1"),
      countDistinct("w2").as("nfw"))
    val contw = big.groupBy("w2").agg(countDistinct("w1").as("nprec"))
    val totals = contw.agg(sum("nprec").cast(DoubleType).as("t"))
    val vocab = Dedup.rawNgrams(ref, 1)
      .agg(countDistinct("g").cast(DoubleType).as("v"))
    val d = lit(discount)
    val occ = Dedup.rawNgrams(docs, 2)
      .withColumn("w1", w1of(col("g")))
      .withColumn("w2", w2of(col("g")))
      .join(broadcast(c2), Seq("g"), "left")
      .join(broadcast(ctx), Seq("w1"), "left")
      .join(broadcast(contw), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .withColumn("pcont",
        (coalesce(col("nprec"), lit(0L)).cast(DoubleType) + lit(1.0)) /
          (col("t") + col("v") + lit(1.0)))
      .withColumn("lnp", log(when(col("c1").isNull, col("pcont")).otherwise(
        greatest(coalesce(col("c2"), lit(0L)).cast(DoubleType) - d, lit(0.0))
          / col("c1").cast(DoubleType) +
          d * col("nfw").cast(DoubleType) / col("c1").cast(DoubleType)
            * col("pcont"))))
    val sc = occ.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        avg(col("lnp")).as("__alp__"))
    docs.select("doc_id").join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(exp(-col("__alp__")), lit(0.0)), 6).as("ppl"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1 "repetition
    * filters"): per document, the character-coverage of the single most
    * frequent word 2-gram and the fraction of word characters inside
    * `dupN`-grams that occur more than once (overlaps counted, the standard
    * approximation; Gopher uses 5..10 — on the synthetic corpus 3 is the
    * informative setting, and the gate query pins dupN=3). High values flag boilerplate / TBH-spam documents that
    * exact+near dedup miss because the repetition is INTERNAL to one doc.
    *
    * Shape: explode word n-grams → groupBy(doc_id, gram) with map-side
    * partial counts → per-doc aggregate → join back on doc_id. Every shuffle
    * is keyed by doc_id (+gram), so the fan-out is bounded by document
    * length, never corpus size — the same plan holds at 100 TB.
    *
    * Char conventions: `char_total` = sum of word lengths (separators
    * excluded); an n-gram rendered "a b c" covers `length - (n-1)` word
    * chars. Ties for the top gram break on the lexicographically LARGEST
    * gram (max over (count, gram) structs — mirrored in the oracle's
    * `ORDER BY cnt DESC, g DESC`).
    */
  def repetition(docs: DataFrame, dupN: Int = 3): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("w"))
      .withColumn("n_words", size(col("w")).cast(LongType))
      .withColumn("char_total",
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x).cast(LongType)))

    def grams(n: Int): DataFrame =
      base.filter(size(col("w")) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + 1, lit(n)), " "))).as("g"))

    val top2 = grams(2).groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(max(struct(col("cnt"), col("g"))).as("m"))
      .select(col("doc_id"), col("m.g").as("top_2gram"),
        (col("m.cnt") * (length(col("m.g")) - 1)).cast(DoubleType).as("top2_chars"))

    val dupG = grams(dupN).groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .groupBy("doc_id")
      .agg(sum(col("cnt") * (length(col("g")) - (dupN - 1))).cast(DoubleType).as("dup_chars"))

    base.join(top2, Seq("doc_id"), "left").join(dupG, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("top_2gram"), lit("")).as("top_2gram"),
        when(col("char_total") === 0, 0.0)
          .otherwise(round(coalesce(col("top2_chars"), lit(0.0)) / col("char_total").cast(DoubleType), 6))
          .as("top_2gram_frac"),
        when(col("char_total") === 0, 0.0)
          .otherwise(round(coalesce(col("dup_chars"), lit(0.0)) / col("char_total").cast(DoubleType), 6))
          .as(s"dup_${dupN}gram_frac"))
  }

  /** PII detection + redaction: emails, IPv4 addresses, NANP-style phone
    * numbers, SSN-shaped ids. Counts per category plus the redacted text,
    * all single-pass column expressions (codegen'd regex, no shuffle at
    * all — the ideal 100 TB shape: embarrassingly parallel over row groups).
    *
    * The patterns deliberately stay inside the regex subset with identical
    * semantics in Java regex and RE2 (character classes, bounded repeats,
    * `\b`; no backrefs/lookarounds) so one pattern string serves both the
    * engine and the DuckDB oracle. Redaction order is fixed (email, SSN,
    * phone, IP) so category placeholders never overlap.
    */
  /** BLOCKLIST phrase tagging — the banned-phrase filter every curation
    * pipeline runs (profanity lists, boilerplate markers, spam phrases).
    * Phrases are MIXED-LENGTH word sequences (1..n words) matched at word
    * level: each phrase is normalized through the SAME tokenizer as the
    * document text (lowercase `[a-z0-9]+` words), so "Hello, World!" and
    * "hello world" are the same phrase, "he key" never fires inside
    * "the key" (raw substring matching would), and overlapping repeats
    * ("x x x" vs phrase "x x") count per ADJACENCY (2) — a fixed,
    * engine-exact integer semantics. A phrase with no alphanumeric words
    * after normalization is rejected loudly (it could never match).
    *
    * Cost shape: the token array is derived ONCE per row (its own
    * projection, so CollapseProject cannot inline the regex walk into
    * every consumer — the row-30b2 no-CSE law), then for each DISTINCT
    * phrase length L present, one L-gram sliding pass + ONE membership
    * filter against the length-L phrase set (a gram equals at most one
    * phrase, so `size(filter(grams, in set))` IS the total match count
    * for that length — no per-phrase expression duplication). Pure map
    * over rows, zero shuffle at any corpus size. Output: doc_id, n_hits
    * (total matches across all phrases), flagged = n_hits > 0. */
  def blocklist(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist needs at least one phrase")
    val wordRe = "[a-z0-9]+".r
    val normed: Seq[Seq[String]] = phrases.map { p =>
      val ws = wordRe.findAllIn(p.toLowerCase(java.util.Locale.ROOT)).toSeq
      require(ws.nonEmpty,
        s"blocklist phrase '$p' has no [a-z0-9]+ words after normalization — it can never match")
      ws
    }
    val byLen: Seq[(Int, Seq[String])] = normed
      .map(ws => (ws.length, ws.mkString(" "))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val tk = col("__tk__")
    var out = docs.withColumn("__tk__", Dedup.tokens(col("text")))
    val hitCols = byLen.map { case (len, ps) =>
      // <len tokens → no L-grams; unguarded, sequence(1, size-(len-1))
      // would DESCEND through index 0 and element_at would throw
      val grams =
        if (len == 1) tk
        else when(size(tk) >= len,
          transform(sequence(lit(1), size(tk) - (len - 1)),
            i => concat_ws(" ", (0 until len).map(j => element_at(tk, i + j)): _*)))
          .otherwise(array().cast("array<string>"))
      val hname = s"__hits_${len}__"
      out = out.withColumn(hname,
        size(filter(grams, g => g.isin(ps: _*))).cast(LongType))
      col(hname)
    }
    out
      .withColumn("__nh__", hitCols.reduce(_ + _))
      .select(col("doc_id"),
        col("__nh__").as("n_hits"),
        (col("__nh__") > 0L).as("flagged"))
  }

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  def pii(docs: DataFrame, textCol: Column): DataFrame = {
    def cnt(re: String): Column =
      size(regexp_extract_all(textCol, lit(re), lit(0))).cast(LongType)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(textCol, lit(EmailRe), lit("<EMAIL>")),
            lit(SsnRe), lit("<SSN>")),
          lit(PhoneRe), lit("<PHONE>")),
        lit(Ipv4Re), lit("<IP>"))
    docs.select(col("doc_id"),
      cnt(EmailRe).as("n_emails"),
      cnt(Ipv4Re).as("n_ipv4"),
      cnt(PhoneRe).as("n_phones"),
      cnt(SsnRe).as("n_ssn"),
      (cnt(EmailRe) + cnt(Ipv4Re) + cnt(PhoneRe) + cnt(SsnRe)).as("pii_total"),
      redacted.as("redacted"))
  }

  /** Winnowing fingerprints: md5-hashed character 8-grams, sliding window of
    * 4, distinct window minima (Schleimer et al., SIGMOD'03 scheme). One row
    * per (doc_id, fingerprint hash). Hashing + windowing run in the native
    * single-pass [[graft.functions.Winnow]] expression (bit-identical to the
    * HOF/DuckDB formulation, without ~2N interpreted lambdas per doc). */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.Winnow.register(docs.sparkSession)
    docs
      .withColumn("fp", explode(expr("graft_winnow(lower(text))")))
      .select("doc_id", "fp")
  }

  /** Per-document top-`topK` terms by TF-IDF — the classic keyword /
    * topic-signal extractor (and the salience score behind sparse
    * retrieval indexes): `score = tf · ln(N / df)` with raw term
    * frequency and unsmoothed inverse document frequency, rounded to 6
    * decimals so the cross-engine `ln` sits nowhere near the hash.
    *
    * Scale shape: explode tokens → groupBy(doc_id, token) with map-side
    * partial counts (fan-out bounded by document length); the df table is
    * a second groupBy on the token key alone — vocabulary-sized, the
    * [[perplexity]] c1 budget — and joins back on the SAME bounded token
    * keys, no broadcast assumption; N rides a one-row broadcast
    * crossJoin; final top-k is a per-doc window (frame = that doc's
    * distinct terms). No collect, nothing keyed on corpus size.
    *
    * Determinism: ties inside a doc break by (score desc, token asc), so
    * equal-score terms rank alphabetically in both engines. */
  def tfidf(docs: DataFrame, topK: Int = 3): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(toks).as("token"))
    val tf = occ.groupBy("doc_id", "token")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val df = tf.groupBy("token")
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val n = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs")) // one row
    val scored = tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select("doc_id", "token", "tf", "score", "rk")
  }

  /** The Gopher rule battery (Rae et al. 2021 §A1.1) — the boolean
    * quality FILTER the 28-style heuristic scores approximate: a doc
    * passes iff it clears every rule. Rules implemented over whitespace
    * words (the paper's convention; [[tokenCounts]]'s ws regex):
    *  - word count within [minWords, maxWords]
    *  - mean word length within [3, 10]
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ `minStop` distinct Gopher stop words
    *    (the/be/to/of/and/that/have/with)
    *  - symbol-to-word ratio (# and …) ≤ 0.1
    * Paper defaults for the corpus knobs; every per-rule flag is emitted
    * alongside the verdict so a pipeline can loosen one rule without
    * re-deriving the rest. Pure per-row arithmetic — zero shuffle, the
    * filter rides along with the scan at any scale. */
  def gopherRules(docs: DataFrame, minWords: Long = 50,
                  maxWords: Long = 100000, minStop: Int = 2): DataFrame = {
    val stops = Array("the", "be", "to", "of", "and", "that", "have", "with")
    docs
      .withColumn("__w__", expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)"))
      .withColumn("n_words", size(col("__w__")).cast(LongType))
      .withColumn("mean_word_len",
        when(col("n_words") === 0, 0.0).otherwise(round(
          aggregate(col("__w__"), lit(0L), (a, w) => a + length(w).cast(LongType))
            .cast(DoubleType) / col("n_words").cast(DoubleType), 6)))
      .withColumn("frac_alpha",
        when(col("n_words") === 0, 0.0).otherwise(round(
          size(filter(col("__w__"), w => w.rlike("[A-Za-z]")))
            .cast(DoubleType) / col("n_words").cast(DoubleType), 6)))
      .withColumn("n_stop", // distinct stop TYPES present, case-folded
        size(filter(lit(stops), s =>
          array_contains(transform(col("__w__"), w => lower(w)), s)))
          .cast(LongType))
      .withColumn("symbol_ratio",
        when(col("n_words") === 0, 0.0).otherwise(round(
          (size(expr("regexp_extract_all(text, '#', 0)")) +
            size(expr("regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0)")))
            .cast(DoubleType) / col("n_words").cast(DoubleType), 6)))
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_alpha", col("frac_alpha") >= 0.8)
      .withColumn("r_stop", col("n_stop") >= minStop)
      .withColumn("r_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("pass",
        col("r_words") && col("r_mean_len") && col("r_alpha") &&
          col("r_stop") && col("r_symbol"))
      .select("doc_id", "n_words", "mean_word_len", "frac_alpha", "n_stop",
        "symbol_ratio", "r_words", "r_mean_len", "r_alpha", "r_stop",
        "r_symbol", "pass")
  }
}
