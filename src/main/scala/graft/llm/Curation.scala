package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup: benchmark decontamination, deterministic stratified
  * sampling, and token-budget domain mixing.
  *
  * Design rules for 100 TB (same contract as [[Dedup]]):
  *  - the benchmark/eval side of decontamination is SMALL (benchmarks are
  *    megabytes) — it is always the broadcast side; the corpus is scanned
  *    once and never shuffled on anything unbounded;
  *  - sampling decisions are pure per-row hash arithmetic (zero shuffle,
  *    zero state, reproducible across engines and re-runs);
  *  - budget cuts avoid the naive per-domain global sort: a banded
  *    two-phase cutoff aggregates token mass per (domain, quality-band)
  *    first (tiny), classifies whole bands, and only sorts the single
  *    boundary band per domain — the part of the data the cut actually
  *    depends on.
  */
object Curation {

  /** Whitespace token count (maximal runs of non-{space, tab, LF, CR}),
    * computed WITHOUT a regex engine: translate the three escape
    * whitespace chars to spaces, split on the literal space, drop empties.
    * Both this and the DuckDB oracle use the same formulation so the gate
    * never depends on two regex engines agreeing (the r8 `pack_blocks`
    * driver hash-miss — locally unreproducible — was only explicable as an
    * oracle-environment regexp skew; a single doc's token disagreement
    * cascades through the cumulative offset into many rows). */
  private[graft] def tokCount(text: Column): Column =
    size(filter(split(translate(text, "\t\n\r", "   "), " ", -1),
      t => t =!= lit(""))).cast(LongType)

  /** Tokenizer dispatch for the token-budget operators: "ws" (whitespace
    * words — the gate default, see [[tokCount]]'s oracle-stability note),
    * "bpe" ([[Bpe.tokenCount]] with the default merge table) or
    * "unigram_raw" ([[Unigram.rawTokenCount]] — byte-fallback subword
    * counts over the RAW text, the lossless budget a real pipeline
    * wants: case/punctuation/UTF-8 all priced, never dropped). All are
    * in-row codegen'd expressions; swapping tokenizers changes no plan
    * shape. */
  private def tokCountAs(text: Column, tokenizer: String): Column =
    tokenizer match {
      case "ws"          => tokCount(text)
      case "bpe"         => Bpe.tokenCount(text)
      case "bpe_raw"     => Bpe.tokenCountRaw(text)
      case "unigram_raw" => Unigram.rawTokenCount(text)
      // a persisted model: `dir:<path>` loads a [[TokenizerStore]] store
      // (memoized per path) — any of the six stored kinds counts here
      case d if d.startsWith("dir:") =>
        TokenizerStore.countCol(text, TokenizerStore.loadCached(
          org.apache.spark.sql.SparkSession.active, d.stripPrefix("dir:")))
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (expected ws | bpe | bpe_raw | " +
          "unigram_raw | dir:<path>)")
    }

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM-style n-gram
    * overlap check): flag every training document sharing any word n-gram
    * with a held-out benchmark set.
    *
    * `isBench` selects the benchmark rows out of `docs`; the remaining rows
    * are the training corpus under test. Output (one row per corpus doc):
    * `doc_id`, `n_grams` (distinct n-grams in the doc), `n_hits` (distinct
    * n-grams also present in the benchmark set), `contaminated`.
    *
    * Plan shape: benchmark grams are distinct-ed and BROADCAST (at real
    * scale: benchmarks ~MBs → at most a few million grams); the corpus-side
    * gram generator is map-only (in-row sliding window, [[Dedup.rawNgrams]]);
    * the broadcast left-join marks hits without moving the corpus; the only
    * shuffle is the final groupBy(doc_id) whose map-side partials are one
    * row per doc per partition.
    */
  def decontaminate(docs: DataFrame, isBench: Column, n: Int = 5): DataFrame =
    decontaminateCore(docs.filter(!isBench), docs.filter(isBench), n)

  /** Decontaminate `docs` against an EXTERNAL benchmark frame — any frame
    * with a `text` column, typically [[loadBenchmark]]'s output. Same
    * output and plan shape as [[decontaminate]] (bench grams
    * distinct+broadcast, corpus scanned once); this is the
    * production-shaped entry: real eval sets live in their own files, not
    * as rows of the corpus schema. */
  def decontaminateAgainst(docs: DataFrame, bench: DataFrame, n: Int = 5): DataFrame =
    decontaminateCore(docs, bench.select(lit(0L).as("doc_id"), col("text")), n)

  /** Load a held-out eval set from a JSONL file (one JSON object per
    * line — the lingua franca of published benchmark dumps). The text
    * under test is the first present of the common field spellings
    * `text` / `prompt` / `question` / `input`, null-coalesced per row so
    * mixed files work. Benchmarks are small (MBs), but the read is still
    * a distributed json scan — nothing is materialized on the driver. */
  def loadBenchmark(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val fields = Seq("text", "prompt", "question", "input")
      .filter(raw.columns.contains)
    require(fields.nonEmpty,
      s"$path has no text-bearing field (expected one of text/prompt/question/input)")
    raw.select(coalesce(fields.map(f => col(f).cast(StringType)): _*).as("text"))
      .filter(col("text").isNotNull && col("text") =!= "")
  }

  /** SEMANTIC decontamination: flag every corpus vector whose embedding
    * cosine against ANY benchmark vector reaches `minCosine` — catches the
    * paraphrased/translated eval leakage that n-gram overlap
    * ([[decontaminate]]) misses; run both in a real pipeline.
    *
    * Input frames carry (vec_id, embedding); `bench` is the eval set.
    * Output: one row per corpus vector — vec_id, max_cos (rounded),
    * contaminated.
    *
    * Plan shape: benchmarks are small → bench is BROADCAST and the corpus
    * is scanned once, map-only + one final groupBy(vec_id); cost is
    * |bench| codegen'd cosines per corpus vector. When the bench side
    * grows past broadcast comfort (rare for eval sets), the LSH-bucketed
    * variant is [[Ann.lshNearDup]]'s shape with bench as one side —
    * candidates only within shared hyperplane buckets. */
  def decontaminateEmbed(corpus: DataFrame, bench: DataFrame,
                         minCosine: Double): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val scored = corpus.as("c").join(
        broadcast(bench.select(col("vec_id").as("bid"),
          col("embedding").as("bemb")).as("b")),
        col("c.vec_id") =!= col("bid"))
      .select(col("c.vec_id").as("vec_id"),
        round(expr(s"${graft.functions.CosineSimilarity.FunctionName}(c.embedding, b.bemb)"), 6)
          .as("cos"))
      .groupBy("vec_id")
      .agg(max("cos").as("max_cos"))
    scored.select(col("vec_id"), col("max_cos"),
      (col("max_cos") >= minCosine).as("contaminated"))
  }

  private def decontaminateCore(corpus: DataFrame, benchDocs: DataFrame, n: Int): DataFrame = {
    val benchGrams = Dedup.rawNgrams(benchDocs, n)
      .select("g").distinct()
      .withColumn("__hit__", lit(1))
    val agg = Dedup.rawNgrams(corpus, n)
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("g")).as("n_grams"),
        countDistinct(when(col("__hit__") === 1, col("g"))).as("n_hits"))
    // Docs shorter than n tokens emit no gram rows — restore them with a
    // left join from the corpus spine so the output is one row per doc.
    corpus.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Sub-document (span-level) deduplication — the C4/RefinedWeb passage
    * removal step: the corpus is cut into DISJOINT `span`-token chunks, and
    * every repeated chunk keeps only its first occurrence (global order:
    * smallest (doc_id, chunk-index)). Whole-doc exact dedup misses a
    * boilerplate paragraph pasted into a thousand otherwise-distinct pages;
    * this catches it.
    *
    * Output: one row per doc — `doc_id`, `n_spans`, `n_kept`, and
    * `kept_frac` (rounded; 1.0 = nothing removed).
    *
    * Plan shape: chunking is in-row (token array → disjoint slices — no
    * sliding-window blowup: |chunks| = |tokens|/span); the only wide stage
    * is the groupBy on chunk hash (group size = a chunk's global duplicate
    * count) plus the per-doc re-aggregation. Winner selection is a min_by
    * on the (doc_id, chunk-idx) struct inside the same aggregation — no
    * join back against the corpus.
    */
  def dedupSpans(docs: DataFrame, span: Int = 15): DataFrame = {
    val chunked = docs
      .withColumn("__tk__", Dedup.tokens(col("text")))
      .select(col("doc_id"),
        posexplode_outer(expr(
          s"""transform(sequence(0, greatest(cast(ceil(size(__tk__) / ${span}.0) as int) - 1, 0)),
             |  c -> concat_ws(' ', slice(__tk__, c * $span + 1, $span)))""".stripMargin)))
      .withColumnRenamed("pos", "cidx")
      .withColumnRenamed("col", "chunk")
      .filter(col("chunk") =!= "") // empty docs produce one empty chunk
    val winners = chunked
      .groupBy(md5(col("chunk").cast(BinaryType)).as("h"))
      .agg(min(struct(col("doc_id"), col("cidx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.cidx").as("cidx"),
        lit(1L).as("__kept__"))
    docs.select("doc_id")
      .join(chunked.groupBy("doc_id").agg(count(lit(1)).as("n_spans")), Seq("doc_id"), "left")
      .join(winners.groupBy("doc_id").agg(sum("__kept__").as("n_kept")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(1.0))
          .otherwise(round(coalesce(col("n_kept"), lit(0L)).cast(DoubleType) /
            col("n_spans").cast(DoubleType), 6)).as("kept_frac"))
  }

  /** Exact-SUBSTRING deduplication (the suffix-array method of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * re-shaped for Spark): find every duplicated token run of length ≥ `k`
    * ANYWHERE in the corpus — unlike [[dedupSpans]], which only removes
    * repeats aligned to disjoint `span`-token chunk boundaries, so a
    * boilerplate passage shifted by one token escapes it entirely.
    *
    * Instead of a literal suffix array (a global sort of every suffix —
    * single-machine thinking), emit the SLIDING `k`-token gram at every
    * position (|tokens| rows per doc, the same explode budget as the
    * position-indexed suffix set), rank each gram's occurrences by
    * (doc_id, position) — first occurrence keeps it, every later one is a
    * duplicated position — then merge overlapping hit windows per doc with
    * one run-length lag window: a hit at position p covers `min(k, p -
    * prev_hit_p)` NEW tokens. The union of covered tokens is exactly the
    * token set lying inside some duplicated run ≥ k (any such run of
    * length L contributes L−k+1 consecutive hits whose merged coverage is
    * L), so `dup_tok` matches the suffix-array method's removal count.
    *
    * Output: one row per doc — `doc_id`, `n_tok`, `dup_tok` (tokens inside
    * non-first duplicated runs), `kept_frac = 1 − dup_tok/n_tok`. Docs
    * shorter than k tokens have no grams: `dup_tok = 0`, `kept_frac = 1`.
    *
    * Scale shape: the first-occurrence-per-gram choice is a
    * `groupBy(h).agg(min(struct(doc_id, p)))` — MAP-SIDE COMBINABLE, so a
    * boilerplate gram repeated 10⁸ times across a 100 TB corpus collapses
    * to one row per (mapper, h) before the shuffle and the reduce side
    * never sees a hot key (r11 verdict: the previous
    * `Window.partitionBy(h)` rank put ALL occurrences of a hot gram into
    * one single-task sort — the one uncapped-skew pattern in the
    * codebase; AQE splits skewed joins, not skewed windows). An
    * occurrence is a duplicated position iff it differs from its gram's
    * group-min; the equi-join back on `h` is AQE-skew-splittable and
    * per-row independent (no per-key sort). The run-merge window then
    * shuffles ONLY the hit rows (duplicated positions, a small fraction
    * of a healthy corpus) per doc. Never all-pairs, no global sort.
    * 60-bit collisions mark a false duplicate position at odds ~n²/2⁶¹ —
    * negligible against the grams they'd remove, and identical in the
    * DuckDB oracle (same md5-prefix hash).
    */
  def dedupSubstr(docs: DataFrame, k: Int = 15): DataFrame = {
    val toked = substrToked(docs)
    val grams = substrGrams(toked, k)
    val firsts = grams.groupBy("h")
      .agg(min(struct(col("doc_id"), col("p"))).as("__first__"))
    val hits = grams.join(firsts, Seq("h"))
      .filter(struct(col("doc_id"), col("p")) =!= col("__first__"))
      .select("doc_id", "p")
    substrCoverage(toked, hits, k)
  }

  /** Tokenized frame shared by [[dedupSubstr]] and [[SubstrIndex]]. */
  private[llm] def substrToked(docs: DataFrame): DataFrame =
    docs.withColumn("__tk__", Dedup.tokens(col("text")))

  /** The sliding k-gram position frame (doc_id, p, h) over a
    * [[substrToked]] frame — h is the 60-bit md5 gram hash. */
  private[llm] def substrGrams(toked: DataFrame, k: Int): DataFrame =
    toked
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(__tk__) >= $k
           | THEN transform(sequence(0, size(__tk__) - $k),
           |   p -> concat_ws(' ', slice(__tk__, p + 1, $k)))
           | ELSE array() END""".stripMargin)))
      .select(col("doc_id"), col("pos").cast(LongType).as("p"),
        Dedup.md5Hash60(col("col")).as("h"))

  /** Run-length-merge duplicated-position hits into per-doc coverage:
    * a hit at p covers `min(k, p − prev_hit_p)` new tokens; output is
    * the (doc_id, n_tok, dup_tok, kept_frac) contract of
    * [[dedupSubstr]]. The window shuffles ONLY the hit rows per doc. */
  private[llm] def substrCoverage(toked: DataFrame, hits: DataFrame,
                                  k: Int): DataFrame = {
    val runW = Window.partitionBy("doc_id").orderBy("p")
    val cover = hits
      .withColumn("__pp__", lag(col("p"), 1).over(runW))
      .groupBy("doc_id")
      .agg(sum(when(col("__pp__").isNull, lit(k.toLong))
        .otherwise(least(lit(k.toLong), col("p") - col("__pp__")))).as("dup_tok"))
    toked.select(col("doc_id"), size(col("__tk__")).cast(LongType).as("n_tok"))
      .join(cover, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("dup_tok"), lit(0L)).as("dup_tok"),
        when(col("n_tok") === 0, lit(1.0))
          .otherwise(round(lit(1.0) -
            coalesce(col("dup_tok"), lit(0L)).cast(DoubleType) /
              col("n_tok").cast(DoubleType), 6)).as("kept_frac"))
  }

  /** Deterministic hash-stratified sampling: keep a document iff its md5
    * bucket (0..99, derived from the text so resampling a re-crawled corpus
    * is stable) falls under its stratum's configured percentage.
    *
    * Pure per-row arithmetic — no shuffle, no RNG state, reproducible in
    * any engine (`('0x'||substr(md5(text),1,6))::BIGINT % 100` in DuckDB).
    * This is how a 100 TB pipeline takes a "20% of web, 80% of books" mix:
    * the decision function rides along with the scan.
    */
  def sampleStratified(docs: DataFrame, strataCol: Column,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("text").cast(BinaryType)), 1, 6), 16, 10)
      .cast(LongType), lit(100L))
    val rate = rates.foldLeft(lit(defaultRate).cast(LongType)) {
      case (acc, (k, v)) => when(strataCol === k, lit(v.toLong)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), strataCol.as("stratum"), col("bucket"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, A-ES): every doc draws key = u^(1/w) from a
    * doc_id-seeded uniform u and its weight w, and the n largest keys ARE
    * a weight-proportional sample without replacement — the one-pass,
    * coordination-free way to take "n docs, quality-weighted" out of a
    * corpus (weights from a quality score, token count, source priority).
    *
    * Determinism across engines: u = (h + 0.5) / 2^48 over the first 48
    * md5 bits of "wsamp:<doc_id>" — a dyadic rational, exact in binary in
    * any engine; pow/division are the only continuum ops and the key is
    * rounded at 9 decimals before ranking (libm pow differs by ≤ ~1 ulp
    * ≈ 1e-16 between engines — against a 5e-10 half-up window that is a
    * ~1e-7 per-row flip risk, vs ~1e-4 at round-12), ties by doc_id.
    *
    * Scale shape: key derivation is pure per-row arithmetic riding the
    * scan; the global top-n is orderBy+limit — Spark's TakeOrderedAndProject
    * (per-partition heaps + one n-row merge on the driver), NOT a global
    * sort or a partition-less window. Weight 0 docs draw key 0 (u^∞) and
    * are naturally excluded. */
  def sampleWeighted(docs: DataFrame, weightCol: Column, n: Int): DataFrame = {
    val h = conv(substring(md5(concat(lit("wsamp:"),
      col("doc_id").cast(StringType)).cast(BinaryType)), 1, 12), 16, 10)
      .cast(DoubleType)
    val u = (h + lit(0.5)) / lit(281474976710656.0) // 2^48, exact dyadic
    docs.select(col("doc_id"), weightCol.cast(DoubleType).as("weight"))
      // explicit 0-weight guard (ANSI division): key 0, never sampled
      .withColumn("skey", when(col("weight") > 0,
        round(pow(u, lit(1.0) / col("weight")), 9)).otherwise(lit(0.0)))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(n)
  }

  /** Deterministic global shuffle + shard assignment — the export step
    * between curation and the training run: a corpus is never fed in
    * crawl order (adjacent documents share a site/domain and correlate
    * batches), so the last pipeline stage deals every document to one of
    * `nShards` output shards by hash and orders it WITHIN its shard by a
    * second hash. The result is a reproducible random permutation that
    * any reader can verify — re-running the pipeline (or re-exporting a
    * re-crawl) deals every unchanged doc_id to the same (shard, pos).
    *
    * Output: (doc_id, shard, pos) with pos 1-based in shard order.
    *
    * Scale shape: shard and order keys are pure per-row md5 arithmetic;
    * the only wide stage is the per-shard row_number window, whose
    * partition is one OUTPUT SHARD — and `nShards` is chosen at export
    * time precisely so a shard is a file-sized unit (the 100 TB export
    * picks ~100k shards of ~1 GB), so the window partitions are bounded
    * by a knob, not by corpus skew. Writing the result
    * `partitionBy("shard")` then streams each shard's rows into its own
    * directory, already in training order. */
  def shardAssign(docs: DataFrame, nShards: Int): DataFrame = {
    val key = conv(substring(md5(concat(lit("shard:"),
      col("doc_id").cast(StringType)).cast(BinaryType)), 1, 12), 16, 10)
      .cast(LongType)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__key__").asc, col("doc_id").asc)
    docs.select(col("doc_id"), key.as("__key__"))
      .withColumn("shard", pmod(col("__key__"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "shard", "pos")
  }

  /** TOKEN-balanced shard assignment — sorted round-robin (the
    * longest-processing-time family): docs ranked by token count
    * descending (ties by doc_id), rank r dealt to shard (r−1) mod
    * nShards. [[shardAssign]] balances COUNTS in expectation (hash deal);
    * this balances token MASS deterministically — consecutive ranks have
    * near-equal sizes, so the deal keeps every shard's token sum within
    * ~one max-document of the mean (the classic bound), which is what a
    * training run reading one shard per worker actually needs: equal
    * WORK per shard, not equal row counts.
    *
    * The global rank is NOT a global window (a single task sorting the
    * corpus): it decomposes into the bounded two-phase shape the repo's
    * prefix sums use — (a) group by n_tokens: per-distinct-count group
    * sizes, prefix-summed over the SORTED DISTINCT COUNTS (a frame
    * bounded by the doc-length value range, never by corpus size — the
    * one partition-less window, allowlisted), (b) row_number within each
    * n_tokens partition + the group's offset = the exact global rank.
    *
    * Output: (doc_id, n_tokens, shard, pos), pos 1-based within shard in
    * descending-size order. */
  def shardBalanced(docs: DataFrame, nShards: Int): DataFrame = {
    val toked = docs.select(col("doc_id"),
      tokCount(col("text")).as("n_tokens"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = toked.groupBy("n_tokens").agg(count(lit(1)).as("__n__"))
      .withColumn("__off__", coalesce(sum(col("__n__")).over(wOff), lit(0L)))
      .select("n_tokens", "__off__")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("n_tokens").orderBy(col("doc_id").asc)
    toked.join(broadcast(offsets), Seq("n_tokens"))
      .withColumn("__rank__",
        col("__off__") + row_number().over(wIn).cast(LongType))
      .select(col("doc_id"), col("n_tokens"),
        pmod(col("__rank__") - 1, lit(nShards.toLong)).as("shard"),
        ((col("__rank__") - 1) / lit(nShards.toLong)).cast(LongType)
          .plus(1L).as("pos"))
  }

  /** Leakage-safe train/val/test split: every resolved duplicate CLUSTER
    * (from [[Dedup.duplicateClusters]]) is dealt to ONE split by a 48-bit
    * md5 of its cluster label, so near-duplicates can never straddle a
    * split boundary — the train/test contamination channel a per-document
    * split leaves open (a paraphrase twin of a test doc lands in train
    * and the eval leaks). u = key/2^48 ∈ [0,1) is cut by the cumulative
    * `fractions` (normalized); hashing the CLUSTER id — not the doc id —
    * is the entire point: cluster members share the key, hence the split.
    *
    * Scale shape: a pure map over the cluster frame (the hash and the
    * when-chain fuse into the upstream projection); no shuffle beyond
    * what cluster resolution already paid. Deterministic across runs,
    * partitionings and cluster counts (md5 on the label, not a seed). */
  def leakageSafeSplit(clusters: DataFrame,
                       fractions: Seq[(String, Double)] =
                         Seq(("train", 0.9), ("val", 0.05), ("test", 0.05))
                      ): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0.0),
      s"fractions must be positive: $fractions")
    val tot = fractions.map(_._2).sum
    val key = conv(substring(md5(concat(lit("split:"),
      col("cluster").cast(StringType)).cast(BinaryType)), 1, 12), 16, 10)
      .cast(LongType)
    val u = key.cast(DoubleType) / lit(math.pow(2.0, 48))
    val cuts = fractions.map(_._2 / tot).scanLeft(0.0)(_ + _).tail
    val lbl = fractions.init.zip(cuts.init)
      .foldRight(lit(fractions.last._1)) { case (((name, _), cut), rest) =>
        when(u < lit(cut), lit(name)).otherwise(rest)
      }
    clusters.select(col("doc_id"), col("cluster"), lbl.as("split"))
  }

  /** Sequence packing (GPT-style): documents are concatenated in doc_id
    * order and the token stream is cut into fixed `blockSize` blocks; each
    * doc reports the block span it lands in ([first_block, last_block]) and
    * its offset inside the first block — what a training pipeline needs to
    * materialize examples without re-tokenizing.
    *
    * The global running token offset is a prefix sum, computed scalably by
    * the same two-phase shape as [[mixByBudget]]: per doc_id-range bucket
    * token totals (tiny aggregate), a window over that tiny frame for
    * bucket base offsets, then a within-bucket window + base — no global
    * single-partition sort. Exactness: doc_id order is total, and bucket
    * boundaries respect it.
    *
    * `bucketWidth` bounds BOTH single-task windows: the bases frame is
    * N/bucketWidth rows (default 1e6 → 1e5 rows even at 100 B docs) and
    * each within-bucket partition is ≤ bucketWidth rows. Output is
    * bucketWidth-invariant (CurationSpec pins equality across widths).
    */
  def packSequences(docs: DataFrame, blockSize: Long,
                    bucketWidth: Long = 1000000L,
                    tokenizer: String = "ws"): DataFrame = {
    val toked = docs.select(col("doc_id"),
      tokCountAs(col("text"), tokenizer).as("tok"))
      .withColumn("bkt", floor(col("doc_id") / bucketWidth).cast(LongType))
    val baseW = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bases = toked.groupBy("bkt").agg(sum("tok").as("btok"))
      .withColumn("base", coalesce(sum("btok").over(baseW), lit(0L)))
      .select("bkt", "base")
    val inBkt = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toked.join(broadcast(bases), "bkt")
      .withColumn("off", col("base") + coalesce(sum("tok").over(inBkt), lit(0L)))
      .select(col("doc_id"), col("tok"), col("off"),
        (col("off") / blockSize).cast(LongType).as("first_block"),
        // empty docs occupy no tokens: span collapses onto first_block
        greatest((col("off") + col("tok") - 1) / blockSize, col("off") / blockSize)
          .cast(LongType).as("last_block"),
        pmod(col("off"), lit(blockSize)).as("block_offset"))
  }

  /** Cross-document BOILERPLATE LINE removal — the CCNet-family rule
    * content dedup doesn't cover: nav bars, cookie banners and footers
    * repeat VERBATIM across a site's pages without making whole pages
    * near-duplicates, so they survive document-level dedup and pollute
    * every downstream token. A line (split on \n) is boilerplate when
    * its normalized form (lowercased, trimmed) appears in ≥ `minDocs`
    * DISTINCT documents of the same `source` (or corpus-wide with
    * `bySource = false`); boilerplate lines are dropped, everything
    * else is reassembled in original order. Blank lines are NEVER
    * boilerplate (they are structure, and dropping every repeated empty
    * separator would mangle all documents).
    *
    * Scale shape: one line explode (map-local), one line-hash-keyed
    * aggregate with map-side-combined distinct-doc counting (a cookie
    * banner shared by a billion pages partial-aggregates before the
    * shuffle), one left join + per-document reassembly groupBy whose
    * collect is bounded by DOCUMENT size — two bounded-key shuffles,
    * nothing corpus-sized on any single task. The boilerplate set is
    * never collected to the driver.
    *
    * Output: (doc_id, clean_text, n_removed, n_kept). */
  def removeBoilerplate(docs: DataFrame, minDocs: Int,
                        bySource: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val scope = if (bySource) col("source") else lit("")
    val lines = docs
      .select(col("doc_id"), scope.as("__scope__"),
        posexplode(split(col("text"), "\n", -1)).as(Seq("idx", "line")))
      .withColumn("__blank__", trim(col("line")) === "")
      .withColumn("__h__", md5(lower(trim(col("line"))).cast(BinaryType)))
    val hot = lines.filter(!col("__blank__"))
      .groupBy("__scope__", "__h__")
      .agg(countDistinct(col("doc_id")).as("__nd__"))
      .filter(col("__nd__") >= minDocs)
      .select(col("__scope__"), col("__h__"), lit(true).as("__boil__"))
    lines.join(hot, Seq("__scope__", "__h__"), "left")
      .withColumn("__keep__", col("__boil__").isNull || col("__blank__"))
      .groupBy("doc_id")
      .agg(
        // when() without otherwise is null on removed lines, and
        // collect_list drops nulls — kept lines only, re-ordered by idx
        array_join(transform(
          array_sort(collect_list(when(col("__keep__"),
            struct(col("idx"), col("line"))))),
          x => x("line")), "\n").as("clean_text"),
        sum(when(col("__keep__"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("__keep__"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Canonical URL key: scheme off, fragment off, authority lowercased
    * with `www.` and default ports stripped, trailing slash off. Every
    * step is one regex both engines implement identically (no
    * lookarounds — RE2-safe), so the key is oracle-replayable. The
    * variants crawls actually serve as duplicates — http vs https,
    * www vs bare, trailing slash, #section anchors, Case in the host —
    * all collapse; querystrings are KEPT (two query URLs are different
    * resources; stripping tracker params is a site-specific policy the
    * caller applies upstream if wanted). */
  def urlKey(url: Column): Column = urlKey(url, Nil)

  /** [[urlKey]] with opt-in TRACKER-PARAM stripping: query parameters
    * whose name starts with any of `stripParamPrefixes` (utm_, fbclid,
    * gclid — the decoration ad links add that makes one resource look
    * like many URLs) are dropped from the key; the '?' disappears when
    * nothing survives. Param ORDER is preserved (full query-param
    * canonicalization — sorting, decoding — is a deeper policy the
    * caller owns). Split/filter/rejoin, no lookarounds — still
    * oracle-replayable. */
  def urlKey(url: Column, stripParamPrefixes: Seq[String]): Column = {
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*", "")
    val auth = regexp_extract(noFrag, "^[^/?]*", 0)
    val host = regexp_replace(
      regexp_replace(lower(auth), "^www\\.", ""), ":(80|443)$", "")
    val rest0 = regexp_replace(substring_index_tail(noFrag, auth), "/$", "")
    val rest =
      if (stripParamPrefixes.isEmpty) rest0
      else {
        val path = regexp_extract(rest0, "^[^?]*", 0)
        val query = substring_index_tail(rest0, path) // "?a=1&utm_x=2" or ""
        val kept = filter(split(regexp_replace(query, "^\\?", ""), "&", -1),
          p => not(stripParamPrefixes.map(pre => p.startsWith(pre))
            .reduce(_ || _)))
        concat(path,
          when(length(query) === 0 || size(kept) === 0, lit(""))
            .otherwise(concat(lit("?"), array_join(kept, "&"))))
      }
    concat(host, rest)
  }

  /** The path+query remainder after the authority — substring from
    * len(auth)+1, shared by [[urlKey]]. */
  private def substring_index_tail(full: Column, prefix: Column): Column =
    full.substr(length(prefix) + 1, length(full))

  /** Host part of a [[urlKey]], and its "registrable domain" under the
    * last-two-labels simplification (news.example.com → example.com) —
    * which is exactly the public-suffix algorithm's implicit `*` default
    * rule, i.e. what a [[PublicSuffixes]] table refines. This is the
    * NO-TABLE fallback; [[domainDedup]] takes an optional
    * [[PublicSuffixes]] for the real lookup (without one, `co.uk`-style
    * ccTLD families all collapse into one "domain" — fine for quick
    * slicing, wrong for a crawl-scale cap). */
  def urlDomain(key: Column): Column = {
    val host = regexp_extract(key, "^[^/?]*", 0)
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "[^.]+\\.[^.]+$", 0)).otherwise(host)
  }

  /** Per-URL dedup + per-domain cap — the first filter most crawl
    * pipelines run (the RefinedWeb/CCNet rule): ONE document per
    * canonical URL (keeper = min doc_id — crawls are ordered, the
    * earliest fetch wins; swap in keep-best upstream if a quality
    * score exists), then at most `maxPerDomain` documents per
    * registrable domain (order: doc_id asc — deterministic and
    * replayable).
    *
    * Scale shape: the URL keep-best is a plain min aggregate — map-side
    * combined, immune to hot-URL skew (a million copies of one URL
    * partial-aggregate down to one row per partition before the
    * shuffle). The domain cap is the SALTED TWO-PHASE top-N: a local
    * rank within (domain, salt = crc32(doc_id) mod nSalts) keeps ≤ cap
    * per salt — splitting a hot domain's millions across nSalts tasks —
    * then the global rank runs over the ≤ nSalts·cap survivors per
    * domain, a bounded frame. Exact: the global top-cap by (doc_id) is
    * a subset of the union of per-salt top-caps.
    *
    * `psl` plugs in the real registrable-domain lookup
    * ([[PublicSuffixes.withRegistrableDomain]] — broadcast rule joins on
    * the already-URL-deduped keepers); without it the grouping is the
    * last-two-labels fallback ([[urlDomain]] — the PSL's implicit `*`
    * default rule alone).
    *
    * Output: the kept rows as (doc_id, url_key, domain). */
  def domainDedup(docs: DataFrame, urlCol: String, maxPerDomain: Int,
                  nSalts: Int = 16,
                  stripParamPrefixes: Seq[String] = Nil,
                  psl: Option[PublicSuffixes] = None): DataFrame = {
    require(maxPerDomain >= 1 && nSalts >= 1,
      s"need maxPerDomain >= 1 and nSalts >= 1, got $maxPerDomain/$nSalts")
    val keyed = docs.select(col("doc_id"),
      urlKey(col(urlCol), stripParamPrefixes).as("url_key"))
    val keepers0 = keyed.groupBy("url_key").agg(min("doc_id").as("doc_id"))
    val keepers = psl match {
      case None    => keepers0.withColumn("domain", urlDomain(col("url_key")))
      case Some(p) => PublicSuffixes.withRegistrableDomain(keepers0, p)
    }
    val salted = keepers.withColumn("__salt__",
      pmod(crc32(col("doc_id").cast(StringType)), lit(nSalts.toLong)))
    val localW = Window.partitionBy("domain", "__salt__").orderBy("doc_id")
    val globalW = Window.partitionBy("domain").orderBy("doc_id")
    salted
      .withColumn("__lr__", row_number().over(localW))
      .filter(col("__lr__") <= maxPerDomain)
      .withColumn("__gr__", row_number().over(globalW))
      .filter(col("__gr__") <= maxPerDomain)
      .select("doc_id", "url_key", "domain")
  }

  /** First-fit-decreasing BIN packing — the other packing policy real
    * trainers use: where [[packSequences]] concatenates and CUTS (GPT
    * style, documents split across block boundaries), FFD packs whole
    * documents into fixed-`binSize` bins with NO document ever split
    * (T5/LLaMA-recipe style), trading some slack per bin for intact
    * examples.
    *
    * Deterministic and replayable: within each doc_id-range bucket
    * (same two-phase decomposition as [[packSequences]]) documents walk
    * in (tok DESC, doc_id ASC) order and each takes the lowest-indexed
    * bin it fits ([[graft.functions.FfdPack]] — a segment-tree first
    * fit, O(n log n) per bucket); a doc larger than binSize gets a
    * dedicated bin. Bucket-local bins become global via a prefix sum of
    * per-bucket bin counts over the TINY bucket frame — the same
    * no-global-sort shape as every prefix sum here. The DuckDB oracle
    * replays the identical walk with a recursive CTE, so the gate pins
    * the placement bin-for-bin.
    *
    * Scale shape: one groupBy(bkt) collect bounded by `bucketWidth`
    * rows per group (the explicit single-task bound, like every bucketed
    * window here), one broadcast of the bucket-bases frame, one explode.
    * Packing quality is per-bucket (FFD is ~11/9 OPT within a bucket;
    * cross-bucket consolidation would need a global walk — the
    * documented trade for unbounded scale).
    *
    * Output: (doc_id, tok, bin_id, bin_offset), bin_id globally dense
    * from 0. */
  def packBinsFFD(docs: DataFrame, binSize: Long,
                  bucketWidth: Long = 1000000L,
                  tokenizer: String = "ws"): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1, got $binSize")
    val toked = docs.select(col("doc_id"),
      tokCountAs(col("text"), tokenizer).as("tok"))
      .withColumn("bkt", floor(col("doc_id") / bucketWidth).cast(LongType))
    val packed = toked.groupBy("bkt")
      .agg(collect_list(struct(col("doc_id"), col("tok"))).as("ds"))
      .withColumn("p", org.apache.spark.sql.GraftExpr.column(
        graft.functions.FfdPack(
          org.apache.spark.sql.GraftExpr.expression(col("ds")), binSize)))
      .select(col("bkt"), col("p.n_bins").as("nbins"),
        col("p.placements").as("placements"))
    // packed is ONE ROW PER BUCKET (N/bucketWidth rows), so the base
    // prefix sum windows over it directly — no self-join, FfdPack runs
    // exactly once per bucket
    val baseW = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    packed
      .withColumn("base", coalesce(sum("nbins").over(baseW), lit(0L)))
      .select(col("base"), explode(col("placements")).as("pl"))
      .select(col("pl.doc_id").as("doc_id"), col("pl.tok").as("tok"),
        (col("base") + col("pl.bin") - 1L).as("bin_id"),
        col("pl.off").as("bin_offset"))
  }

  /** Token-budget domain mixing: per `source`, keep the highest-quality
    * documents until the running token total crosses `budget` (keep rule:
    * a doc is kept iff its inclusive cumulative token count, in
    * (quality_score DESC, doc_id ASC) order within its source, is ≤ budget).
    *
    * Semantically identical to one window
    * `sum(tok) OVER (PARTITION BY source ORDER BY p DESC, doc_id)` + filter
    * — which is what the DuckDB oracle runs — but a per-source global sort
    * does not survive 100×: one source can be terabytes, and a window
    * partition is a single task. Instead, a banded two-phase cutoff:
    *
    *  1. band each doc by `floor(quality_score·100)` and aggregate token
    *     mass per (source, band) — map-side combined, output ≤ |sources|·101
    *     rows;
    *  2. a window over that TINY aggregate computes the token mass strictly
    *     above each band, classifying bands as full (kept wholesale),
    *     dropped, or THE boundary band (≤ 1 per source);
    *  3. only boundary-band docs — one band's worth per source — are sorted;
    *     their window gets the band's token offset added so the inclusive
    *     cumulative sum matches the global definition exactly.
    *
    * Exactness: (quality DESC, doc_id) is a total order and band boundaries
    * respect it (equal scores share a band), so full ∪ boundary-kept is
    * row-for-row the same set the single window produces.
    */
  def mixByBudget(docs: DataFrame, budget: Long,
                  tokenizer: String = "ws"): DataFrame = {
    val scored = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score").as("p"))
      .join(docs.select(col("doc_id"), col("source"),
        tokCountAs(col("text"), tokenizer).as("tok")), "doc_id")
      .withColumn("band", floor(col("p") * 100).cast(IntegerType))

    // Phase 1+2: per-(source, band) token mass, then the mass strictly in
    // better bands. The aggregate is tiny; the window is over ≤101 rows per
    // source.
    val better = Window.partitionBy("source").orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bands = scored.groupBy("source", "band")
      .agg(sum("tok").as("btok"))
      .withColumn("above", coalesce(sum("btok").over(better), lit(0L)))
      .withColumn("status",
        when(col("above") + col("btok") <= budget, "full")
          .when(col("above") > budget, "drop")
          .otherwise("boundary"))

    val tagged = scored.join(broadcast(bands), Seq("source", "band"))
    val full = tagged.filter(col("status") === "full")
    // Phase 3: sort ONLY the boundary band (≤ one band per source).
    val inBand = Window.partitionBy("source", "band")
      .orderBy(col("p").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = tagged.filter(col("status") === "boundary")
      .withColumn("cum", col("above") + sum("tok").over(inBand))
      .filter(col("cum") <= budget)
    full.select("source", "doc_id", "tok")
      .unionByName(boundary.select("source", "doc_id", "tok"))
  }

  /** Temperature-flattened mixture sampling (the XLM-R / Pile mixing
    * knob): target source shares q_s ∝ m_s^alpha where m_s is the
    * source's token mass — alpha = 1 keeps natural proportions, alpha → 0
    * flattens toward uniform, lifting low-resource sources. Each doc is
    * then kept by a deterministic md5 draw at its source's keep-rate
    * `min(1, budget·q_s / m_s)`, so the realized corpus approximates
    * `budget` tokens at the flattened shares while staying reproducible
    * row-for-row across engines and re-runs (no RNG state).
    *
    * Plan shape: one groupBy(source) over token counts (tiny,
    * map-side-combined), the share arithmetic as a window over that
    * ≤|sources|-row frame, then a broadcast join back — the corpus is
    * scanned once and never shuffled. Rates are pre-rounded to 9 decimals
    * so the keep/drop comparison never sits on a cross-engine pow() ULP.
    * Output: kept (source, doc_id, tok, rate9). */
  def mixByTemperature(docs: DataFrame, alpha: Double, budget: Long,
                       tokenizer: String = "ws"): DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"),
      tokCountAs(col("text"), tokenizer).as("tok"),
      (pmod(conv(substring(md5(col("text").cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType), lit(16777216L)).cast(DoubleType) / 16777216.0).as("draw"))
    val masses = toked.groupBy("source").agg(sum("tok").as("m"))
      .withColumn("p", pow(col("m").cast(DoubleType), lit(alpha)))
      .withColumn("q", col("p") / sum("p").over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rate9", round(least(lit(1.0),
        lit(budget.toDouble) * col("q") / col("m").cast(DoubleType)), 9))
      .select("source", "rate9")
    toked.join(broadcast(masses), "source")
      .filter(col("draw") < col("rate9"))
      .select("source", "doc_id", "tok", "rate9")
  }

  /** Temperature mixing over DISCOVERED semantic domains instead of source
    * labels: each document's embedding is assigned to a k-means cluster
    * (first-K centroids, argmax cosine — the ann_ivf convention; swap in
    * [[Ann.lloydCentroids]] off the gate path) and [[mixByTemperature]]
    * flattens token mass across the clusters. This is the unsupervised
    * arm of domain balancing — when the corpus has no trustworthy source
    * labels (a web crawl), the mixture is balanced over what the
    * documents ARE, not where they came from.
    *
    * `embeddings` must carry (vec_id, embedding) with vec_id = doc_id.
    * Plan shape = mixByTemperature's plus one broadcast-crossJoin argmax
    * (map-only) and one doc_id join; the corpus text is still scanned
    * once and never shuffled. Output: kept (source = "cluster_<id>",
    * doc_id, tok, rate9). */
  def mixByCluster(docs: DataFrame, embeddings: DataFrame, alpha: Double,
                   budget: Long, nCentroids: Int = 16,
                   tokenizer: String = "ws"): DataFrame = {
    graft.functions.CosineSimilarity.register(docs.sparkSession)
    val cents = Ann.seedCentroids(embeddings, nCentroids)
    val asg = Ann.assignTo(embeddings, cents, 1)
      .select(col("vec_id").as("doc_id"), col("cent_id"))
    val clustered = docs.drop("source").join(asg, "doc_id")
      .withColumn("source", concat(lit("cluster_"), col("cent_id")))
    mixByTemperature(clustered, alpha, budget, tokenizer)
  }

  /** CCNet-style perplexity partitioning (Wenzek et al. 2020 §4.3): per
    * language, documents split into head / middle / tail thirds by
    * reference-LM perplexity ([[TextAnalysis.perplexity]] — low ppl =
    * most reference-like), and only `keepBuckets` survive — CCNet trains
    * on head+middle and drops the tail. The quality dial every
    * CommonCrawl pipeline ships: stricter (head only) for small clean
    * corpora, looser (all three, weighted) for scale.
    *
    * Thresholds come from a per-(lang, binned-ppl) HISTOGRAM, not a
    * per-lang global sort: ppl is binned to 2 decimals (CCNet itself
    * buckets integer percentiles from a sample), the histogram is a
    * map-side-combinable groupBy on (lang, bin) — bounded by ppl range ×
    * 100, not corpus size — and the tercile cutoffs t1/t2 are the
    * smallest bins whose cumulative count reaches ⅓ and ⅔ of the
    * language's docs (integer arithmetic: cum·3 ≥ n, cum·3 ≥ 2n — no
    * float percentile semantics to disagree on). The only window runs
    * over one language's BINS; thresholds broadcast back by lang. Docs
    * whose bin sits exactly on a cutoff land in the lower bucket in both
    * engines (≤ on exact round-2 doubles).
    *
    * Output: (doc_id, lang, ppl, bucket, keep). */
  def mixByPerplexity(docs: DataFrame, refFilter: Column,
                      alpha: Double = 1.0,
                      keepBuckets: Seq[String] = Seq("head", "middle")): DataFrame = {
    // ppl has two consumers (the threshold histogram and the final bucket
    // join) and Catalyst does not CSE across them — without the lazy
    // persist the whole perplexity subtree (its LM scans included) runs
    // twice (observed as 12 scans / 23 exchanges in the first PLANS run;
    // the duplicateClusters `hop` convention)
    val ppl = TextAnalysis.perplexity(docs, refFilter, alpha)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("pb", round(col("ppl"), 2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = ppl.groupBy("lang", "pb").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("lang").orderBy("pb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val thr = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .groupBy("lang")
      .agg(min(when(col("cum") * 3 >= col("n"), col("pb"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("pb"))).as("t2"))
    val bucket = when(col("pb") <= col("t1"), lit("head"))
      .when(col("pb") <= col("t2"), lit("middle"))
      .otherwise(lit("tail"))
    ppl.join(broadcast(thr), "lang")
      .withColumn("bucket", bucket)
      .withColumn("keep", col("bucket").isInCollection(keepBuckets))
      .select("doc_id", "lang", "ppl", "bucket", "keep")
  }

  /** T5-style span corruption, made deterministic: tokens are chunked
    * into `span`-sized pieces and chunk `c` of doc `d` is masked iff
    * `(c + d) % period == 0` (corruption rate span/(span·period) =
    * 1/period of chunks ≈ 1/period of tokens — the T5 paper's 15% at the
    * defaults). Masked chunks are replaced by `<X_k>` sentinels (k = the
    * chunk's rank among the doc's masked chunks, 0-based) in the input;
    * the target is the sentinel-prefixed masked spans in order — the
    * (input, target) pair a span-corruption pretraining objective feeds
    * the model.
    *
    * Deterministic-by-hash rather than RNG so the gate (and any re-run)
    * reproduces examples bit-for-bit; swap the `(c + d) % period` site
    * for a seeded hash for production variety. Plan: in-row chunking
    * (|chunks| = |tokens|/span), one posexplode + per-doc window for the
    * sentinel ranks + one groupBy(doc_id) — the dedup_spans shuffle
    * budget. Empty docs emit nothing. */
  def spanCorrupt(docs: DataFrame, span: Int = 3, period: Int = 7): DataFrame = {
    val tk = filter(split(translate(col("text"), "\t\n\r", "   "), " ", -1),
      t => t =!= lit(""))
    val nChunks = ceil(size(tk).cast(DoubleType) / span).cast(IntegerType)
    val chunks = docs
      .select(col("doc_id"), tk.as("tk"), nChunks.as("nc"))
      .filter(col("nc") > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1), c => struct(
          c.cast(LongType).as("c"),
          (pmod(c.cast(LongType) + col("doc_id"), lit(period.toLong)) === 0).as("m"),
          array_join(slice(col("tk"), c * span + 1, lit(span)), " ").as("txt")))))
      .select(col("doc_id"), col("col.c").as("c"), col("col.m").as("m"),
        col("col.txt").as("txt"))
    val before = Window.partitionBy("doc_id").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = chunks.withColumn("k",
      coalesce(sum(when(col("m"), 1L).otherwise(0L)).over(before), lit(0L)))
    ranked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        array_join(transform(sort_array(collect_list(struct(col("c"),
          when(col("m"), concat(lit("<X_"), col("k"), lit(">")))
            .otherwise(col("txt")).as("piece")))), s => s("piece")), " ")
          .as("input_text"),
        array_join(transform(sort_array(collect_list(when(col("m"),
          struct(col("c"), concat(lit("<X_"), col("k"), lit("> "), col("txt"))
            .as("piece"))))), s => s("piece")), " ").as("target_text"))
      .select(col("doc_id"), col("n_chunks"), col("n_masked"),
        col("input_text"), col("target_text"))
  }

  /** Sliding-window token chunking with overlap — the document→example
    * step of a RAG index build or a long-context pretraining shard:
    * windows of `chunkSize` tokens advancing by `stride` (overlap =
    * chunkSize - stride). Window starts are 0, stride, 2·stride, …;
    * the LAST window is the first one whose span reaches the end of the
    * doc, so every token is covered and at most one trailing window is
    * short. Empty docs emit nothing.
    *
    * Output: (doc_id, chunk_id, n_tok, chunk_text).
    *
    * Plan shape: ZERO shuffles — tokenize, window-count, and slice are
    * all in-row; the explode fans each doc into its ~n/stride windows on
    * the partition it already lives on. At 100 TB this is a pure map
    * stage that pipelines into whatever consumes the chunks. */
  def chunkOverlap(docs: DataFrame, chunkSize: Int = 64,
                   stride: Int = 48, tokenizer: String = "ws"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    // Under "bpe", chunk_text joins SUBWORD tokens with spaces — a token
    // rendering of the window, not a substring of the original text.
    val tk = tokenizer match {
      case "ws"  => filter(split(translate(col("text"), "\t\n\r", "   "), " ", -1),
        t => t =!= lit(""))
      case "bpe" => Bpe.tokens(col("text"))
      // byte-level pieces in byte-char spelling (Ġthe …) — the GPT-2
      // display form; lossless window rendering
      case "bpe_raw" => Bpe.tokensRaw(col("text"))
      // stored BPE models chunk with their own merge table; the
      // Viterbi/greedy families have no token-ARRAY column form here
      case d if d.startsWith("dir:") =>
        TokenizerStore.loadCached(org.apache.spark.sql.SparkSession.active,
            d.stripPrefix("dir:")) match {
          case BpeModel(m, false) => Bpe.tokens(col("text"), m)
          case BpeModel(m, true)  => Bpe.tokensRaw(col("text"), m)
          case other => throw new IllegalArgumentException(
            s"chunkOverlap needs a BPE-family stored tokenizer, got ${other.kind}")
        }
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (expected ws | bpe | bpe_raw | dir:<path>)")
    }
    docs.select(col("doc_id"), tk.as("tk"),
        size(tk).cast(LongType).as("n"))
      .filter(col("n") > 0)
      .withColumn("nc",
        ceil(greatest(col("n") - chunkSize, lit(0L)).cast(DoubleType) / stride)
          .cast(LongType) + 1L)
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_id") * stride)
          .as("n_tok"),
        array_join(slice(col("tk"), (col("chunk_id") * stride + 1)
          .cast(IntegerType), lit(chunkSize)), " ").as("chunk_text"))
  }

  /** CONTENT-DEFINED CHUNKING (the Rabin-fingerprint boundary rule of LBFS,
    * Muthitacharoen et al. SOSP'01; the family FastCDC optimizes): cut a
    * document after every position whose trailing `w`-char window hashes to
    * 0 mod `div` — so a boundary depends ONLY on the w chars before it,
    * never on absolute offsets. That is the property fixed-size chunking
    * lacks and dedup at scale needs: inserting or deleting bytes shifts
    * every fixed-size block after the edit (nothing dedups), while CDC
    * re-synchronizes within w chars — all other chunks keep their content
    * hash and chunk-level dedup still finds them (the law LlmSpec pins).
    * Expected chunk length ≈ `div` chars; no min/max clamp, so the
    * boundary set of a substring is exactly the global boundary set
    * restricted to it (the clampless rule keeps the resync law EXACT, and
    * the geometric length tail is fine for dedup — this is a fingerprint
    * unit, not an IO unit).
    *
    * Output: (doc_id, chunk_idx, start, chunk_len, chunk_hash) — 1-based
    * char offsets, md5 content hash; ~n/div rows per doc. Chunk-level
    * near-dup = join on chunk_hash downstream (the [[Dedup]] consumers).
    *
    * Plan shape: ZERO shuffles — the boundary scan is an in-row filter
    * over char positions (one 48-bit md5 per position, the
    * [[TextAnalysis.fingerprints]] cost class), the chunk fan-out an
    * in-row explode. Pure map at any corpus size. */
  def chunkCdc(docs: DataFrame, w: Int = 16, div: Int = 64): DataFrame = {
    require(w >= 2 && div >= 2, s"need w >= 2 and div >= 2, got w=$w div=$div")
    val t = col("__t__")
    val n = col("__n__")
    def h48(c: Column): Column =
      conv(substring(md5(c.cast(BinaryType)), 1, 12), 16, 10).cast(LongType)
    // positions w..n-1 (a cut at the doc end would mint an empty chunk);
    // guarded: sequence() DESCENDS through an inverted range
    val bounds = when(n > w,
        filter(sequence(lit(w), n - 1),
          p => h48(concat(lit("cdc:"), t.substr(p - (w - 1), lit(w))))
            % div === 0))
      .otherwise(array().cast(ArrayType(IntegerType)))
    docs
      .select(col("doc_id"), col("text").as("__t__"),
        length(col("text")).as("__n__"))
      .filter(n > 0)
      .withColumn("__b__", bounds)
      .select(col("doc_id"), t, n, col("__b__"),
        explode(sequence(lit(1), size(col("__b__")) + 1)).as("__i__"))
      .withColumn("__s__", when(col("__i__") === 1, lit(1))
        .otherwise(element_at(col("__b__"), col("__i__") - 1) + 1))
      .withColumn("__e__", when(col("__i__") === size(col("__b__")) + 1, n)
        .otherwise(element_at(col("__b__"), col("__i__"))))
      .select(col("doc_id"),
        (col("__i__") - 1).cast(LongType).as("chunk_idx"),
        col("__s__").cast(LongType).as("start"),
        (col("__e__") - col("__s__") + 1).cast(LongType).as("chunk_len"),
        md5(t.substr(col("__s__"), col("__e__") - col("__s__") + 1)
          .cast(BinaryType)).as("chunk_hash"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus doc
    * by how much more likely its hashed-n-gram bag is under the TARGET
    * distribution than under the raw-corpus distribution,
    * `w(doc) = Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))]`
    * over the doc's unigrams + bigrams hashed into `buckets` buckets
    * (add-1 smoothing both sides). High-weight docs "look like" the
    * target domain; resampling by weight shifts the corpus mix toward it
    * without a trained classifier.
    *
    * `isTarget` marks the target-domain exemplar rows inside `docs` (they
    * are scored too — raw = everything). Deterministic: the feature hash
    * is md5-based, so weights reproduce bit-for-bit across engines;
    * weights are rounded to 6 decimals to keep the float-sum order off
    * the gate. Output: (doc_id, n_grams, w6).
    *
    * Plan shape: gram→bucket is in-row; everything downstream consumes
    * ONE (doc_id, b)-level count aggregate, so the corpus is scanned —
    * and the 2·|tokens| md5 hashes computed — exactly once: the bucket
    * distribution is a second tiny aggregate over it (≤ buckets keys,
    * map-side combined), the λ table (≤ buckets rows) broadcasts back,
    * and per-doc scoring regroups the same exchange output
    * (ReusedExchange in the executed plan, the group_ratio
    * structural-CSE trick). Nothing scales with corpus size except the
    * one scan. */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = 4096): DataFrame = {
    val tk = filter(split(translate(col("text"), "\t\n\r", "   "), " ", -1),
      t => t =!= lit(""))
    val base = docs.select(col("doc_id"), isTarget.as("tgt"), tk.as("tk"))
    val bigrams = when(size(col("tk")) >= 2,
      expr("transform(sequence(1, size(tk) - 1), " +
        "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"))
      .otherwise(array().cast(ArrayType(StringType)))
    val grams = base.select(col("doc_id"), col("tgt"),
      explode(concat(col("tk"), bigrams)).as("g"))
    val bucketed = grams.select(col("doc_id"), col("tgt"),
      pmod(conv(substring(md5(col("g").cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType), lit(buckets.toLong)).as("b"))
    // Materialize the doc×bucket counts ONCE: the distribution branch and
    // the scoring branch prune different columns, so Catalyst plans two
    // full gram scans (md5 ×2 over every token) without it. Checkpoint
    // reliably when a checkpoint dir is configured (cluster), else
    // localCheckpoint (single-JVM tools) — the duplicateClusters pattern.
    val bc0 = bucketed.groupBy("doc_id", "tgt", "b")
      .agg(count(lit(1)).as("cnt"))
    val sc = docs.sparkSession.sparkContext
    val bcounts =
      if (sc.getCheckpointDir.isDefined) bc0.checkpoint()
      else bc0.localCheckpoint()
    val counts = bcounts.groupBy("b").agg(
      sum("cnt").as("cr"),
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("ct"))
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lam = counts
      .withColumn("tr", sum("cr").over(whole))
      .withColumn("tt", sum("ct").over(whole))
      .select(col("b"),
        (log((col("ct") + 1.0) / (col("tt") + buckets.toDouble)) -
         log((col("cr") + 1.0) / (col("tr") + buckets.toDouble))).as("lam"))
    bcounts.join(broadcast(lam), "b")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"),
        round(sum(col("cnt") * col("lam")), 6).as("w6"))
      .select(col("doc_id"), col("n_grams"), col("w6"))
  }

  /** Deterministic md5-derived weight fixture in [-0.5, 0.5): a stand-in
    * with the exact shape of a trained fastText-format weight vector
    * (one weight per hash bucket) so the scoring machinery is gate-able;
    * production callers pass their trained table to [[classifierScore]]
    * instead. Same dyadic-rational derivation as [[Ann.planeComponent]]. */
  def hashWeightFixture(spark: SparkSession, buckets: Int = 4096): DataFrame =
    spark.range(buckets).select(col("id").as("b"),
      ((pmod(conv(substring(md5(concat(lit("w:"),
          col("id").cast(StringType)).cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType), lit(65536L)) - 32768L).cast(DoubleType) / 65536.0)
        .as("w"))

  /** Model-based quality scoring (the DCLM / FineWeb-edu-shaped filter):
    * a linear classifier over hashed n-gram features, fastText-style —
    * logit = bias + Σ_g w[bucket(g)] / n_grams (mean-pooled counts), keep
    * iff logit > 0. The feature bag is EXACTLY [[dsirWeights]]'s machinery
    * (uni+bigrams, md5 → `buckets`), so a pipeline computing both shares
    * the gram scan; `weights` is a (b, w) table — trained weights in
    * production, [[hashWeightFixture]] by default for reproducibility.
    *
    * Plan shape: grams and buckets are in-row; one doc-keyed aggregation
    * builds counts; the weight table is tiny and BROADCAST into the dot
    * product — the corpus is scanned once, the only shuffle is the
    * bounded (doc_id, b) count. Docs with zero grams emit nothing (same
    * contract as [[dsirWeights]]). Logits round to 6 decimals so the
    * keep threshold never sits on a float-sum ULP. */
  def classifierScore(docs: DataFrame, weights: Option[DataFrame] = None,
                      buckets: Int = 4096, bias: Double = 0.0): DataFrame = {
    val w = weights.getOrElse(hashWeightFixture(docs.sparkSession, buckets))
    val tk = filter(split(translate(col("text"), "\t\n\r", "   "), " ", -1),
      t => t =!= lit(""))
    val base = docs.select(col("doc_id"), tk.as("tk"))
    val bigrams = when(size(col("tk")) >= 2,
      expr("transform(sequence(1, size(tk) - 1), " +
        "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"))
      .otherwise(array().cast(ArrayType(StringType)))
    val grams = base.select(col("doc_id"),
      explode(concat(col("tk"), bigrams)).as("g"))
    val bucketed = grams.select(col("doc_id"),
      pmod(conv(substring(md5(col("g").cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType), lit(buckets.toLong)).as("b"))
    bucketed.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      .join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"), sum(col("cnt") * col("w")).as("dot"))
      .select(col("doc_id"), col("n_grams"),
        round(lit(bias) + col("dot") / col("n_grams"), 6).as("logit6"))
      .withColumn("keep", col("logit6") > 0.0)
  }

  /** Train the [[classifierScore]] weight table — full-batch logistic
    * regression over the SAME mean-pooled hashed uni+bigram feature bag,
    * the DCLM / FineWeb-edu workflow: a labeled seed set (`target` marks
    * the positive class) fits a linear quality filter that then runs over
    * the whole corpus through [[classifierScore]]. Until r12 the scorer
    * shipped only an md5 weight FIXTURE; this closes the loop — the
    * repo can now produce the weights it consumes.
    *
    * Deterministic by construction, so the training RUN itself gates
    * against DuckDB ([[graft.queries.LlmQueries.oracleClassifierTrain]]
    * replays it in unrolled CTEs — the [[Bpe.oracleTrainSql]] pattern):
    * weights zero-initialized over the OBSERVED buckets (an unobserved
    * bucket's gradient is identically zero, so the restriction loses
    * nothing), then a FIXED count of full-batch gradient steps
    *   `w ← round(w − lr · Σ_d (σ(⟨w, x_d⟩) − y_d) · x_{d,b} / N, 6)`
    * with the bias riding as feature b = −1 (x = 1 for every doc). The
    * round-6 after EVERY update is the cross-engine sync point: pre-round
    * summation-order skew is ~1e-13 relative, both engines quantize to
    * the same table, and iteration i+1 starts from identical state — the
    * [[mixByTemperature]] pre-rounding rule applied to a training loop.
    *
    * Scale shape: the feature frame (doc_id, y, b, x) is built once and
    * checkpointed (the [[dsirWeights]] rule — it has two consumers per
    * iteration); each iteration is two bounded shuffles — a doc-keyed
    * margin aggregation and a (≤ buckets+1)-group gradient aggregation —
    * with the weight table always BROADCAST into the dot product.
    * Nothing corpus-sized touches the driver (the per-round weight frame
    * is persisted and its parent released — the [[Bpe.learnMerges]]
    * lifecycle); cost is `iters` × (two bounded jobs), independent of
    * corpus width. Docs with zero grams carry no features and are
    * excluded from N, matching [[classifierScore]]'s emit-nothing
    * contract.
    *
    * Returns (b, w) with bucket −1 holding the bias: feed
    * `.filter(col("b") >= 0)` and the b = −1 value straight into
    * [[classifierScore]] (CurationSpec pins the drop-in). */
  def trainClassifier(docs: DataFrame, target: Column, buckets: Int = 4096,
                      iters: Int = 4, lr: Double = 1.0): DataFrame = {
    val tk = filter(split(translate(col("text"), "\t\n\r", "   "), " ", -1),
      t => t =!= lit(""))
    val base = docs.select(col("doc_id"),
      target.cast(DoubleType).as("y"), tk.as("tk"))
    val bigrams = when(size(col("tk")) >= 2,
      expr("transform(sequence(1, size(tk) - 1), " +
        "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"))
      .otherwise(array().cast(ArrayType(StringType)))
    val cnts = base.select(col("doc_id"), col("y"),
        explode(concat(col("tk"), bigrams)).as("g"))
      .select(col("doc_id"), col("y"),
        pmod(conv(substring(md5(col("g").cast(BinaryType)), 1, 8), 16, 10)
          .cast(LongType), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("cnt"))
    val ngrams = cnts.groupBy("doc_id", "y").agg(sum("cnt").as("n"))
    val feats0 = cnts.join(ngrams.select("doc_id", "n"), "doc_id")
      .select(col("doc_id"), col("y"), col("b"),
        (col("cnt").cast(DoubleType) / col("n").cast(DoubleType)).as("x"))
      .union(ngrams.select(col("doc_id"), col("y"),
        lit(-1L).as("b"), lit(1.0).as("x")))
    val sc = docs.sparkSession.sparkContext
    val feats =
      if (sc.getCheckpointDir.isDefined) feats0.checkpoint()
      else feats0.localCheckpoint()
    // every iteration's plan references the previous weight frame THREE
    // times (margin join, gradient's dependence on it, and the update
    // join), so a merely-persisted lineage grows 3^iters — checkpoint
    // each round's table to truncate the plan (it is ≤ buckets+1 rows;
    // the blocks of superseded rounds are tiny and reclaimed with the
    // session/cache clear)
    def pin(df: DataFrame): DataFrame =
      if (sc.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    val nDocs = feats.filter(col("b") === -1L).count()
    var w = pin(feats.select("b").distinct().withColumn("w", lit(0.0)))
    for (_ <- 1 to iters) {
      val resid = feats.join(broadcast(w), "b")
        .groupBy("doc_id", "y")
        .agg(sum(col("x") * col("w")).as("m"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
      val grad = feats.join(resid, "doc_id")
        .groupBy("b")
        .agg((sum(col("x") * col("r")) / lit(nDocs.toDouble)).as("g"))
      // + 0.0 normalizes a round()-produced -0.0 to +0.0 (IEEE: -0.0 +
      // 0.0 = +0.0) — the driver's hash distinguishes signed zeros and a
      // tiny negative gradient rounds to -0.0 in one engine, +0.0 in the
      // other; the oracle applies the same normalization
      w = pin(w.join(grad, Seq("b"), "left")
        .select(col("b"),
          (round(col("w") - lit(lr) * coalesce(col("g"), lit(0.0)), 6) +
            lit(0.0)).as("w")))
    }
    w
  }
}
