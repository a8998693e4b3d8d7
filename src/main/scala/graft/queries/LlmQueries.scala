package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Ann, Curation, Dedup, Multimodal, TextAnalysis}

/** LLM-data-pipeline queries + DuckDB oracles. Each oracle replicates the
  * same deterministic algorithm (md5-derived hashing, identical expression
  * trees, rounding where aggregation order can differ).
  */
object LlmQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // ---------------------------------------------------------------- queries

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir))

  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir), n = 3, minJaccard = 0.3, maxDf = 1000)

  /** MOSS winnowed-fingerprint pairs at the Winnow defaults (8-char
    * shingles, window 4 - any >= 11-char common substring is caught).
    * maxDf 200, not the sibling operators' 1000: an 8-char shingle shared
    * by hundreds of docs is vocabulary, not reuse (MOSS itself drops
    * over-common fingerprints), and the df cap bounds the pair explode -
    * measured at sf0.1: 145M exploded pair rows at cap 1000 vs 10.7M at
    * 200, with the sf0.01 verdict set identical (26 pairs either way). */
  def dedupWinnow(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(docs(spark, dir), minShared = 2, maxDf = 200,
      minOverlap = 0.5)

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(spark, dir), n = 3, k = 12, bands = 4, minJaccard = 0.5)


  /** Connected components over the minhash near-dup pairs (same parameters
    * as dedup_minhash). */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClusters(
      Dedup.minhashLsh(docs(spark, dir), n = 3, k = 12, bands = 4, minJaccard = 0.5))

  /** Leakage-safe split: the dedup_clusters chain dealt to train/val/test
    * by cluster-id hash — near-dup twins can never straddle a split. */
  def splitLeakageQ(spark: SparkSession, dir: String): DataFrame =
    Curation.leakageSafeSplit(dedupClusters(spark, dir))

  /** Keep-best fuzzy dedup: minhash clusters (dedup_clusters parameters)
    * resolved to their highest-quality member. */
  def dedupKeepBestQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashLsh(d, n = 3, k = 12, bands = 4, minJaccard = 0.5))
    Dedup.keepBest(clusters, TextAnalysis.quality(d))
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), maxHamming = 6)

  def dedupEmbed(spark: SparkSession, dir: String): DataFrame =
    Ann.lshNearDup(emb(spark, dir), minCosine = 0.3)

  /** Corpus-wide lossless-encode proof: decode(encode(text)) must equal
    * the whitespace-normalized text for every document — the oracle is
    * the normalization alone, so any merge rule corrupting a character
    * anywhere in the corpus hash-fails the gate. */
  def bpeRoundtripQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      graft.llm.Bpe.roundTrip(col("text")).as("text_rt"))

  def vocabBuildQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Vocab.buildVocab(docs(spark, dir), minCount = 5)

  /** BM25 retrieval split: every doc_id % 101 == 5 doc poses a query (its
    * first five tokens), scored against the REST of the corpus — the
    * `decontaminate` held-out-split convention. */
  private def bm25Split(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = docs(spark, dir)
    val corpus = d.filter(col("doc_id") % 101 =!= 5)
    val qs = d.filter(col("doc_id") % 101 === 5)
      .select(col("doc_id").as("query_id"),
        array_join(slice(expr(
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 5), " ")
          .as("qtext"))
    (corpus, qs)
  }

  /** Deterministic PCA over the embedding corpus: top-2 components,
    * 4 power iterations — the oracle re-derives the full fit. */
  def embedPcaQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Pca.fitProject(emb(spark, dir), k = 2, iters = 4)

  def searchBm25Q(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    graft.llm.Search.bm25TopK(corpus, qs, topK = 5)
  }

  /** BM25F over a two-field corpus: title = the doc's first four tokens
    * (the gate's deterministic stand-in for [[graft.llm.Extract.title]]
    * output) at weight 2, body = the full text at weight 1 — the oracle
    * replays both field chains (per-field tf/dl/avdl, the pre-saturation
    * weighting) and the shared saturation verbatim. */
  def searchBm25fQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus0, qs) = bm25Split(spark, dir)
    val corpus = corpus0.withColumn("title", array_join(slice(expr(
      "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 4), " "))
    graft.llm.Search.bm25fTopK(corpus, qs,
      Seq(("title", 2.0, 0.75), ("text", 1.0, 0.75)), topK = 5)
  }

  /** Sequential-dependence proximity ranking over the BM25 split:
    * unigram + ordered-bigram BM25 features at λT = 0.85, λO = 0.15. */
  def searchSdmQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    graft.llm.Search.sdmTopK(corpus, qs, topK = 5)
  }

  /** Dirichlet query-likelihood ranking over the BM25 split (μ = 2000). */
  def searchQlQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    graft.llm.Search.qlTopK(corpus, qs, topK = 5, mu = 2000.0)
  }

  /** RM3 query expansion over the BM25 split: 5 feedback docs, 10
    * expansion terms, α = 0.5 interpolation, top-5 answers. */
  def searchRm3Q(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    graft.llm.Search.rm3TopK(corpus, qs, topK = 5,
      fbDocs = 5, fbTerms = 10, alpha = 0.5)
  }

  /** Persistent inverted-index lifecycle: build on the lower-id half of
    * the corpus split, append the rest, answer the SAME queries from the
    * store — exact stats/df merges make the store path bit-equal to the
    * whole-corpus batch path, so the oracle is [[oracleSearchBm25]]
    * verbatim. */
  def searchIndexQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val half = corpus.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-searchindex")
      .toString
    graft.llm.SearchIndex.build(corpus.filter(col("doc_id") <= half), store)
    graft.llm.SearchIndex.append(store, corpus.filter(col("doc_id") > half))
    graft.llm.SearchIndex.search(spark, store, qs, topK = 5)
  }

  /** RM3 expansion served FROM the persistent index: build on the lower
    * half, append the rest, run the full feedback→expansion→re-score
    * chain against the store's pruned postings + doc-keyed docvecs twin
    * — bit-equal to the transient [[graft.llm.Search.rm3TopK]] on the
    * accumulated corpus, so the oracle is [[oracleSearchRm3]]
    * verbatim. */
  def searchRm3IndexQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val half = corpus.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-rm3index")
      .toString
    graft.llm.SearchIndex.build(corpus.filter(col("doc_id") <= half), store)
    graft.llm.SearchIndex.append(store, corpus.filter(col("doc_id") > half))
    graft.llm.SearchIndex.searchRm3(spark, store, qs, topK = 5,
      fbDocs = 5, fbTerms = 10, alpha = 0.5)
  }

  /** Dirichlet QL served FROM the persistent index (the existing unigram
    * tables carry everything QL needs; ctf exact over the pruned scan) —
    * bit-equal to the transient ranker, oracle = [[oracleSearchQl]]
    * verbatim. */
  def searchQlIndexQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val half = corpus.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-qlindex")
      .toString
    graft.llm.SearchIndex.build(corpus.filter(col("doc_id") <= half), store)
    graft.llm.SearchIndex.append(store, corpus.filter(col("doc_id") > half))
    graft.llm.SearchIndex.searchQl(spark, store, qs, topK = 5, mu = 2000.0)
  }

  /** SDM served FROM the persistent index: built with the opt-in bigram
    * table family, appended in a second batch, fused from two pruned
    * store probes — oracle = [[oracleSearchSdm]] verbatim. */
  def searchSdmIndexQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val half = corpus.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-sdmindex")
      .toString
    graft.llm.SearchIndex.build(corpus.filter(col("doc_id") <= half), store,
      bigrams = true)
    graft.llm.SearchIndex.append(store, corpus.filter(col("doc_id") > half))
    graft.llm.SearchIndex.searchSdm(spark, store, qs, topK = 5)
  }

  /** Retention gate: build the full store, tombstone the `% 17 == 3`
    * docs, answer from the TOMBSTONE-AWARE read path (no vacuum — the
    * anti-join + doclens-ledger stats are what this key pins). remove ≡
    * build-without, so the oracle is the BM25 chain over the surviving
    * corpus. */
  def searchRetentionQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val store = java.nio.file.Files.createTempDirectory("graft-searchret")
      .toString
    graft.llm.SearchIndex.build(corpus, store)
    graft.llm.SearchIndex.remove(store,
      corpus.filter(col("doc_id") % 17 === 3).select("doc_id"))
    graft.llm.SearchIndex.search(spark, store, qs, topK = 5)
  }

  /** Hybrid sparse+dense retrieval: the bm25 corpus/query split mirrored
    * onto the embeddings table (vec_id and doc_id share an id space), both
    * constituent top-10 rankings fused by RRF (kRrf = 60), top-5 kept. */
  def searchHybridQ(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, qs) = bm25Split(spark, dir)
    val e = emb(spark, dir)
    graft.llm.Search.hybridRrf(
      corpus, e.filter(col("vec_id") % 101 =!= 5), qs,
      e.filter(col("vec_id") % 101 === 5)
        .select(col("vec_id").as("query_id"), col("embedding")),
      topK = 5, kRetrieve = 10)
  }

  /** Hybrid retrieval served entirely FROM the persistent stores: build
    * the inverted index in two batches (lifecycle exercised), build the
    * IVF×PQ index once, fuse both store-served rankings. Query split is
    * `% 101 == 97` (not the bm25 gates' 5) so the ANN corpus keeps
    * vec_ids 0..15 — the PQ ADC table indexes positionally into a DENSE
    * code range, so seed/codebook vectors must all be present. Store
    * params pin the ann_index oracle conventions (16 cents, assign=1,
    * nprobe=2, first-16 codebook, iters=0). */
  def searchHybridIndexQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val corpus = d.filter(col("doc_id") % 101 =!= 97)
    val qs = d.filter(col("doc_id") % 101 === 97)
      .select(col("doc_id").as("query_id"),
        array_join(slice(expr(
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 5), " ")
          .as("qtext"))
    val e = emb(spark, dir)
    val eCorpus = e.filter(col("vec_id") % 101 =!= 97)
    val qv = e.filter(col("vec_id") % 101 === 97)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val sDir = java.nio.file.Files.createTempDirectory("graft-hybsearch").toString
    val half = corpus.agg(max(col("doc_id"))).head().getLong(0) / 2
    graft.llm.SearchIndex.build(corpus.filter(col("doc_id") <= half), sDir)
    graft.llm.SearchIndex.append(sDir, corpus.filter(col("doc_id") > half))
    val aDir = java.nio.file.Files.createTempDirectory("graft-hybann").toString
    graft.llm.AnnIndex.build(eCorpus, aDir, graft.llm.AnnIndex.Params(
      nCentroids = 16, multiAssign = 1, m = 8, codebookSize = 16,
      codebookIters = 0))
    graft.llm.SearchIndex.hybridFromStores(spark, sDir, aDir, qs, qv,
      topK = 5, kRetrieve = 10, nprobe = 2)
  }

  def textTfidfQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidf(docs(spark, dir), topK = 3)

  /** Bloom-sketch decontamination over the same bench split as
    * `decontaminate` (doc_id % 20 == 7) — the bit-set membership form of
    * the exact gram join. */
  def decontaminateBloomQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.llm.Sketches.decontaminateBloom(
      d.filter(col("doc_id") % 20 =!= 7), d.filter(col("doc_id") % 20 === 7))
  }

  def sketchHllQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Sketches.hllEstimate(docs(spark, dir))

  /** KMV set-overlap report between the even/odd doc_id halves — the
    * sketch that answers "how much do two shards overlap" (Jaccard +
    * intersection cardinality) from two fixed-size summaries. */
  def sketchKmvQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Sketches.kmvOverlap(docs(spark, dir))

  def sketchCmsQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Sketches.cmsTopK(docs(spark, dir), topK = 20)

  /** Per-source document-length quantiles from the mergeable 2-digit
    * decimal bin sketch. */
  def sketchQuantileQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Sketches.quantileSketch(docs(spark, dir), "n_chars", "source")

  /** Persistent sketch-store lifecycle: build on the lower-id half, fold
    * the upper half in with append, read estimates from the STORE. The
    * merges are exact, so the oracle is the whole-corpus HLL replica — the
    * gate hash-fails if the incremental path drifts from one-pass by a
    * single register. */
  def sketchStoreQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val half = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-sketchstore")
      .toString
    graft.llm.SketchStore.build(d.filter(col("doc_id") <= half), store)
    graft.llm.SketchStore.append(d.filter(col("doc_id") > half), store)
    graft.llm.SketchStore.hllEstimates(spark, store)
  }

  /** KMV store lifecycle: build(lower half) + append(upper half) +
    * compact, then read per-lang distinct estimates from the STORE. The
    * KMV merge law makes the fold exact, so the whole-corpus replica is
    * the oracle — one wrong minimum anywhere hash-fails. */
  def sketchKmvStoreQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val half = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val store = java.nio.file.Files.createTempDirectory("graft-kmvstore")
      .toString
    graft.llm.SketchStore.build(d.filter(col("doc_id") <= half), store)
    graft.llm.SketchStore.append(d.filter(col("doc_id") > half), store)
    graft.llm.SketchStore.compact(store)
    graft.llm.SketchStore.kmvEstimates(spark, store)
  }

  def shardAssignQ(spark: SparkSession, dir: String): DataFrame =
    Curation.shardAssign(docs(spark, dir), nShards = 8)

  /** Token-balanced shards: sorted round-robin deal over the global
    * descending-size rank (the two-phase rank, not a global sort). */
  def shardBalancedQ(spark: SparkSession, dir: String): DataFrame =
    Curation.shardBalanced(docs(spark, dir), nShards = 8)

  def bpeTrainQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // batch = 8 is PROVABLY output-identical to sequential (the r12
    // compound-safety rule; BpeSpec pins the equality on this corpus) —
    // the sequential oracle stays valid while the run pays ~4 scan
    // rounds instead of 8
    graft.llm.Bpe.learnMerges(docs(spark, dir), "text", 8, batch = 8)
      .zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("rank", "lt", "rt", "cnt")
  }

  /** Exact word-set similarity self-join at τ=0.8 over the doc_id%11==0
    * slice — prefix-filtered AllPairs against the brute-force DuckDB
    * spec (every pair, no filter): the gate proves the prefix/length
    * filters prune WITHOUT losing a single qualifying pair. The slice +
    * the tight τ keep the gate's OUTPUT bounded: the synthetic corpus is
    * near-dup-heavy by design (92k qualifying pairs at τ=0.5 over just
    * the 500 sf0.01 docs), and an all-pairs operator's cost is its
    * result size — the right benchmark shape is selective, the
    * exhaustive-τ setting belongs to [[graft.llm.Dedup.keepBest]]-style
    * cluster collapse, not a pair listing. */
  def dedupAllpairsQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Dedup.allPairsJoin(
      docs(spark, dir).filter(col("doc_id") % 11 === 0), minJaccard = 0.8)

  def oracleDedupAllpairs: String =
    """WITH s AS (SELECT doc_id,
      |    list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS ts
      |  FROM documents WHERE doc_id % 11 = 0),
      |ne AS (SELECT doc_id, ts FROM s WHERE len(ts) > 0),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x))) AS BIGINT) AS common,
      |    len(a.ts) AS la, len(b.ts) AS lb
      |  FROM ne a JOIN ne b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  round(CAST(common AS DOUBLE) / (la + lb - common), 6) AS jaccard
      |FROM p
      |WHERE round(CAST(common AS DOUBLE) / (la + lb - common), 6) >= 0.8""".stripMargin

  /** Edit-distance fuzzy-match self-join over the customer names — the
    * typo-dense identifier corpus (digit strings differing in single
    * substitutions), exactly the input class q-gram filtering exists
    * for. k=1, q=2: every name pair one edit apart, exact. */
  def dedupEditdistQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Dedup.editDistanceJoin(
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("id"), lower(col("c_name")).as("s")),
      "id", "s", k = 1, q = 2)

  /** The filterless brute-force spec: every pair within the length
    * filter, verified by DuckDB's levenshtein — proving the q-gram
    * prefix index loses nothing. */
  def oracleDedupEditdist: String =
    """WITH s AS (SELECT c_custkey AS id, lower(c_name) AS s FROM customer)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
      |FROM s a JOIN s b ON a.id < b.id
      |WHERE abs(length(a.s) - length(b.s)) <= 1
      |  AND levenshtein(a.s, b.s) <= 1""".stripMargin

  /** Unicode NFC normalization gate: the corpus is deterministically
    * DE-composed first (every 'e' → 'e' + combining acute U+0301, the
    * mojibake-class input a real crawl contains), then normalized back —
    * whole normalized documents hash against DuckDB's nfc_normalize, and
    * n_composed counts the re-compositions. The normalize expression is
    * materialized ONCE (row-30b2 law) before the length delta. */
  def textNfcQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("raw"))
      .select(col("doc_id"), col("raw"),
        graft.llm.TextAnalysis.normalizeUnicode(col("raw")).as("text_nfc"))
      .select(col("doc_id"), col("text_nfc"),
        (length(col("raw")) - length(col("text_nfc"))).as("n_composed"))

  def oracleTextNfc: String =
    """WITH d AS (SELECT doc_id,
      |    regexp_replace(text, 'e', 'e' || chr(769), 'g') AS raw
      |  FROM documents)
      |SELECT doc_id, nfc_normalize(raw) AS text_nfc,
      |  CAST(length(raw) - length(nfc_normalize(raw)) AS INT) AS n_composed
      |FROM d""".stripMargin

  /** Record-linkage lookup: every customer name with one deterministic
    * character deleted (a typo'd feed), matched back against the
    * canonical table at k=1. Each probe finds its origin plus any other
    * name one edit away. */
  def dedupEditdistLookupQ(spark: SparkSession, dir: String): DataFrame = {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ref = cust.select(col("c_custkey").as("rid"),
      lower(col("c_name")).as("rs"))
    val probe = cust.select((col("c_custkey") + 1000000L).as("pid"),
      expr("""concat(substring(lower(c_name), 1, CAST(c_custkey % 10 AS INT) + 4),
             |       substring(lower(c_name), CAST(c_custkey % 10 AS INT) + 6,
             |                 length(c_name)))""".stripMargin).as("ps"))
    graft.llm.Dedup.editDistanceLookup(probe, "pid", "ps", ref, "rid", "rs",
      k = 1)
  }

  def oracleDedupEditdistLookup: String =
    """WITH ref AS (SELECT c_custkey AS rid, lower(c_name) AS rs FROM customer),
      |probe AS (SELECT c_custkey + 1000000 AS pid,
      |    substring(lower(c_name), 1, CAST(c_custkey % 10 AS INT) + 4) ||
      |    substring(lower(c_name), CAST(c_custkey % 10 AS INT) + 6,
      |              length(c_name)) AS ps
      |  FROM customer)
      |SELECT pid AS probe_id, rid AS ref_id,
      |  CAST(levenshtein(ps, rs) AS INT) AS dist
      |FROM probe, ref
      |WHERE abs(length(ps) - length(rs)) <= 1 AND levenshtein(ps, rs) <= 1""".stripMargin

  def textCollocationsQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.collocations(docs(spark, dir),
      minCount = 5, topK = 20)

  /** Same count tables and the SAME parenthesization of the PMI ratio —
    * (c12/nbig) / ((c1/ntok)·(c2/ntok)) — so both engines feed log2 the
    * identical IEEE double. */
  def oracleTextCollocations: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |u AS (SELECT unnest(tk) AS w FROM toks),
      |ca AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
      |ntok AS (SELECT CAST(sum(c) AS DOUBLE) AS ntok FROM ca),
      |g2 AS (SELECT unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> concat_ws(' ', tk[i], tk[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks),
      |cb AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
      |    count(*) AS c12 FROM g2 GROUP BY 1, 2),
      |nbig AS (SELECT CAST(sum(c12) AS DOUBLE) AS nbig FROM cb)
      |SELECT w1, w2, c12, x.c AS c1, y.c AS c2,
      |  round(log2((CAST(c12 AS DOUBLE) / nbig) /
      |    ((CAST(x.c AS DOUBLE) / ntok) * (CAST(y.c AS DOUBLE) / ntok))), 6)
      |    AS pmi
      |FROM cb JOIN ca x ON cb.w1 = x.w JOIN ca y ON cb.w2 = y.w, ntok, nbig
      |WHERE c12 >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /** Copy-on-write MERGE lifecycle: init on the even half, upsert a
    * recrawl batch (every doc_id % 3, text revised), delete a takedown
    * set (doc_id % 10 = 5) — then read the store back. Only the buckets
    * each batch's keys hash into are rewritten (MergeStoreSpec pins
    * untouched files byte-identical); the oracle replays the same
    * upsert/delete algebra relationally. */
  def mergeUpsertQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val store = java.nio.file.Files
      .createTempDirectory("graft-merge").toString + "/store"
    graft.sources.MergeStore.init(
      d.filter(col("doc_id") % 2 === 0), store, "doc_id", nBuckets = 16)
    graft.sources.MergeStore.merge(spark, store,
      d.filter(col("doc_id") % 3 === 0)
        .withColumn("text", concat(col("text"), lit(" v2"))))
    graft.sources.MergeStore.delete(spark, store,
      d.filter(col("doc_id") % 10 === 5).select("doc_id"))
    graft.sources.MergeStore.read(spark, store)
  }

  def oracleMergeUpsert: String =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |upd AS (SELECT doc_id, text || ' v2' AS text FROM documents
      |        WHERE doc_id % 3 = 0),
      |merged AS (
      |  SELECT doc_id, text FROM upd
      |  UNION ALL
      |  SELECT b.doc_id, b.text FROM base b
      |  WHERE b.doc_id NOT IN (SELECT doc_id FROM upd))
      |SELECT doc_id, text FROM merged WHERE doc_id % 10 <> 5""".stripMargin

  def dedupIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val half = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft-dedupidx")
      .toString
    graft.llm.DedupIndex.build(d.filter(col("doc_id") <= half), idx)
    graft.llm.DedupIndex.dedupAgainst(spark, idx,
      d.filter(col("doc_id") > half))
  }

  def dedupSubstrIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val half = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft-substridx")
      .toString
    graft.llm.SubstrIndex.build(d.filter(col("doc_id") <= half), idx, k = 15)
    graft.llm.SubstrIndex.dedupAgainst(spark, idx, d.filter(col("doc_id") > half))
  }

  def dedupSemdedupQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.semDedup(emb(spark, dir), tau = 0.3, nCentroids = 16)

  /** Persistent centroid model: fit on the lower-id half (which holds the
    * first-16 seed vectors, so the stored model equals the whole-corpus
    * fit), then SemDeDup the upper half against the store — the oracle is
    * the whole-corpus semDedup replica restricted to probe-half rows. */
  def dedupSemdedupIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val half = e.agg(max(col("vec_id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft-centstore")
      .toString
    graft.llm.CentroidStore.build(e.filter(col("vec_id") <= half), idx,
      nCentroids = 16)
    graft.llm.CentroidStore.semDedupAgainst(spark, idx,
      e.filter(col("vec_id") > half), tau = 0.3)
  }

  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.bruteTopK(e, e.filter(col("vec_id") < 5), k = 5)
  }

  /** MMR-diversified retrieval: the [[annBrute]] query split, top-20
    * relevance shortlist, 5 greedy picks at λ = 0.7. */
  def annMmr(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.mmrTopK(e, e.filter(col("vec_id") < 5), k = 5, nCand = 20, lambda = 0.7)
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.lshTopK(e, e.filter(col("vec_id") < 5), k = 5)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // lloydIters = 0 / spreadSeed = false: the DuckDB oracle replicates the
    // deterministic first-N seed centroids; neither a distributed float mean
    // nor the greedy spread scan is worth re-deriving in SQL. The refined
    // paths are measured by AnnSweep instead.
    Ann.ivfTopK(e, e.filter(col("vec_id") < 5), k = 5, nCentroids = 16, nprobe = 2,
      lloydIters = 0, spreadSeed = false, multiAssign = 1)
  }

  /** Contrastive hard-negative mining over the embedding corpus: LSH
    * bucket candidates, positives excluded at round-6 cosine >= 0.4 (the
    * decontaminate_embed threshold — the synthetic corpus' near-dup bar),
    * top-5 negatives per anchor. */
  def mineNegativesQ(spark: SparkSession, dir: String): DataFrame =
    Ann.hardNegatives(emb(spark, dir), kNeg = 5, posTau = 0.4,
      maxBucket = 1000) // explicit pin — the oracle's HAVING mirrors it

  /** Semantic decontamination: corpus = vectors 50+, bench = vectors <50,
    * cosine threshold 0.4 — the synthetic embeddings are near-orthogonal
    * (max cross-set cosine 0.493), so the production near-dup bar of
    * ~0.95 would never fire; 0.4 flags 11 vectors and exercises both
    * branches. */
  def decontaminateEmbedQ(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Curation.decontaminateEmbed(
      e.filter(col("vec_id") >= 50), e.filter(col("vec_id") < 50),
      minCosine = 0.4)
  }

  /** Product-quantization ADC top-k: 8 subspaces × 16 codes over the
    * 64-dim embeddings (first-16 codebook — same SQL-reproducible seeding
    * convention as ann_ivf). codebookIters = 0 is the GATE PIN (library
    * default is 3 Lloyd refinements): the oracle must reproduce every
    * centroid as a deterministic literal. */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.pqTopK(e, e.filter(col("vec_id") < 5), k = 5, codebookIters = 0)
  }

  /** SQ8 scalar quantization: per-dim [min, max] levels over the whole
    * corpus, raw-query-vs-midpoint-reconstruction ADC — the training-free
    * 1-byte/dim compression pin. */
  def annSq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.sqTopK(e, e.filter(col("vec_id") < 5), k = 5)
  }

  /** 1-bit sign quantization + brute Hamming ranking: 8 bytes/vector
    * (32× compression, no training), distance = two XOR+popcounts. The
    * quantization is the ONLY approximation — the ranking over codes is
    * exact, which is what the oracle replays bit-for-bit. */
  def annSign(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.signTopK(e, e.filter(col("vec_id") < 5), k = 5)
  }

  /** Multi-index hashing over the sign codes (Norouzi et al. CVPR 2012):
    * 4 exact-match chunk joins retrieve every code within Hamming radius
    * 3 (pigeonhole), exact Hamming ranks the candidates. The oracle
    * replays the same candidate rule, so the gate pins the CONTRACT
    * (top-k among chunk-equality candidates), not a recall estimate. */
  def annSignMih(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.signMihTopK(e, e.filter(col("vec_id") < 5), k = 5)
  }

  /** IVF×PQ composed index: first-16 centroids / nprobe 2 / single
    * assignment (the ann_ivf list conventions) pruning candidates for
    * 8×16 ADC scoring (the ann_pq code conventions) — the gate pin of the
    * production billion-vector shape. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.ivfPqTopK(e, e.filter(col("vec_id") < 5), k = 5,
      nCentroids = 16, nprobe = 2, multiAssign = 1, codebookIters = 0)
  }

  /** IVF×PQ + exact re-rank of the ADC top-10 (IVFADC+R). */
  def annIvfPqRr(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Ann.ivfPqRerankTopK(e, e.filter(col("vec_id") < 5), k = 5, rerank = 10,
      nCentroids = 16, nprobe = 2, multiAssign = 1, codebookIters = 0)
  }

  /** Persistent-index lifecycle under the ann_ivfpq gate conventions:
    * build on the low-vec_id half, append the rest against the FROZEN
    * model, query from the store. First-N seeding draws the same seed
    * vectors either way (they live in the build half), so the output is
    * row-identical to the transient [[Ann.ivfPqTopK]] — the oracle is
    * literally oracleAnnIvfPq, which is the point: persistence must not
    * change a single ranked row. */
  def annIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val half = e.agg(max(col("vec_id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft-annidx")
      .toString
    val p = graft.llm.AnnIndex.Params(nCentroids = 16, multiAssign = 1,
      codebookIters = 0)
    graft.llm.AnnIndex.build(e.filter(col("vec_id") <= half), idx, p)
    graft.llm.AnnIndex.append(idx, e.filter(col("vec_id") > half))
    graft.llm.AnnIndex.query(spark, idx, e.filter(col("vec_id") < 5),
      k = 5, nprobe = 2)
  }

  /** Metadata-filtered ANN gate: the [[annIndex]] lifecycle queried with
    * an `allowed` list (`vec_id % 3 == 1`) — filter-then-rank, so the
    * top-k is exact over the filtered candidate set and the oracle is the
    * IVF×PQ chain with the score rows restricted before ranking. */
  def annFilteredQ(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val half = e.agg(max(col("vec_id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft-annfilt")
      .toString
    val p = graft.llm.AnnIndex.Params(nCentroids = 16, multiAssign = 1,
      codebookIters = 0)
    graft.llm.AnnIndex.build(e.filter(col("vec_id") <= half), idx, p)
    graft.llm.AnnIndex.append(idx, e.filter(col("vec_id") > half))
    graft.llm.AnnIndex.query(spark, idx, e.filter(col("vec_id") < 5),
      k = 5, nprobe = 2,
      allowed = Some(e.filter(col("vec_id") % 3 === 1).select("vec_id")))
  }

  /** Random projection of the 64-dim embeddings to 4 dims (JL transform;
    * plane offset 256 keeps the matrix independent of the LSH tables). */
  def embedProject(spark: SparkSession, dir: String): DataFrame =
    Ann.project(emb(spark, dir), outDim = 4)

  def textLang(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(spark, dir))
      .select(col("doc_id"), col("pred_lang"),
        col("en_hits").cast(LongType).as("en_hits"),
        col("de_hits").cast(LongType).as("de_hits"),
        col("fr_hits").cast(LongType).as("fr_hits"),
        col("es_hits").cast(LongType).as("es_hits"))

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(docs(spark, dir))

  /** Gopher rule battery with corpus-scaled knobs (docs run 10-99 words,
    * so minWords=20 splits the corpus; minStop=1 splits on the articles
    * the synthetic vocabulary happens to contain). */
  def textGopher(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(docs(spark, dir), minWords = 20, minStop = 1)

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(spark, dir))

  /** Real merge-table BPE token counts (default English-fixture merges)
    * next to the whitespace count — the systematic skew every token
    * budget inherits when it counts words instead of subwords. */
  def textTokensBpe(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      Curation.tokCount(col("text")).as("ws_tok"),
      graft.llm.Bpe.tokenCount(col("text")).as("bpe_tok"))

  /** The unigram/wordpiece DuckDB oracles unroll their DP/greedy walks to
    * a FIXED depth of [[OracleUnrollDepth]] steps. A word needs up to
    * len(w) steps (single-char pieces are always in the vocab), so a
    * corpus token longer than the unroll would leave the oracle's walk
    * unfinished while the Spark side completes it — a silent gate break
    * on a different corpus or scale factor. Both gates assert the bound
    * LOUDLY at fixture-build time instead. */
  private[graft] val OracleUnrollDepth = 24
  private def assertOracleUnroll(d: DataFrame): Unit = {
    val m = d.select(explode(graft.llm.Dedup.tokens(col("text"))).as("w"))
      .agg(coalesce(max(length(col("w"))), lit(0)).as("m"))
      .head().getInt(0)
    require(m <= OracleUnrollDepth,
      s"corpus max token length $m exceeds the tokenizer oracle's " +
        s"$OracleUnrollDepth-step unroll — raise OracleUnrollDepth to >= $m")
  }

  /** Unigram-LM Viterbi encoding under a deterministic piece fixture:
    * all 36 single chars at cost 4.0 plus the top-20 corpus words (count
    * desc, word asc — a 20-row model collect) at cost len·4−2, so whole-
    * word pieces beat char streams by exactly 2.0. Costs are EXACT
    * DYADIC doubles on purpose (the md5-dyadic-hyperplane trick): the DP
    * COMPARES costs, and a last-ULP `ln` disagreement between engines
    * could flip a segmentation — dyadic sums cannot. */
  def tokenizeUnigramQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    assertOracleUnroll(d)
    val top = d.select(explode(graft.llm.Dedup.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(20)
      .select("w").as[String].collect()
    val pieces = graft.llm.Unigram.Chars.map(_ -> 4.0).toMap ++
      top.map(w => w -> (w.length * 4.0 - 2.0)).toMap
    graft.llm.Unigram.encode(d, pieces)
  }

  /** WordPiece greedy longest-match encoding under a deterministic piece
    * fixture: all 36 chars bare AND ##-prefixed (totality), the top-20
    * corpus words whole, and each top-20 word of length ≥ 4 split at
    * ceil(len/2) into a bare prefix + ## suffix — so non-top words
    * sharing a frequent prefix take multi-piece paths and the greedy
    * walk is non-trivial. No costs, no floats: greedy longest-match is
    * pure string/integer logic, exact in any engine. */
  def tokenizeWordPieceQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    assertOracleUnroll(d)
    val top = d.select(explode(graft.llm.Dedup.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(20)
      .select("w").as[String].collect()
    val halves = top.toSeq.filter(_.length >= 4).flatMap { w =>
      val mid = (w.length + 1) / 2
      Seq(w.substring(0, mid), "##" + w.substring(mid))
    }
    val vocab = (graft.llm.Unigram.Chars ++
      graft.llm.Unigram.Chars.map("##" + _) ++ top ++ halves)
      .map(_ -> 1).toMap
    graft.llm.WordPiece.encode(d, vocab, maxPieceLen = 24)
  }

  /** Shared Spark/DuckDB SQL fragment injecting deterministic case,
    * punctuation, whitespace variety and UTF-8 (incl. an astral emoji —
    * a surrogate pair on the JVM) into the synthetic lowercase-ASCII
    * docs — the textPii injection pattern: both engines run the SAME
    * fragment, so the raw-tokenizer gates exercise real multi-byte text
    * rather than vacuously round-tripping [a-z0-9 ]. */
  private val RawInject: String =
    "concat(CASE WHEN doc_id % 3 = 0 THEN upper(substr(text, 1, 24)) " +
      "ELSE substr(text, 1, 24) END, " +
      "' — Ünïçødé ☃ «quoted» 100%\t#tag\nline2 ', " +
      "repeat('!?', CAST(doc_id % 4 AS INT)), " +
      "CASE WHEN doc_id % 5 = 0 THEN ' 🙂 done.' ELSE '' END)"

  /** Byte-fallback Unigram round-trip over RAW text: encode with the
    * default raw piece table (36 chars + common English pieces; every
    * uncovered code point rides UTF-8 byte pieces), decode, and pin
    * decode ∘ encode ≡ id corpus-wide — the [[bpeRoundtripQ]] law,
    * upgraded from whitespace-normalized to EXACT (case, punctuation,
    * tabs/newlines, multi-byte UTF-8 and surrogate pairs all preserved).
    * The oracle states the identity directly; a single corrupted,
    * dropped or reordered byte anywhere in the corpus hash-fails. */
  def tokenizeRawUnigramQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("text", expr(RawInject))
    graft.llm.Unigram.encodeRaw(d)
      .select(col("doc_id"),
        graft.functions.SubwordRaw.decode(col("pieces")).as("text_rt"))
  }

  def oracleTokenizeRawUnigram: String =
    s"SELECT doc_id, $RawInject AS text_rt FROM documents"

  /** Byte-fallback greedy MaxMatch (raw WordPiece) round-trip — same law,
    * greedy walk instead of Viterbi. */
  def tokenizeRawWordPieceQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("text", expr(RawInject))
    graft.llm.WordPiece.encodeRaw(d,
      graft.llm.Unigram.DefaultRawPieces.keySet)
      .select(col("doc_id"),
        graft.functions.SubwordRaw.decode(col("pieces")).as("text_rt"))
  }

  def oracleTokenizeRawWordPiece: String =
    s"SELECT doc_id, $RawInject AS text_rt FROM documents"

  /** BYTE-LEVEL BPE (GPT-2 recipe) — the third tokenizer's lossless
    * story, and the strongest of the raw gates: the oracle doesn't just
    * state the round-trip identity, it REPLAYS the whole encoder in
    * DuckDB (byte→byte-char bijection gathered from hex, then the same
    * Sep-wrapped replace chain) and pins the per-document token count
    * cross-engine, while text_rt pins decode ∘ encode ≡ id byte-exact
    * over injected case/punct/tabs/UTF-8/emoji. */
  def bpeRawQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("text", expr(RawInject))
    d.withColumn("__tk__", graft.llm.Bpe.tokenizedRaw(col("text")))
      .select(col("doc_id"),
        graft.llm.Bpe.tokenCountRawOf(col("__tk__")).as("n_tok"),
        graft.llm.Bpe.decodeRaw(col("__tk__")).as("text_rt"))
  }

  def oracleBpeRaw: String = {
    val enc = graft.llm.Bpe.oracleByteEncSql("hx", "n")
    val toked = graft.llm.Bpe.oracleTokenizedRawSql("be")
    s"""WITH raw AS (SELECT doc_id, $RawInject AS text FROM documents),
       |h AS (SELECT doc_id, text, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n FROM raw),
       |e AS (SELECT doc_id, text, $enc AS be FROM h),
       |t AS (SELECT doc_id, text, $toked AS s FROM e)
       |SELECT doc_id,
       |  CAST(${graft.llm.Bpe.oracleCountRawSql("s")} AS BIGINT) AS n_tok,
       |  text AS text_rt
       |FROM t""".stripMargin
  }

  /** Synthetic HTML page per document — chrome the extractor must drop
    * (head/style/script, a nav bar and a footer that are mostly links,
    * a comment) around content it must keep (a heading plus the doc's
    * text, entity-escaped so the extractor's decode restores it
    * byte-for-byte). Same expression in both engines. */
  private val HtmlInject: String =
    "concat('<html><head><title>t</title><style>p{color:red}</style>" +
      "<script>var a=1;</script></head><body>" +
      "<nav><a href=\"/\">Home</a> | <a href=\"/a\">About</a> | " +
      "<a href=\"/b\">Contact</a></nav><h1>Doc ', " +
      "CAST(doc_id AS STRING), '</h1><p>', " +
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), " +
      "'>', '&gt;'), " +
      "'</p><div><a href=\"/c\">Terms</a> <a href=\"/d\">Privacy</a></div>" +
      "<!-- tracker --></body></html>')"

  /** HTML main-content extraction ([[graft.llm.Extract.mainContent]])
    * over injected pages: the oracle replays the identical doc-level
    * regex chain, per-line link-density rule and entity decode
    * ([[graft.llm.Extract.oracleExtractSql]] — generated from the same
    * rule lists), so the kept text, per-doc, must hash-match. */
  def textExtractHtmlQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("html", expr(HtmlInject))
    graft.llm.Extract.mainContent(d)
  }

  def oracleTextExtractHtml: String =
    s"""WITH h AS (SELECT doc_id, $HtmlInject AS html FROM documents)
       |${graft.llm.Extract.oracleExtractSql("h")}""".stripMargin

  // --- WARC fixture: a two-record stream per document (a warcinfo
  // record, then an HTTP 200 text/html response wrapping the doc text)
  // with Content-Length computed from the SAME expression in both
  // engines via `olen` (Spark: octet_length(s); DuckDB: octet_length
  // only accepts BLOB, so octet_length(encode(s)) — numerically
  // identical); CRLFs spelled chr(13), chr(10) because DuckDB string
  // literals do not process backslash escapes ---
  private val WarcPage: String =
    "concat('<html><body><nav><a href=\"/\">Home</a></nav><p>', text, " +
      "'</p></body></html>')"
  private val WarcHttp: String =
    "concat('HTTP/1.1 200 OK', chr(13), chr(10), " +
      "'Content-Type: text/html; charset=utf-8', chr(13), chr(10), " +
      s"chr(13), chr(10), $WarcPage)"
  private val WarcInfoPayload: String = "'software: graft-crawler 1.0'"
  private def warcInject(olen: String => String): String =
    "concat('WARC/1.0', chr(13), chr(10), " +
      "'WARC-Type: warcinfo', chr(13), chr(10), " +
      s"'Content-Length: ', CAST(${olen(WarcInfoPayload)} AS STRING), " +
      "chr(13), chr(10), chr(13), chr(10), " +
      s"$WarcInfoPayload, chr(13), chr(10), chr(13), chr(10), " +
      "'WARC/1.0', chr(13), chr(10), " +
      "'WARC-Type: response', chr(13), chr(10), " +
      "'WARC-Record-ID: <urn:uuid:', CAST(doc_id AS STRING), '>', " +
      "chr(13), chr(10), " +
      "'WARC-Target-URI: https://', source, '.com/p/', " +
      "CAST(doc_id % 50 AS STRING), chr(13), chr(10), " +
      s"'Content-Length: ', CAST(${olen(WarcHttp)} AS STRING), " +
      "chr(13), chr(10), chr(13), chr(10), " +
      s"$WarcHttp, chr(13), chr(10), chr(13), chr(10))"
  private def olenSpark(x: String): String = s"octet_length($x)"
  private def olenDuck(x: String): String = s"octet_length(encode($x))"

  /** WARC record parsing ([[graft.llm.Warc.parseRecords]]): the native
    * Content-Length walk splits each injected two-record stream, the
    * RE2-safe header chain extracts the fields — and the oracle
    * reconstructs every field DIRECTLY from the same inject expressions
    * (two UNION ALL legs), so a splitter off by one byte or a header
    * regex bleeding into the HTTP envelope hash-fails. */
  def warcParseQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("warc", expr(warcInject(olenSpark)).cast("binary"))
    graft.llm.Warc.parseRecords(d)
  }

  def oracleWarcParse: String =
    s"""WITH b AS (SELECT doc_id, source, text FROM documents)
       |SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
       |  '' AS record_id, '' AS target_uri,
       |  CAST(${olenDuck(WarcInfoPayload)} AS BIGINT) AS content_length,
       |  '' AS http_status, '' AS content_type,
       |  $WarcInfoPayload AS body, true AS len_ok FROM b
       |UNION ALL
       |SELECT doc_id, 1 AS rec_idx, 'response' AS warc_type,
       |  concat('<urn:uuid:', CAST(doc_id AS STRING), '>') AS record_id,
       |  concat('https://', source, '.com/p/', CAST(doc_id % 50 AS STRING))
       |    AS target_uri,
       |  CAST(${olenDuck(WarcHttp)} AS BIGINT) AS content_length,
       |  '200' AS http_status,
       |  'text/html; charset=utf-8' AS content_type,
       |  $WarcPage AS body, true AS len_ok FROM b""".stripMargin

  /** PERSISTED tokenizer round-trip ([[graft.llm.TokenizerStore]]): save
    * the byte-level merge table to a parquet store, LOAD it back, and
    * encode the corpus with the LOADED model — the result must be
    * hash-identical to the static-table oracle, so any corruption of
    * merge ORDER or spelling through the parquet round-trip fails the
    * gate (rank is the model: two swapped merges change real token
    * counts). The oracle is [[oracleBpeRaw]]'s replay verbatim — that is
    * the point: store ∘ load must be invisible. */
  def tokenizerStoreQ(spark: SparkSession, dir: String): DataFrame = {
    val store = java.nio.file.Files.createTempDirectory("graft-tokstore")
      .toString
    graft.llm.TokenizerStore.save(spark, store,
      graft.llm.BpeModel(graft.llm.Bpe.DefaultRawMerges, raw = true))
    val merges = graft.llm.TokenizerStore.load(spark, store)
      .asInstanceOf[graft.llm.BpeModel].merges
    val d = docs(spark, dir).withColumn("text", expr(RawInject))
    d.withColumn("__tk__", graft.llm.Bpe.tokenizedRaw(col("text"), merges))
      .select(col("doc_id"),
        graft.llm.Bpe.tokenCountRawOf(col("__tk__")).as("n_tok"),
        graft.llm.Bpe.decodeRaw(col("__tk__")).as("text_rt"))
  }

  def oracleTokenizerStore: String = oracleBpeRaw

  // --- Crawl link-graph fixture: every document gets a URL on its
  // source's host and a page whose out-links exercise every extraction
  // shape — double- AND single-quoted hrefs (chr(39): neither engine's
  // string literal needs an embedded quote), protocol-relative with a
  // port, relative (host=''), an href-less <a name>, inner tags and an
  // entity in anchor text, plus %4-gated cross-links between src hosts
  // so the graph mixes linked sources with dangling hub/cdn sinks ---
  private val LinkUrlInject: String =
    "concat('https://', source, '.com/p/', CAST(doc_id % 50 AS STRING))"
  private val LinkHtmlInject: String =
    "concat('<html><body><nav><a href=\"https://hub', " +
      "CAST(doc_id % 3 AS STRING), " +
      "'.example/dir\">Hub &amp; Spoke</a></nav>', " +
      "CASE WHEN doc_id % 4 = 0 THEN concat('<p><a href=', chr(39), " +
      "'https://src', CAST((doc_id + 1) % 20 AS STRING), '.com/x', " +
      "chr(39), '>next <b>src</b></a></p>') ELSE '' END, " +
      "'<p><a href=\"//cdn', CAST(doc_id % 2 AS STRING), " +
      "'.example:8080/a.js\">cdn asset</a>" +
      "<a href=\"/rel/path\">relative</a>" +
      "<a name=\"x\">no href</a></p></body></html>')"
  private val CrawlPreamble: String =
    s"crawl AS (SELECT doc_id, $LinkUrlInject AS url, " +
      s"$LinkHtmlInject AS html FROM documents),\n"
  private def crawlFixture(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      expr(LinkUrlInject).as("url"), expr(LinkHtmlInject).as("html"))

  /** Out-link extraction ([[graft.llm.Extract.links]]) over the crawl
    * fixture: one row per anchor element with href, visible anchor text
    * and resolved target host — the oracle replays the same element +
    * field regex chain, so a quote-handling or host-resolution drift on
    * ANY link shape hash-fails. */
  def extractLinksQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Extract.links(
      docs(spark, dir).withColumn("html", expr(LinkHtmlInject)))

  def oracleExtractLinks: String =
    s"""WITH h AS (SELECT doc_id, $LinkHtmlInject AS html FROM documents)
       |${graft.llm.Extract.oracleLinksSql("h")}""".stripMargin

  /** Fixed-point PageRank over the host graph
    * ([[graft.llm.LinkGraph.pageRank]], 4 iterations): rank_fp is an
    * exact BIGINT in both engines — integer arithmetic makes the rank
    * vector shuffle-order-independent, so the gate is hash-exact with
    * no rounding escape hatch. */
  def linkPagerankQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.LinkGraph.pageRank(
      graft.llm.LinkGraph.hostEdges(crawlFixture(spark, dir)), 4)

  def oracleLinkPagerank: String =
    graft.llm.LinkGraph.oraclePageRankSql("crawl", 4, CrawlPreamble)

  /** The per-document host-rank prior ([[graft.llm.LinkGraph.docPrior]]):
    * the full crawl chain html → links → edges → PageRank → joined back
    * per doc, absent hosts 0 — what the quality-filter stage consumes. */
  def linkPriorQ(spark: SparkSession, dir: String): DataFrame = {
    val c = crawlFixture(spark, dir)
    graft.llm.LinkGraph.docPrior(c,
      graft.llm.LinkGraph.pageRank(graft.llm.LinkGraph.hostEdges(c), 4))
  }

  def oracleLinkPrior: String =
    graft.llm.LinkGraph.oracleDocPriorSql("crawl", 4, CrawlPreamble)

  /** HyperBall harmonic centrality over the same host graph
    * ([[graft.llm.LinkGraph.harmonicCentrality]], 4 rounds, m = 64):
    * register maxes are integer (order-free) and each round's estimate
    * is a single round-6 division, so even though the ALGORITHM is
    * approximate (±13% cardinalities) the EXECUTION is bit-reproducible
    * and the gate hash-exact — the oracle unrolls the identical
    * register/estimate rounds. */
  def linkHarmonicQ(spark: SparkSession, dir: String): DataFrame =
    graft.llm.LinkGraph.harmonicCentrality(
      graft.llm.LinkGraph.hostEdges(crawlFixture(spark, dir)), 4)

  def oracleLinkHarmonic: String =
    graft.llm.LinkGraph.oracleHarmonicSql("crawl", 4, CrawlPreamble)

  /** One robots.txt per host, derived from the source name so both
    * engines synthesize the same fleet of policies: a badbot group (must
    * be IGNORED for agent *), a comment, a blank separator, a prefix
    * Disallow with a longer per-host Allow carve-out, and a wildcard+$
    * rule — every matcher feature under one fixture. */
  private val RobotsTxtInject: String =
    "concat('User-agent: badbot', chr(10), " +
      "'Disallow: /', chr(10), chr(10), " +
      "'User-agent: *', chr(10), " +
      "'# crawl policy', chr(10), " +
      "'Disallow: /p/1', chr(10), " +
      "'Allow: /p/1', substr(source, 4, 1), chr(10), " +
      "'Disallow: /*9', chr(36), chr(10))"

  /** Robots compliance verdicts ([[graft.llm.Robots]]) for every doc
    * URL against its host's synthesized policy: the oracle replays the
    * whole chain — line walk, group selection, pattern→RE2 escape,
    * longest-match arithmetic — so a drift in ANY layer hash-fails on
    * the audit columns, not just the boolean. */
  def robotsFilterQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val urls = d.select(col("doc_id"), expr(LinkUrlInject).as("url"))
    val robots = d.select(col("source")).distinct()
      .select(concat(col("source"), lit(".com")).as("host"),
        expr(RobotsTxtInject).as("robots_txt"))
    graft.llm.Robots.allowed(urls, graft.llm.Robots.rules(robots))
  }

  def oracleRobotsFilter: String =
    graft.llm.Robots.oracleAllowedSql("crawlurls", "robots", preamble =
      s"robots AS (SELECT concat(source, '.com') AS host, " +
        s"$RobotsTxtInject AS robots_txt FROM " +
        "(SELECT DISTINCT source FROM documents)),\n" +
        s"crawlurls AS (SELECT doc_id, $LinkUrlInject AS url " +
        "FROM documents),\n")

  /** Tokenizer FERTILITY / compression eval — the metric a tokenizer is
    * chosen by (pieces per word, chars per piece) — over the SAME
    * fixtures as the three tokenizer gates, one row per tokenizer. All
    * inputs are corpus-total 1-row aggregates cross-joined (trivially
    * broadcast); no collect, no corpus-sized frame past the encoders. */
  def tokenizeFertilityQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tot = d.select(explode(graft.llm.Dedup.tokens(col("text"))).as("w"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast(LongType).as("n_chars"))
    def row(name: String, pieces: DataFrame): DataFrame =
      pieces.crossJoin(tot).select(
        lit(name).as("tokenizer"), col("n_words"), col("n_chars"),
        col("np").as("n_pieces"),
        round(col("np").cast(DoubleType) / col("n_words"), 6).as("fertility"),
        round(col("n_chars").cast(DoubleType) / col("np"), 6)
          .as("chars_per_piece"))
    val bpe = d.select(graft.llm.Bpe.tokenCount(col("text")).as("t"))
      .agg(sum("t").cast(LongType).as("np"))
    val bpeRaw = d.select(graft.llm.Bpe.tokenCountRaw(col("text")).as("t"))
      .agg(sum("t").cast(LongType).as("np"))
    val uni = tokenizeUnigramQ(spark, dir).agg(sum("n_pieces").as("np"))
    val wp = tokenizeWordPieceQ(spark, dir).agg(sum("n_pieces").as("np"))
    row("bpe", bpe).unionAll(row("bpe_raw", bpeRaw))
      .unionAll(row("unigram", uni)).unionAll(row("wordpiece", wp))
  }

  def oracleTokenizeFertility: String = {
    val bpeCount = graft.llm.Bpe.oracleCountSql("s")
    val bpeTok = graft.llm.Bpe.oracleTokenizedSql("text")
    val rawEnc = graft.llm.Bpe.oracleByteEncSql("hx", "n")
    val rawTok = graft.llm.Bpe.oracleTokenizedRawSql("be")
    val rawCount = graft.llm.Bpe.oracleCountRawSql("s")
    s"""WITH uni AS (${oracleTokenizeUnigram}),
       |wp AS (${oracleTokenizeWordPiece}),
       |bpe AS (SELECT CAST(sum($bpeCount) AS BIGINT) AS np FROM
       |  (SELECT $bpeTok AS s FROM documents)),
       |rawh AS (SELECT hex(encode(text)) AS hx, octet_length(encode(text)) AS n
       |  FROM documents),
       |rawe AS (SELECT $rawEnc AS be FROM rawh),
       |bper AS (SELECT CAST(sum($rawCount) AS BIGINT) AS np FROM
       |  (SELECT $rawTok AS s FROM rawe)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(len(w)) AS BIGINT) AS n_chars
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |        FROM documents)),
       |unis AS (SELECT CAST(sum(n_pieces) AS BIGINT) AS np FROM uni),
       |wps AS (SELECT CAST(sum(n_pieces) AS BIGINT) AS np FROM wp)
       |SELECT 'bpe' AS tokenizer, tot.n_words, tot.n_chars, bpe.np AS n_pieces,
       |  round(bpe.np / CAST(tot.n_words AS DOUBLE), 6) AS fertility,
       |  round(tot.n_chars / CAST(bpe.np AS DOUBLE), 6) AS chars_per_piece
       |FROM bpe, tot
       |UNION ALL
       |SELECT 'bpe_raw', tot.n_words, tot.n_chars, bper.np,
       |  round(bper.np / CAST(tot.n_words AS DOUBLE), 6),
       |  round(tot.n_chars / CAST(bper.np AS DOUBLE), 6)
       |FROM bper, tot
       |UNION ALL
       |SELECT 'unigram', tot.n_words, tot.n_chars, unis.np,
       |  round(unis.np / CAST(tot.n_words AS DOUBLE), 6),
       |  round(tot.n_chars / CAST(unis.np AS DOUBLE), 6)
       |FROM unis, tot
       |UNION ALL
       |SELECT 'wordpiece', tot.n_words, tot.n_chars, wps.np,
       |  round(wps.np / CAST(tot.n_words AS DOUBLE), 6),
       |  round(tot.n_chars / CAST(wps.np AS DOUBLE), 6)
       |FROM wps, tot""".stripMargin
  }

  /** Blocklist phrase tagging under a deterministic MIXED-LENGTH fixture:
    * the top-2 corpus word unigrams, bigrams AND trigrams (count desc,
    * phrase asc — a 6-row model collect), standing in for a real
    * profanity/spam list where single terms and multi-word phrases
    * coexist. Word-level adjacency matching, exact integer counts. */
  def textBlocklistQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).withColumn("__tk__", graft.llm.Dedup.tokens(col("text")))
    def topN(len: Int, n: Int): Seq[String] = {
      val gram =
        if (len == 1) "__tk__"
        else "transform(sequence(1, size(__tk__) - " + (len - 1) + "), " +
          "i -> concat_ws(' ', " +
          (0 until len).map(j => s"element_at(__tk__, i + $j)").mkString(", ") + "))"
      d.filter(size(col("__tk__")) >= len)
        .select(explode(expr(gram)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g").asc).limit(n)
        .select("g").as[String].collect().toSeq
    }
    val phrases = topN(1, 2) ++ topN(2, 2) ++ topN(3, 2)
    graft.llm.TextAnalysis.blocklist(d.drop("__tk__"), phrases)
  }

  def oracleTextBlocklist: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g2s AS (SELECT doc_id, CASE WHEN len(tk) >= 2 THEN
      |    list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
      |  ELSE [] END AS g FROM toks),
      |g3s AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
      |    list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
      |  ELSE [] END AS g FROM toks),
      |top1 AS (SELECT g AS p FROM (SELECT unnest(tk) AS g FROM toks) t
      |  GROUP BY 1 ORDER BY count(*) DESC, g ASC LIMIT 2),
      |top2 AS (SELECT g AS p FROM (SELECT unnest(g) AS g FROM g2s) t
      |  GROUP BY 1 ORDER BY count(*) DESC, g ASC LIMIT 2),
      |top3 AS (SELECT g AS p FROM (SELECT unnest(g) AS g FROM g3s) t
      |  GROUP BY 1 ORDER BY count(*) DESC, g ASC LIMIT 2),
      |tops AS (SELECT (SELECT list(p) FROM top1) AS p1,
      |    (SELECT list(p) FROM top2) AS p2, (SELECT list(p) FROM top3) AS p3),
      |hits AS (SELECT t.doc_id,
      |    CAST(len(list_filter(t.tk, x -> list_contains(tops.p1, x)))
      |       + len(list_filter(g2.g, x -> list_contains(tops.p2, x)))
      |       + len(list_filter(g3.g, x -> list_contains(tops.p3, x)))
      |      AS BIGINT) AS n_hits
      |  FROM toks t JOIN g2s g2 USING (doc_id) JOIN g3s g3 USING (doc_id)
      |  CROSS JOIN tops)
      |SELECT doc_id, n_hits, n_hits > 0 AS flagged FROM hits""".stripMargin

  /** Hashed-n-gram linear quality classifier with the deterministic
    * weight fixture (trained weights are a drop-in (b, w) table). */
  def textClassifier(spark: SparkSession, dir: String): DataFrame =
    Curation.classifierScore(docs(spark, dir))

  /** Logistic-regression training run for the classifier: 4 full-batch
    * gradient steps with lang='en' as the positive class — the oracle
    * re-derives every step in SQL. */
  def classifierTrainQ(spark: SparkSession, dir: String): DataFrame =
    Curation.trainClassifier(docs(spark, dir), col("lang") === "en",
      buckets = 4096, iters = 4, lr = 1.0)

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(docs(spark, dir))

  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(docs(spark, dir))

  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.entropy(docs(spark, dir))

  def textTypicality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.typicality(docs(spark, dir))

  /** CCNet-shaped reference-LM perplexity: the English subset is the
    * trusted reference (the realistic cross-lingual filter — non-English
    * docs score high against the en LM). */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexity(docs(spark, dir),
      org.apache.spark.sql.functions.col("lang") === "en")

  /** Interpolated Kneser–Ney bigram perplexity against the same English
    * reference — the KenLM estimator (continuation counts + absolute
    * discount) where text_perplexity is the add-α stand-in. */
  def textPerplexityKn(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityKn(docs(spark, dir),
      org.apache.spark.sql.functions.col("lang") === "en")

  /** The synthetic documents carry no PII, so the query injects
    * deterministic doc_id-derived PII (emails / IPv4 / phone / SSN shapes)
    * BEFORE detection — the identical SQL fragment runs in the oracle, so
    * the regex detectors and the redaction chain are exercised on varied
    * true positives rather than vacuously counting zero. */
  def textPii(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pii(docs(spark, dir), expr(PiiInjectSql))

  /** Shared Spark/DuckDB SQL for the injected PII text (both engines parse
    * this fragment identically: `||` concat, CASE, lpad, CAST AS STRING). */
  val PiiInjectSql: String =
    """text || CASE CAST(doc_id % 5 AS INT)
      |  WHEN 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com or admin@test.org'
      |  WHEN 1 THEN ' server 10.' || CAST(doc_id % 250 AS STRING) || '.0.1 up'
      |  WHEN 2 THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
      |  WHEN 3 THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' on 10.0.0.' || CAST(doc_id % 200 AS STRING)
      |  ELSE '' END""".stripMargin

  /** Benchmark decontamination: docs with doc_id ≡ 7 (mod 20) stand in for
    * the held-out benchmark set; every other doc is checked for word
    * 5-gram overlap against it (the GPT-3/PaLM recipe). */
  def decontaminateQ(spark: SparkSession, dir: String): DataFrame =
    Curation.decontaminate(docs(spark, dir),
      pmod(col("doc_id"), lit(20L)) === 7, n = 5)

  /** Deterministic per-language sampling mix: 80% of en, 50% de, 40% es,
    * 20% zh, 30% anything else — decided by an md5 bucket of the text. */
  def sampleStratifiedQ(spark: SparkSession, dir: String): DataFrame =
    Curation.sampleStratified(docs(spark, dir), col("lang"),
      Map("en" -> 80, "de" -> 50, "es" -> 40, "zh" -> 20), defaultRate = 30)

  /** Length-weighted sample without replacement: 100 docs, weight =
    * n_chars — longer docs proportionally likelier, decided by A-ES keys. */
  def sampleWeightedQ(spark: SparkSession, dir: String): DataFrame =
    Curation.sampleWeighted(docs(spark, dir), col("n_chars"), n = 100)

  /** Token-budget domain mixing: per source, keep the highest-quality docs
    * until 800 whitespace tokens are spent. */
  def mixBudgetQ(spark: SparkSession, dir: String): DataFrame =
    Curation.mixByBudget(docs(spark, dir), budget = 800L)

  /** Span-level dedup: disjoint 15-token chunks, first occurrence wins. */
  def dedupSpansQ(spark: SparkSession, dir: String): DataFrame =
    Curation.dedupSpans(docs(spark, dir), span = 15)

  /** Exact-substring dedup: sliding 15-token grams, first occurrence wins,
    * overlapping hit windows run-length merged per doc. */
  def dedupSubstrQ(spark: SparkSession, dir: String): DataFrame =
    Curation.dedupSubstr(docs(spark, dir), k = 15)

  /** Temperature-flattened mixture sampling: alpha 0.5 (strongly flattens
    * the synthetic corpus's source skew), ~20k-token target. */
  def mixTemperatureQ(spark: SparkSession, dir: String): DataFrame =
    Curation.mixByTemperature(docs(spark, dir), alpha = 0.5, budget = 20000L)

  def mixClusterQ(spark: SparkSession, dir: String): DataFrame =
    Curation.mixByCluster(docs(spark, dir), emb(spark, dir), alpha = 0.5,
      budget = 20000L, nCentroids = 16)

  /** CCNet head/middle/tail perplexity partition, en-reference LM (the
    * text_perplexity conventions), keep = head+middle. */
  def mixPerplexityQ(spark: SparkSession, dir: String): DataFrame =
    Curation.mixByPerplexity(docs(spark, dir),
      org.apache.spark.sql.functions.col("lang") === "en")

  /** Deterministic T5 span corruption at the paper-ish defaults (3-token
    * spans, 1/7 of chunks masked). */
  def spanCorruptQ(spark: SparkSession, dir: String): DataFrame =
    Curation.spanCorrupt(docs(spark, dir))

  /** RAG-style chunking: 64-token windows advancing by 48 (16 overlap). */
  def chunkOverlapQ(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkOverlap(docs(spark, dir), chunkSize = 64, stride = 48)

  /** Content-defined chunking at the defaults (16-char window, mean chunk
    * 64 chars) — the insertion-stable dedup unit. */
  def chunkCdcQ(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkCdc(docs(spark, dir))

  /** DSIR importance weights with lang='en' as the target-domain proxy. */
  def dsirWeightQ(spark: SparkSession, dir: String): DataFrame =
    Curation.dsirWeights(docs(spark, dir), col("lang") === "en")

  /** Sequence packing into 512-token blocks (GPT-style concatenation). */
  def packBlocksQ(spark: SparkSession, dir: String): DataFrame =
    Curation.packSequences(docs(spark, dir), blockSize = 512L)

  /** Multi-line fixture for boilerplate removal (the corpus text is
    * single-line): every doc gets a per-source NAV header and Footer
    * (≥ ~25 docs/source share them → boilerplate), even docs add a
    * COOKIE banner (~12-13 docs/source → still boilerplate at
    * minDocs=5), and two 40-char slices of the doc's own text are the
    * content lines (doc-unique → kept). A blank line sits mid-doc to
    * pin the blank-is-never-boilerplate rule. */
  private val LinesInject: String =
    "concat('NAV ', source, chr(10), substr(text, 1, 40), chr(10), " +
      "CASE WHEN doc_id % 2 = 0 THEN concat('COOKIE accept for ', source, chr(10)) ELSE '' END, " +
      "chr(10), substr(text, 41, 40), chr(10), 'Footer (c) ', source)"

  /** Cross-document boilerplate line removal (per-source, minDocs=5)
    * over the injected multi-line fixture. */
  def textBoilerplateQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("text", expr(LinesInject))
    graft.llm.Curation.removeBoilerplate(d, minDocs = 5)
  }

  def oracleTextBoilerplate: String =
    s"""WITH d AS (SELECT doc_id, source, $LinesInject AS text FROM documents),
       |l AS (SELECT doc_id, source, u.i AS i, u.line AS line
       |  FROM (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM d),
       |  LATERAL (SELECT unnest(list_transform(range(1, len(ls) + 1),
       |    j -> struct_pack(i := j, line := ls[j]))) AS u) x),
       |hot AS (SELECT source, lower(trim(line)) AS k FROM l
       |  WHERE trim(line) <> ''
       |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 5),
       |kf AS (SELECT l.doc_id, l.i, l.line,
       |    (trim(l.line) = '' OR h.k IS NULL) AS keep
       |  FROM l LEFT JOIN hot h
       |    ON h.source = l.source AND trim(l.line) <> '' AND h.k = lower(trim(l.line)))
       |SELECT doc_id,
       |  array_to_string(list_transform(list_sort(
       |    list(struct_pack(i := i, line := line)) FILTER (WHERE keep)),
       |    x -> x.line), chr(10)) AS clean_text,
       |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed,
       |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
       |FROM kf GROUP BY doc_id""".stripMargin

  /** Synthetic URL per document (same-expression in both engines): the
    * duplicate variants crawls actually serve — http/https, www., a
    * Cased subdomain, trailing slash, #fragment — all collapsing to one
    * canonical key, with source as the registrable domain's second
    * level and doc_id mod 50 as the page, so URL keys collide mod 100
    * (|sources| = 20) and each domain carries many keys. */
  private val UrlInject: String =
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END, " +
      "CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END, " +
      "CASE WHEN doc_id % 7 = 0 THEN 'News.' ELSE '' END, " +
      "source, '.com', " +
      "CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END, " +
      "'/p/', CAST(doc_id % 50 AS STRING), " +
      "CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END, " +
      "CASE WHEN doc_id % 8 = 0 THEN '#frag' ELSE '' END)"

  /** Per-URL dedup + per-domain cap (the RefinedWeb first filter) over
    * injected URL variants; oracle replays canonicalization (scheme/
    * fragment/www/port/slash stripping), min-doc_id keep, last-two-label
    * domains, and the doc_id-ordered cap with plain windows. */
  def dedupDomainQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("url", expr(UrlInject))
    Curation.domainDedup(d, "url", maxPerDomain = 3)
  }

  /** URL variants exercising all three public-suffix rule classes: plain
    * second-level suffixes (`co.uk`, `com.au`), a hosted private suffix
    * (`github.io`), the `*.kobe.jp` wildcard (each site under it is its
    * own public suffix — `sub.` does NOT group with the bare host), the
    * `!city.kobe.jp` exception (every `pN.city.kobe.jp` groups under
    * `city.kobe.jp`), and the no-rule default (`.com` → last two
    * labels). */
  private val UrlInjectPsl: String =
    "concat('https://', " +
      "CASE WHEN doc_id % 13 = 0 THEN " +
      "  concat('p', CAST(doc_id % 3 AS STRING), '.city.kobe.jp') " +
      "ELSE concat(CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END, " +
      "  source, " +
      "  CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com.au' " +
      "    WHEN 2 THEN '.github.io' WHEN 3 THEN '.kobe.jp' " +
      "    ELSE '.com' END) END, " +
      "'/p/', CAST(doc_id % 50 AS STRING))"

  /** [[dedupDomainQ]] with the real public-suffix-list lookup
    * ([[graft.llm.PublicSuffixes.Common]]): the per-domain cap groups by
    * REGISTRABLE domain, so `news.bbc.co.uk`-style sites are no longer
    * all one `co.uk` bucket. The oracle's domain step is GENERATED from
    * the same rule table ([[graft.llm.PublicSuffixes.oracleDomainsSql]]),
    * so Spark and DuckDB cannot drift. */
  def dedupDomainPslQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("url", expr(UrlInjectPsl))
    Curation.domainDedup(d, "url", maxPerDomain = 3,
      psl = Some(graft.llm.PublicSuffixes.Common))
  }

  def oracleDedupDomainPsl: String =
    s"""WITH u AS (SELECT doc_id, $UrlInjectPsl AS url FROM documents),
       |k AS (SELECT doc_id,
       |    regexp_replace(regexp_replace(lower(auth), '^www\\.', ''), ':(80|443)$$', '') ||
       |      regexp_replace(substr(s2, len(auth) + 1), '/$$', '') AS url_key
       |  FROM (SELECT doc_id, s2, regexp_extract(s2, '^[^/?]*') AS auth
       |    FROM (SELECT doc_id,
       |        regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*', '') AS s2
       |      FROM u))),
       |keep AS (SELECT url_key, min(doc_id) AS doc_id FROM k GROUP BY 1),
       |dom AS (${graft.llm.PublicSuffixes.oracleDomainsSql("keep",
                   graft.llm.PublicSuffixes.Common)}),
       |r AS (SELECT doc_id, url_key, domain,
       |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk FROM dom)
       |SELECT doc_id, url_key, domain FROM r WHERE rk <= 3""".stripMargin

  def oracleDedupDomain: String =
    s"""WITH u AS (SELECT doc_id, $UrlInject AS url FROM documents),
       |k AS (SELECT doc_id,
       |    regexp_replace(regexp_replace(lower(auth), '^www\\.', ''), ':(80|443)$$', '') ||
       |      regexp_replace(substr(s2, len(auth) + 1), '/$$', '') AS url_key
       |  FROM (SELECT doc_id, s2, regexp_extract(s2, '^[^/?]*') AS auth
       |    FROM (SELECT doc_id,
       |        regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*', '') AS s2
       |      FROM u))),
       |keep AS (SELECT url_key, min(doc_id) AS doc_id FROM k GROUP BY 1),
       |dom AS (SELECT doc_id, url_key,
       |    CASE WHEN regexp_matches(regexp_extract(url_key, '^[^/?]*'), '[^.]+\\.[^.]+$$')
       |      THEN regexp_extract(regexp_extract(url_key, '^[^/?]*'), '[^.]+\\.[^.]+$$')
       |      ELSE regexp_extract(url_key, '^[^/?]*') END AS domain
       |  FROM keep),
       |r AS (SELECT doc_id, url_key, domain,
       |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk FROM dom)
       |SELECT doc_id, url_key, domain FROM r WHERE rk <= 3""".stripMargin

  /** First-fit-decreasing packing into 512-token bins (whole documents,
    * never split). The oracle replays the exact FFD walk with a
    * recursive CTE — one doc placed per recursion step per bucket, bin
    * loads carried as a list — so every placement is pinned
    * bin-for-bin, offset-for-offset. */
  def packFfdQ(spark: SparkSession, dir: String): DataFrame =
    Curation.packBinsFFD(docs(spark, dir), binSize = 512L)

  def oraclePackFfd: String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, tok, CAST(floor(doc_id / 1000000.0) AS BIGINT) AS bkt
       |  FROM ($oraclePackTok)),
       |o AS (SELECT doc_id, tok, bkt,
       |    row_number() OVER (PARTITION BY bkt ORDER BY tok DESC, doc_id) AS rn
       |  FROM t),
       |walk(bkt, rn, loads, placed) AS (
       |  SELECT bkt, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
       |      CAST([] AS STRUCT(doc_id BIGINT, tok BIGINT, bin BIGINT, off BIGINT)[])
       |    FROM (SELECT DISTINCT bkt FROM o)
       |  UNION ALL
       |  SELECT w.bkt, w.rn + 1,
       |    CASE WHEN fit <= len(w.loads)
       |      THEN list_transform(range(1, len(w.loads) + 1),
       |             i -> CASE WHEN i = fit THEN w.loads[i] + o.tok ELSE w.loads[i] END)
       |      ELSE list_append(w.loads, o.tok) END,
       |    list_append(w.placed, struct_pack(doc_id := o.doc_id, tok := o.tok,
       |      bin := fit, off := CASE WHEN fit <= len(w.loads) THEN w.loads[fit] ELSE 0 END))
       |  FROM walk w
       |  JOIN o ON o.bkt = w.bkt AND o.rn = w.rn + 1,
       |  LATERAL (SELECT coalesce(
       |      list_filter(range(1, len(w.loads) + 1),
       |        i -> w.loads[i] + o.tok <= 512)[1],
       |      len(w.loads) + 1) AS fit) f),
       |fin AS (SELECT w.bkt, w.placed, CAST(len(w.loads) AS BIGINT) AS nbins
       |  FROM walk w
       |  WHERE w.rn = (SELECT count(*) FROM o WHERE o.bkt = w.bkt)),
       |based AS (SELECT bkt, placed,
       |    CAST(coalesce(sum(nbins) OVER (ORDER BY bkt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
       |  FROM fin),
       |u AS (SELECT base, unnest(placed) AS p FROM based)
       |SELECT CAST(p.doc_id AS BIGINT) AS doc_id, CAST(p.tok AS BIGINT) AS tok,
       |  CAST(base + p.bin - 1 AS BIGINT) AS bin_id,
       |  CAST(p.off AS BIGINT) AS bin_offset
       |FROM u""".stripMargin

  /** Isolation probe for the pack_blocks gate: per-doc token counts only,
    * no cumulative-offset cascade. If the driver disagrees on pack_blocks
    * but agrees here, the skew is in the window/division arithmetic (or
    * its result types); if it disagrees here too, it's tokenization. */
  def packTokQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), Curation.tokCount(col("text")).as("tok"))

  /** End-to-end curation pipeline: exact-dedup keepers ∩ quality floor ∩
    * language-ID agreement with the recorded lang column — the composition a
    * training-data pipeline actually ships. One pass over documents, three
    * bounded-key shuffles. */
  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val keepers = Dedup.exact(d).select("doc_id")
    val q = TextAnalysis.quality(d).select("doc_id", "n_words", "quality_score")
    val l = TextAnalysis.languageId(d).select("doc_id", "pred_lang")
    d.select(col("doc_id"), col("lang"))
      .join(keepers, "doc_id")
      .join(q, "doc_id")
      .join(l, "doc_id")
      .filter(col("quality_score") >= 0.5 && col("n_words") >= 20)
      .withColumn("lang_match", (col("pred_lang") === col("lang")).cast("int"))
      .select("doc_id", "lang", "pred_lang", "lang_match", "n_words", "quality_score")
  }

  /** Media near-dup over the documents corpus with injected synthetic
    * images (exact-dup pairs at residues 11/31 per 50-block, a 16-bit
    * re-encode at 41) — see [[mediaInjectSpark]]; the oracle injects the
    * same hex. */
  def dedupMediaQ(spark: SparkSession, dir: String): DataFrame = {
    val media = docs(spark, dir)
      .select(col("doc_id"), expr(mediaInjectSpark).as("payload"))
    // stride = 4 pinned (the library default) — the oracle's shingle
    // range steps by the same 4 bytes
    Multimodal.mediaNearDup(media, maxHamming = 8, stride = 4)
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.metadata(docs(spark, dir))

  /** Every-4th 256-byte frame of each payload — the frame-sampling
    * plumbing, content pinned via hex. */
  def mediaFramesQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(docs(spark, dir), frameBytes = 256, everyK = 4)

  def oracleMediaFrames: String =
    """WITH p AS (SELECT doc_id, hex(encode(text)) AS hexp,
      |    octet_length(encode(text)) AS blen
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |f AS (SELECT doc_id, CAST(u.i AS BIGINT) AS frame_idx,
      |    substr(hexp, CAST(u.i AS INT) * 512 + 1, 512) AS frame_hex
      |  FROM p, UNNEST(range(0, CAST(ceil(blen / 256.0) AS BIGINT))) AS u(i)
      |  WHERE u.i % 4 = 0)
      |SELECT doc_id, frame_idx,
      |  CAST(len(frame_hex) / 2 AS BIGINT) AS frame_bytes, frame_hex
      |FROM f""".stripMargin

  /** 16×16 nearest-neighbor resize of the stub raster — the oracle
    * replays the gather index arithmetic byte for byte. */
  def mediaResizeQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeNearest(docs(spark, dir), outW = 16, outH = 16)

  def oracleMediaResize: String =
    """WITH p AS (SELECT doc_id, hex(encode(text)) AS hexp,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS blen,
      |    CAST(octet_length(encode(text)) * 7 % 640 + 16 AS BIGINT) AS src_w,
      |    CAST(ascii(text) * 13 % 480 + 16 AS BIGINT) AS src_h
      |  FROM documents WHERE octet_length(encode(text)) > 0)
      |SELECT doc_id, src_w, src_h,
      |  array_to_string(list_transform(range(0, 256), i ->
      |    substr(hexp, CAST(((CAST(floor(floor(CAST(i AS DOUBLE) / 16) * src_h / 16) AS BIGINT) * src_w
      |      + CAST(floor(CAST(i % 16 AS DOUBLE) * src_w / 16) AS BIGINT)) % blen) * 2 + 1 AS INT), 2)),
      |  '') AS out_hex
      |FROM p""".stripMargin

  /** The typed mapPartitions decode path; the stub codec is deterministic
    * (8-bin byte histogram over the first 64 payload bytes), so the result
    * IS oracle-checkable — the DuckDB side re-derives the histogram from
    * hex-encoded bytes. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.features(spark, docs(spark, dir))
      .withColumn("dim", col("dim").cast(org.apache.spark.sql.types.LongType))

  // ---------------------------------------------------------------- oracles

  private val md5Big = "('0x' || substr(md5(%s), 1, 15))::BIGINT"

  private val gramsCte: String =
    """toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |grams AS (SELECT DISTINCT doc_id, g FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(range(1, len(tk) - 1), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g
      |  FROM toks))""".stripMargin

  def oracleDedupExact: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM documents GROUP BY md5(lower(trim(text)))""".stripMargin

  def oracleDedupNgram: String =
    s"""WITH $gramsCte,
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |posts AS (SELECT doc_id, g FROM (
       |  SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM grams) WHERE df <= 1000),
       |co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |       FROM posts a JOIN posts b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
       |  FROM co JOIN sizes sa ON co.doc_a = sa.doc_id JOIN sizes sb ON co.doc_b = sb.doc_id)
       |WHERE jaccard >= 0.3""".stripMargin

  def oracleDedupMinhash: String =
    s"""WITH $gramsCte,
       |seeds AS (SELECT unnest(range(0, 12)) AS seed),
       |mh AS (SELECT doc_id, seed, min(${md5Big.format("seed::VARCHAR || ':' || g")}) AS mh
       |       FROM grams CROSS JOIN seeds GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
       |banded AS (
       |  SELECT doc_id, b.b AS band,
       |    md5(array_to_string(list_transform(list_slice(sig, b.b * 3 + 1, b.b * 3 + 3), x -> x::VARCHAR), ',')) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
       |-- replicate the operator's maxBucket skew guard (minhashLsh drops
       |-- degenerate (band, bkey) buckets instead of exploding them)
       |bsz AS (SELECT band, bkey FROM banded GROUP BY band, bkey HAVING count(*) <= 10000),
       |bf AS (SELECT banded.* FROM banded JOIN bsz USING (band, bkey)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bf a JOIN bf b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |co AS (SELECT c.doc_a, c.doc_b, count(*) AS common
       |       FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a JOIN grams gb ON gb.doc_id = c.doc_b AND ga.g = gb.g
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
       |  FROM co JOIN sizes sa ON co.doc_a = sa.doc_id JOIN sizes sb ON co.doc_b = sb.doc_id)
       |WHERE jaccard >= 0.5""".stripMargin

  def oracleDedupSimhash: String =
    s"""WITH toks2 AS (SELECT DISTINCT doc_id, t FROM (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents)),
       |th AS (SELECT doc_id, ${md5Big.format("t")} AS h FROM toks2),
       |bits AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
       |         FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j) GROUP BY 1, 2),
       |fp AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
       |       FROM bits GROUP BY 1),
       |banded AS (SELECT doc_id, fp, b.b AS band, (fp >> (b.b * 15)) & 32767 AS bkey
       |           FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
       |-- replicate the operator's maxBucket skew guard: a (band, bkey)
       |-- bucket over 10000 members is dropped, not exploded into pairs
       |bsz AS (SELECT band, bkey FROM banded GROUP BY band, bkey HAVING count(*) <= 10000),
       |bf AS (SELECT banded.* FROM banded JOIN bsz USING (band, bkey))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |FROM bf a JOIN bf b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 6""".stripMargin

  /** Shared cosine-scoring SQL over candidate (query, neighbor) pairs CTE
    * named `pairs(query_id, neighbor_id, qe, ce)`. */
  private val cosineRankSql: String =
    """gi AS (SELECT unnest(range(1, 65)) AS i),
      |dots AS (SELECT query_id, neighbor_id,
      |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
      |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
      |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
      |  FROM pairs CROSS JOIN gi GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |    round(dot / (sqrt(qq) * sqrt(cc)), 6) AS score FROM dots),
      |ranked AS (SELECT *, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rn FROM scored)
      |SELECT query_id, neighbor_id, score, rn FROM ranked WHERE rn <= 5""".stripMargin

  def oracleAnnBrute: String =
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
       |pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    q.embedding AS qe, c.embedding AS ce
       |  FROM embeddings c CROSS JOIN q WHERE q.vec_id <> c.vec_id),
       |$cosineRankSql""".stripMargin

  /** MMR replica: the brute-cosine chain truncated at rn ≤ 20, all
    * candidate-pair cosines via the same unnest-sum idiom, then the greedy
    * unrolled as one CTE pair (penalty max-aggregate + argmax) per pick —
    * round-6 inputs, the round-7 mmr objective (the exact 1e-7 grid) and (mmr desc, neighbor_id) ties, so the
    * selection path is reproduced step for step. */
  def oracleAnnMmr: String = {
    val base =
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    q.embedding AS qe, c.embedding AS ce
        |  FROM embeddings c CROSS JOIN q WHERE q.vec_id <> c.vec_id),
        |gi AS (SELECT unnest(range(1, 65)) AS i),
        |dots AS (SELECT query_id, neighbor_id,
        |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
        |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
        |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
        |  FROM pairs CROSS JOIN gi GROUP BY 1, 2),
        |relsc AS (SELECT query_id, neighbor_id,
        |    round(dot / (sqrt(qq) * sqrt(cc)), 6) AS rel FROM dots),
        |cand AS (SELECT query_id, neighbor_id, rel FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        |    FROM relsc) WHERE rn <= 20),
        |cemb AS (SELECT c.query_id, c.neighbor_id, e.embedding AS ce
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id),
        |sdots AS (SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
        |    sum(CAST(a.ce[gi.i] AS DOUBLE) * CAST(b.ce[gi.i] AS DOUBLE)) AS dot,
        |    sum(CAST(a.ce[gi.i] AS DOUBLE) * CAST(a.ce[gi.i] AS DOUBLE)) AS aa,
        |    sum(CAST(b.ce[gi.i] AS DOUBLE) * CAST(b.ce[gi.i] AS DOUBLE)) AS bb
        |  FROM cemb a JOIN cemb b
        |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
        |  CROSS JOIN gi GROUP BY 1, 2, 3),
        |csim AS (SELECT query_id, i, j,
        |    round(dot / (sqrt(aa) * sqrt(bb)), 6) AS sim FROM sdots),
        |sel1 AS (SELECT query_id, neighbor_id, rel, mmr, 1 AS pick FROM (
        |    SELECT query_id, neighbor_id, rel, round(0.7 * rel, 7) AS mmr,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY round(0.7 * rel, 7) DESC, neighbor_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |selu1 AS (SELECT * FROM sel1)""".stripMargin
    val steps = (2 to 5).map { s =>
      val p = s - 1
      s"""rem$s AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
         |    SELECT 1 FROM selu$p u
         |    WHERE u.query_id = c.query_id AND u.neighbor_id = c.neighbor_id)),
         |pen$s AS (SELECT r.query_id, r.neighbor_id, r.rel, max(p.sim) AS msim
         |  FROM rem$s r
         |  JOIN csim p ON p.query_id = r.query_id AND p.i = r.neighbor_id
         |  JOIN selu$p u ON u.query_id = r.query_id AND p.j = u.neighbor_id
         |  GROUP BY 1, 2, 3),
         |sel$s AS (SELECT query_id, neighbor_id, rel, mmr, $s AS pick FROM (
         |    SELECT query_id, neighbor_id, rel,
         |      round(0.7 * rel - (1.0 - 0.7) * msim, 7) AS mmr,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY round(0.7 * rel - (1.0 - 0.7) * msim, 7) DESC,
         |          neighbor_id) AS rn
         |    FROM pen$s) WHERE rn = 1),
         |selu$s AS (SELECT * FROM selu$p UNION ALL SELECT * FROM sel$s)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps\nSELECT query_id, neighbor_id, rel, mmr, pick FROM selu5"
  }

  /** VALUES list of md5-derived hyperplane numerators (m / 65536 =
    * component); global plane index = tbl * planesPerTable + p. */
  private def planesValues(nTables: Int, planesPerTable: Int): String =
    (0 until nTables).flatMap { t =>
      (0 until planesPerTable).flatMap { p =>
        (0 until Ann.Dims).map { d =>
          val m = math.round(Ann.planeComponent(t * planesPerTable + p, d) * 65536).toInt
          s"($t, $p, ${d + 1}, $m)"
        }
      }
    }.mkString(", ")

  private def bucketCte(nTables: Int, planesPerTable: Int): String =
    s"""planes(tbl, p, d, m) AS (VALUES ${planesValues(nTables, planesPerTable)}),
       |dps AS (SELECT e.vec_id, pl.tbl, pl.p,
       |    sum(CAST(e.embedding[pl.d] AS DOUBLE) * (pl.m / 65536.0)) AS dp
       |  FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2, 3),
       |buckets AS (SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dps GROUP BY 1, 2)""".stripMargin

  def oracleAnnLsh: String =
    s"""WITH ${bucketCte(8, 4)},
       |eb AS (SELECT e.vec_id, e.embedding, b.tbl, b.bucket FROM embeddings e JOIN buckets b USING (vec_id)),
       |q AS (SELECT * FROM eb WHERE vec_id < 5),
       |pairs AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    q.embedding AS qe, c.embedding AS ce
       |  FROM eb c JOIN q ON q.tbl = c.tbl AND q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |$cosineRankSql""".stripMargin

  def oracleAnnIvf: String =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16),
       |gi0 AS (SELECT unnest(range(1, 65)) AS i),
       |ac AS (SELECT e.vec_id, c.cent_id,
       |    sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
       |  FROM embeddings e CROSS JOIN cents c CROSS JOIN gi0 GROUP BY 1, 2),
       |ranked_ac AS (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM ac),
       |lists AS (SELECT vec_id, cent_id FROM ranked_ac WHERE rk = 1),
       |probes AS (SELECT vec_id, cent_id FROM ranked_ac WHERE rk <= 2 AND vec_id < 5),
       |pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    qe.embedding AS qe, ce.embedding AS ce
       |  FROM lists c JOIN probes q ON q.cent_id = c.cent_id AND q.vec_id <> c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = q.vec_id
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
       |$cosineRankSql""".stripMargin

  def oracleDecontaminateEmbed: String =
    s"""WITH b AS (SELECT vec_id AS bid, embedding AS bemb FROM embeddings WHERE vec_id < 50),
       |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
       |gi AS (SELECT unnest(range(1, 65)) AS i),
       |cos AS (SELECT c.vec_id, b.bid,
       |    round(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(b.bemb[i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) *
       |       sqrt(sum(CAST(b.bemb[i] AS DOUBLE) * CAST(b.bemb[i] AS DOUBLE)))), 6) AS cs
       |  FROM c CROSS JOIN b CROSS JOIN gi GROUP BY 1, 2)
       |SELECT vec_id, max(cs) AS max_cos, max(cs) >= 0.4 AS contaminated
       |FROM cos GROUP BY 1""".stripMargin

  /** PQ replica: per-subspace L2² via (diff·diff) sums over unnested
    * indexes (rounded like every cross-engine float sum), two-step argmin
    * for identical tie-breaks, ADC lookup as a join on (sub, code). */
  def oracleAnnPq: String =
    s"""WITH subs AS (SELECT unnest(range(0, 8)) AS sub),
       |ji AS (SELECT unnest(range(1, 9)) AS j),
       |cbk AS (SELECT CAST(vec_id AS INT) AS code, embedding AS ce FROM embeddings WHERE vec_id < 16),
       |cd AS (SELECT vec_id, sub, code, sum(df * df) AS d FROM (
       |    SELECT e.vec_id, s.sub, c.code,
       |      CAST(e.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
       |    FROM embeddings e CROSS JOIN subs s CROSS JOIN cbk c CROSS JOIN ji j)
       |  GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d, code := code))).code AS code
       |  FROM cd GROUP BY 1, 2),
       |qd AS (SELECT query_id, sub, code, sum(df * df) AS qdist FROM (
       |    SELECT q.vec_id AS query_id, s.sub, c.code,
       |      CAST(q.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
       |    FROM embeddings q CROSS JOIN subs s CROSS JOIN cbk c CROSS JOIN ji j
       |    WHERE q.vec_id < 5)
       |  GROUP BY 1, 2, 3),
       |score AS (SELECT qd.query_id, codes.vec_id AS neighbor_id,
       |    round(sum(qd.qdist), 6) AS dist
       |  FROM codes JOIN qd ON qd.sub = codes.sub AND qd.code = codes.code
       |  WHERE qd.query_id <> codes.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM score)
       |SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** SQ8 replica: per-dim extrema, the same single-IEEE-op code chain
    * (sub, div, floor — bit-identical, nothing to reorder), midpoint
    * reconstruction, round-6 L2² rank. */
  def oracleAnnSq: String =
    s"""WITH gi AS (SELECT unnest(range(1, 65)) AS i),
       |st AS (SELECT i, min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
       |    max(CAST(e.embedding[i] AS DOUBLE)) AS mx
       |  FROM embeddings e CROSS JOIN gi GROUP BY 1),
       |codes AS (SELECT e.vec_id, s.i, s.mn, (s.mx - s.mn) / 256.0 AS step,
       |    CASE WHEN s.mx = s.mn THEN 0
       |         ELSE least(255, CAST(floor((CAST(e.embedding[s.i] AS DOUBLE) - s.mn)
       |                                    / ((s.mx - s.mn) / 256.0)) AS BIGINT)) END AS code
       |  FROM embeddings e CROSS JOIN st s),
       |score AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(sum((CAST(q.embedding[c.i] AS DOUBLE) - (c.mn + (c.code + 0.5) * c.step))
       |            * (CAST(q.embedding[c.i] AS DOUBLE) - (c.mn + (c.code + 0.5) * c.step))), 6) AS dist
       |  FROM codes c JOIN embeddings q ON q.vec_id < 5 AND q.vec_id <> c.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM score)
       |SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** Sign-quantization CTE chain shared by the two Hamming oracles:
    * round-6 per-dim means (the order-dependent-sum rule), threshold
    * bits, Horner-equivalent packing into two 32-bit halves via BIGINT
    * shifts — every step exact small-integer arithmetic, so the codes
    * are bit-identical to Spark's. */
  private val signCtes: String =
    s"""WITH gi AS (SELECT unnest(range(1, 65)) AS i),
       |mu AS (SELECT i, round(avg(CAST(e.embedding[i] AS DOUBLE)), 6) AS mu
       |  FROM embeddings e CROSS JOIN gi GROUP BY 1),
       |bits AS (SELECT e.vec_id, m.i,
       |    CASE WHEN CAST(e.embedding[m.i] AS DOUBLE) > m.mu
       |         THEN 1::BIGINT ELSE 0::BIGINT END AS b
       |  FROM embeddings e CROSS JOIN mu m),
       |codes AS (SELECT vec_id,
       |    sum(CASE WHEN i <= 32 THEN b << (i - 1) ELSE 0 END)::BIGINT AS code_lo,
       |    sum(CASE WHEN i > 32 THEN b << (i - 33) ELSE 0 END)::BIGINT AS code_hi
       |  FROM bits GROUP BY 1)""".stripMargin

  def oracleAnnSign: String =
    s"""$signCtes,
       |score AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    (bit_count(xor(q.code_lo, c.code_lo)) +
       |     bit_count(xor(q.code_hi, c.code_hi)))::BIGINT AS dist
       |  FROM codes c JOIN codes q ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM score)
       |SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** MIH replica: the same codes split into 8 exact 8-bit chunks
    * (floor-div/mod), chunk-equality join for candidates, exact Hamming
    * rank — the pigeonhole contract stated in SQL. */
  def oracleAnnSignMih: String =
    s"""$signCtes,
       |ck AS (SELECT unnest(range(0, 8)) AS chunk),
       |chunks AS (SELECT vec_id, code_lo, code_hi, ck.chunk,
       |    (CASE WHEN ck.chunk < 4 THEN code_lo ELSE code_hi END //
       |     CAST(256.0 ^ (ck.chunk % 4) AS BIGINT)) % 256 AS cval
       |  FROM codes CROSS JOIN ck),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    q.code_lo AS qlo, q.code_hi AS qhi, c.code_lo AS clo, c.code_hi AS chi
       |  FROM chunks c JOIN chunks q
       |    ON q.vec_id < 5 AND q.chunk = c.chunk AND q.cval = c.cval
       |       AND q.vec_id <> c.vec_id),
       |score AS (SELECT query_id, neighbor_id,
       |    (bit_count(xor(qlo, clo)) + bit_count(xor(qhi, chi)))::BIGINT AS dist
       |  FROM cand),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM score)
       |SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** IVF×PQ replica: ann_ivf's lists/probes CTEs pick the candidate pairs,
    * ann_pq's codes/qd CTEs score them — the SQL statement of "PQ scoring
    * sees only probed-list candidates". */
  /** CTE chain shared by the IVF×PQ oracle and its re-ranked variant:
    * everything up to the ADC-distance ranking. */
  private val ivfPqCtes: String =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16),
       |gi0 AS (SELECT unnest(range(1, 65)) AS i),
       |ac AS (SELECT e.vec_id, c.cent_id,
       |    sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
       |  FROM embeddings e CROSS JOIN cents c CROSS JOIN gi0 GROUP BY 1, 2),
       |ranked_ac AS (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM ac),
       |lists AS (SELECT vec_id, cent_id FROM ranked_ac WHERE rk = 1),
       |probes AS (SELECT vec_id, cent_id FROM ranked_ac WHERE rk <= 2 AND vec_id < 5),
       |subs AS (SELECT unnest(range(0, 8)) AS sub),
       |ji AS (SELECT unnest(range(1, 9)) AS j),
       |cbk AS (SELECT CAST(vec_id AS INT) AS code, embedding AS ce FROM embeddings WHERE vec_id < 16),
       |cd AS (SELECT vec_id, sub, code, sum(df * df) AS d FROM (
       |    SELECT e.vec_id, s.sub, c.code,
       |      CAST(e.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
       |    FROM embeddings e CROSS JOIN subs s CROSS JOIN cbk c CROSS JOIN ji j)
       |  GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d, code := code))).code AS code
       |  FROM cd GROUP BY 1, 2),
       |qd AS (SELECT query_id, sub, code, sum(df * df) AS qdist FROM (
       |    SELECT q.vec_id AS query_id, s.sub, c.code,
       |      CAST(q.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
       |    FROM embeddings q CROSS JOIN subs s CROSS JOIN cbk c CROSS JOIN ji j
       |    WHERE q.vec_id < 5)
       |  GROUP BY 1, 2, 3),
       |score AS (SELECT p.vec_id AS query_id, l.vec_id AS neighbor_id,
       |    round(sum(qd.qdist), 6) AS dist
       |  FROM lists l JOIN probes p ON p.cent_id = l.cent_id AND p.vec_id <> l.vec_id
       |  JOIN codes ON codes.vec_id = l.vec_id
       |  JOIN qd ON qd.query_id = p.vec_id AND qd.sub = codes.sub AND qd.code = codes.code
       |  GROUP BY 1, 2),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM score)""".stripMargin

  def oracleAnnIvfPq: String =
    s"""$ivfPqCtes
       |SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** Re-ranked variant: the ADC top-10 shortlist re-scored with exact
    * cosine on the raw vectors (the same final ranking CTE as ann_brute). */
  def oracleAnnIvfPqRr: String =
    s"""$ivfPqCtes,
       |short AS (SELECT query_id, neighbor_id FROM ranked WHERE rn <= 10),
       |rpairs AS (SELECT s.query_id, s.neighbor_id, q.embedding AS qe, c.embedding AS ce
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.query_id
       |  JOIN embeddings c ON c.vec_id = s.neighbor_id),
       |rgi AS (SELECT unnest(range(1, 65)) AS i),
       |rdots AS (SELECT query_id, neighbor_id,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
       |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
       |  FROM rpairs CROSS JOIN rgi GROUP BY 1, 2),
       |rscored AS (SELECT query_id, neighbor_id,
       |    round(dot / (sqrt(qq) * sqrt(cc)), 6) AS score FROM rdots),
       |rranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rn FROM rscored)
       |SELECT query_id, neighbor_id, score, rn FROM rranked WHERE rn <= 5""".stripMargin

  def oracleDedupEmbed: String =
    s"""WITH ${bucketCte(8, 4)},
       |eb AS (SELECT e.vec_id, e.embedding, b.tbl, b.bucket FROM embeddings e JOIN buckets b USING (vec_id)),
       |-- replicate lshNearDup's maxBucket skew guard on (tbl, bucket)
       |ebsz AS (SELECT tbl, bucket FROM eb GROUP BY tbl, bucket HAVING count(*) <= 10000),
       |ebf AS (SELECT eb.* FROM eb JOIN ebsz USING (tbl, bucket)),
       |pairs AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    a.embedding AS qe, b.embedding AS ce
       |  FROM ebf a JOIN ebf b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |gi AS (SELECT unnest(range(1, 65)) AS i),
       |dots AS (SELECT query_id, neighbor_id,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
       |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
       |  FROM pairs CROSS JOIN gi GROUP BY 1, 2)
       |SELECT query_id AS vec_a, neighbor_id AS vec_b, cos FROM (
       |  SELECT query_id, neighbor_id, round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cos FROM dots)
       |WHERE cos >= 0.3""".stripMargin

  /** Hard-negative replica: the [[oracleDedupEmbed]] bucket/pair/cosine
    * chain (full cosine range), symmetrized, positives cut at 0.4, per-
    * anchor (cos desc, cand_id asc) top-5. */
  def oracleMineNegatives: String =
    s"""WITH ${bucketCte(8, 4)},
       |eb AS (SELECT e.vec_id, e.embedding, b.tbl, b.bucket FROM embeddings e JOIN buckets b USING (vec_id)),
       |ebsz AS (SELECT tbl, bucket FROM eb GROUP BY tbl, bucket HAVING count(*) BETWEEN 2 AND 1000),
       |ebf AS (SELECT eb.* FROM eb JOIN ebsz USING (tbl, bucket)),
       |pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    a.embedding AS qe, b.embedding AS ce
       |  FROM ebf a JOIN ebf b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |gi AS (SELECT unnest(range(1, 65)) AS i),
       |dots AS (SELECT vec_a, vec_b,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
       |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
       |  FROM pairs CROSS JOIN gi GROUP BY 1, 2),
       |scored AS (SELECT vec_a, vec_b,
       |    round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cos FROM dots),
       |sym AS (SELECT vec_a AS anchor_id, vec_b AS cand_id, cos FROM scored
       |  UNION ALL SELECT vec_b AS anchor_id, vec_a AS cand_id, cos FROM scored),
       |neg AS (SELECT * FROM sym WHERE cos < 0.4)
       |SELECT anchor_id, cand_id, cos, CAST(rk AS INT) AS rk FROM (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY anchor_id ORDER BY cos DESC, cand_id ASC) AS rk
       |  FROM neg)
       |WHERE rk <= 5""".stripMargin

  /** Incremental-dedup replica: the minhash pipeline with the corpus split
    * at max(doc_id)/2 — stored side gets the build-time bucket guard, probe
    * side joins against the stored postings only (cross pairs, never
    * within-batch). */
  def oracleDedupIncremental: String =
    s"""WITH $gramsCte,
       |half AS (SELECT max(doc_id) // 2 AS h FROM documents),
       |seeds AS (SELECT unnest(range(0, 12)) AS seed),
       |mh AS (SELECT doc_id, seed, min(${md5Big.format("seed::VARCHAR || ':' || g")}) AS mh
       |       FROM grams CROSS JOIN seeds GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
       |banded AS (
       |  SELECT doc_id, b.b AS band,
       |    md5(array_to_string(list_transform(list_slice(sig, b.b * 3 + 1, b.b * 3 + 3), x -> x::VARCHAR), ',')) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
       |stored AS (SELECT banded.* FROM banded, half WHERE doc_id <= h),
       |probe AS (SELECT banded.* FROM banded, half WHERE doc_id > h),
       |-- build-time guard: degenerate buckets measured over the STORED side
       |bsz AS (SELECT band, bkey FROM stored GROUP BY band, bkey HAVING count(*) <= 10000),
       |sf AS (SELECT stored.* FROM stored JOIN bsz USING (band, bkey)),
       |cand AS (SELECT DISTINCT q.doc_id AS doc_id, s.doc_id AS dup_id
       |         FROM sf s JOIN probe q ON s.band = q.band AND s.bkey = q.bkey AND s.doc_id <> q.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |co AS (SELECT c.doc_id, c.dup_id, count(*) AS common
       |       FROM cand c JOIN grams ga ON ga.doc_id = c.doc_id JOIN grams gb ON gb.doc_id = c.dup_id AND ga.g = gb.g
       |       GROUP BY 1, 2)
       |SELECT doc_id, dup_id, jaccard FROM (
       |  SELECT co.doc_id, co.dup_id,
       |    round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
       |  FROM co JOIN sizes sa ON co.doc_id = sa.doc_id JOIN sizes sb ON co.dup_id = sb.doc_id)
       |WHERE jaccard >= 0.5""".stripMargin

  /** Cluster-mixing replica: the ann_ivf assignment CTEs (mc_-prefixed —
    * unique names per composed layer) feeding the mix_temperature share
    * arithmetic with source := 'cluster_' || cent_id. */
  def oracleMixCluster: String =
    s"""WITH mc_cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16),
       |mc_gi AS (SELECT unnest(range(1, 65)) AS i),
       |mc_ac AS (SELECT e.vec_id, c.cent_id,
       |    sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
       |  FROM embeddings e CROSS JOIN mc_cents c CROSS JOIN mc_gi GROUP BY 1, 2),
       |mc_asg AS (SELECT vec_id AS doc_id, cent_id FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM mc_ac) WHERE rk = 1),
       |mc_t AS (SELECT d.doc_id, 'cluster_' || a.cent_id AS source,
       |    CAST(len(list_filter(string_split(replace(replace(replace(d.text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS tok,
       |    (('0x' || substr(md5(d.text), 1, 8))::BIGINT % 16777216) / 16777216.0 AS draw
       |  FROM documents d JOIN mc_asg a USING (doc_id)),
       |mc_m AS (SELECT source, sum(tok) AS mass FROM mc_t GROUP BY 1),
       |mc_q AS (SELECT source, mass, pow(CAST(mass AS DOUBLE), 0.5) AS p FROM mc_m),
       |mc_r AS (SELECT source,
       |    round(least(1.0, 20000.0 * (p / (SELECT sum(p) FROM mc_q)) / CAST(mass AS DOUBLE)), 9) AS rate9
       |  FROM mc_q)
       |SELECT mc_t.source, mc_t.doc_id, mc_t.tok, mc_r.rate9
       |FROM mc_t JOIN mc_r USING (source) WHERE mc_t.draw < mc_r.rate9""".stripMargin

  /** SemDeDup replica: same first-16 centroids / argmax assignment as
    * oracleAnnIvf, cluster-scoped ordered pairs, round-6 cosine ≥ 0.3,
    * first-occurrence-wins keep verdict. All-integer output. */
  def oracleDedupSemdedup: String =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16),
       |gi0 AS (SELECT unnest(range(1, 65)) AS i),
       |ac AS (SELECT e.vec_id, c.cent_id,
       |    sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
       |  FROM embeddings e CROSS JOIN cents c CROSS JOIN gi0 GROUP BY 1, 2),
       |asg AS (SELECT vec_id, cent_id FROM (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM ac) WHERE rk = 1),
       |-- replicate semDedup's maxCluster guard (pairs only from clusters of 2..10000)
       |csz AS (SELECT cent_id FROM asg GROUP BY cent_id HAVING count(*) BETWEEN 2 AND 10000),
       |pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ae.embedding AS qe, be.embedding AS ce
       |  FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  JOIN csz ON a.cent_id = csz.cent_id
       |  JOIN embeddings ae ON ae.vec_id = a.vec_id
       |  JOIN embeddings be ON be.vec_id = b.vec_id),
       |gi AS (SELECT unnest(range(1, 65)) AS i),
       |dots AS (SELECT query_id, neighbor_id,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
       |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
       |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
       |  FROM pairs CROSS JOIN gi GROUP BY 1, 2),
       |dup AS (SELECT neighbor_id AS vec_id, min(query_id) AS min_dup,
       |    CAST(count(*) AS BIGINT) AS n_dups
       |  FROM (SELECT query_id, neighbor_id,
       |      round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cos FROM dots)
       |  WHERE cos >= 0.3 GROUP BY 1)
       |SELECT asg.vec_id, asg.cent_id, dup.min_dup IS NULL AS keep,
       |  dup.min_dup, coalesce(dup.n_dups, CAST(0 AS BIGINT)) AS n_dups
       |FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id""".stripMargin

  /** Incremental-SemDeDup replica: the store (lower half, seeds included)
    * plus batch equals the whole corpus, and the frozen first-16 centroids
    * equal the whole-corpus fit — so the oracle is [[oracleDedupSemdedup]]
    * with the final select restricted to probe-half vectors. The guard and
    * dup CTEs are shared verbatim: the maxCluster guard measures TOTAL
    * cluster size in both runs, and a probe vector's earlier duplicates
    * (store + earlier-in-batch) are exactly its whole-corpus earlier
    * duplicates. */
  def oracleDedupSemdedupIncremental: String =
    oracleDedupSemdedup.replace(
      "FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id",
      "FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id\n" +
        "WHERE asg.vec_id > (SELECT max(vec_id) // 2 FROM embeddings)")

  private def sqlList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("[", ", ", "]")

  def oracleTextLang: String = {
    val m = TextAnalysis.Stopwords
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
       |h AS (SELECT doc_id,
       |  CAST(len(list_filter(tk, x -> list_contains(${sqlList(m("en"))}, x))) AS BIGINT) AS en_hits,
       |  CAST(len(list_filter(tk, x -> list_contains(${sqlList(m("de"))}, x))) AS BIGINT) AS de_hits,
       |  CAST(len(list_filter(tk, x -> list_contains(${sqlList(m("fr"))}, x))) AS BIGINT) AS fr_hits,
       |  CAST(len(list_filter(tk, x -> list_contains(${sqlList(m("es"))}, x))) AS BIGINT) AS es_hits
       |  FROM t)
       |SELECT doc_id,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS pred_lang,
       |  en_hits, de_hits, fr_hits, es_hits
       |FROM h""".stripMargin
  }

  /** Gopher battery replica: whitespace words, case-folded distinct stop
    * types, single-division ratios round-6 — every flag re-derived. */
  def oracleTextGopher: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[^ \t\n\r]+') AS w,
      |    CAST(len(regexp_extract_all(text, '#')) +
      |         len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_sym
      |  FROM documents),
      |c AS (SELECT doc_id, n_sym,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS len_sum,
      |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
      |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
      |      s -> list_contains(list_transform(w, x -> lower(x)), s))) AS BIGINT) AS n_stop
      |  FROM t),
      |r AS (SELECT doc_id, n_words, n_stop,
      |    CASE WHEN n_words = 0 THEN 0.0
      |         ELSE round(CAST(len_sum AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS mean_word_len,
      |    CASE WHEN n_words = 0 THEN 0.0
      |         ELSE round(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS frac_alpha,
      |    CASE WHEN n_words = 0 THEN 0.0
      |         ELSE round(CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS symbol_ratio
      |  FROM c)
      |SELECT doc_id, n_words, mean_word_len, frac_alpha, n_stop, symbol_ratio,
      |  (n_words >= 20 AND n_words <= 100000) AS r_words,
      |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_mean_len,
      |  (frac_alpha >= 0.8) AS r_alpha,
      |  (n_stop >= 1) AS r_stop,
      |  (symbol_ratio <= 0.1) AS r_symbol,
      |  ((n_words >= 20 AND n_words <= 100000) AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
      |   AND (frac_alpha >= 0.8) AND (n_stop >= 1) AND (symbol_ratio <= 0.1)) AS pass
      |FROM r""".stripMargin

  def oracleTextQuality: String = {
    val allStops = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       |    CAST(len(list_filter(tk, x -> list_contains(${sqlList(allStops)}, x))) AS BIGINT) AS n_stop
       |  FROM t),
       |r AS (SELECT doc_id, n_chars, n_words, n_punct, n_stop,
       |    CASE WHEN n_chars = 0 THEN 0.0
       |         ELSE round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS punct_ratio,
       |    CASE WHEN n_words = 0 THEN 0.0
       |         ELSE round(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS stop_ratio
       |  FROM c)
       |SELECT doc_id, n_chars, n_words, n_punct, n_stop, punct_ratio, stop_ratio,
       |  round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |        stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
       |FROM r""".stripMargin
  }

  def oracleTextTokens: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[^ \t\n\r]+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT) AS bpe_tokens
      |FROM documents""".stripMargin

  /** BPE replica: the tokenized-string replace chain is GENERATED from
    * the same merge table the Spark side folds over
    * ([[graft.llm.Bpe.oracleTokenizedSql]]) — both engines run the
    * identical left-to-right replace semantics, so counts are exact
    * integers at any scale. */
  def oracleTextTokensBpe: String =
    s"""WITH bpe_s AS (SELECT doc_id, text,
       |    ${graft.llm.Bpe.oracleTokenizedSql("text")} AS s FROM documents)
       |SELECT doc_id,
       |  CAST(len(list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS ws_tok,
       |  CAST(${graft.llm.Bpe.oracleCountSql("s")} AS BIGINT) AS bpe_tok
       |FROM bpe_s""".stripMargin

  /** Round-trip replica: the oracle is ONLY the whitespace normalization —
    * the Spark side must reconstruct it through the full encode→decode
    * chain, so the proof burden (merge rules preserve characters) sits
    * entirely on the library side. */
  def oracleBpeRoundtrip: String =
    """SELECT doc_id, regexp_replace(text, '[ \t\n\r]+', ' ', 'g') AS text_rt
      |FROM documents""".stripMargin

  /** Vocab replica: same [a-z0-9]+ tokenization, min-count 5, rank by
    * (cnt desc, token asc). */
  def oracleVocabBuild: String =
    """WITH vt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
      |vc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM vt GROUP BY 1 HAVING count(*) >= 5)
      |SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INT) AS rank
      |FROM vc""".stripMargin

  /** TF-IDF replica: tf·ln(N/df) rounded to 6, per-doc top-3 by
    * (score desc, token asc). */
  def oracleTextTfidf: String =
    """WITH ti0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
      |ti_tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM ti0 GROUP BY 1, 2),
      |ti_df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM ti_tf GROUP BY 1),
      |ti_n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      |ti_sc AS (SELECT ti_tf.doc_id, ti_tf.token, ti_tf.tf,
      |    round(ti_tf.tf * ln(ti_n.n_docs / ti_df.df), 6) AS score
      |  FROM ti_tf JOIN ti_df USING (token) CROSS JOIN ti_n)
      |SELECT doc_id, token, tf, score, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
      |  FROM ti_sc)
      |WHERE rk <= 3""".stripMargin

  /** PCA replica — DERIVES the whole fit in generated SQL (the
    * bpe_train / classifier_train unrolled-replay rule): round-6 means and
    * covariance (the only order-dependent sums), then every power-iteration
    * matvec / norm / Rayleigh dot as LEFT-ASSOCIATED explicit 64-term
    * chains over pivoted single-row vectors — token-matched to
    * [[graft.llm.Pca]]'s driver arithmetic, so the model and projections
    * are bit-identical. `+ 0.0` after every round is the signed-zero
    * normalization (Spark/BigDecimal rounds −tiny to +0.0, DuckDB keeps
    * −0.0). */
  def oracleEmbedPca(k: Int, iters: Int): String = {
    val D = graft.llm.Pca.Dims
    val sb = new StringBuilder
    def pivot(name: String, src: String, keyCol: String, valCol: String,
              outPrefix: String, rowKey: String = ""): Unit = {
      val cols = (0 until D).map(d =>
        s"max(CASE WHEN $keyCol = $d THEN $valCol END) AS $outPrefix$d")
        .mkString(", ")
      val (sel, grp) =
        if (rowKey.isEmpty) ("", "") else (s"$rowKey, ", s" GROUP BY $rowKey")
      sb.append(s"$name AS MATERIALIZED (SELECT $sel$cols FROM $src$grp),\n")
    }
    sb.append("WITH pe AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),\n")
    sb.append("pn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM pe),\n")
    sb.append(s"pd AS MATERIALIZED (SELECT unnest(range(0, $D)) AS d),\n")
    sb.append("px AS MATERIALIZED (SELECT vec_id, pd.d, CAST(embedding[pd.d + 1] AS DOUBLE) AS x FROM pe CROSS JOIN pd),\n")
    sb.append("pm AS MATERIALIZED (SELECT d, round(avg(x), 6) + 0.0 AS m FROM px GROUP BY d),\n")
    sb.append("pxc AS MATERIALIZED (SELECT px.vec_id, px.d, px.x - pm.m AS x FROM px JOIN pm USING (d)),\n")
    sb.append("pcv AS MATERIALIZED (SELECT a.d AS i, b.d AS j, round(sum(a.x * b.x) / pn.n, 6) + 0.0 AS c\n" +
      "  FROM pxc a JOIN pxc b USING (vec_id) CROSS JOIN pn GROUP BY a.d, b.d, pn.n),\n")
    pivot("pC0", "pcv", "j", "c", "c", rowKey = "i")
    for (c <- 0 until k) {
      val inits = (0 until D).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"pca:$c:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 4), 16)
        s"($d, ($h - 32768) / 65536.0)"
      }.mkString(", ")
      sb.append(s"pv${c}_0(d, v) AS MATERIALIZED (VALUES $inits),\n")
      for (t <- 1 to iters) {
        pivot(s"pvp${c}_${t - 1}", s"pv${c}_${t - 1}", "d", "v", "v")
        val mv = (0 until D).map(d => s"c$d * p.v$d").mkString(" + ")
        sb.append(s"pw${c}_$t AS MATERIALIZED (SELECT i, ($mv) AS w FROM pC$c CROSS JOIN pvp${c}_${t - 1} p),\n")
        pivot(s"pwp${c}_$t", s"pw${c}_$t", "i", "w", "w")
        val nrm = (0 until D).map(d => s"w$d * w$d").mkString(" + ")
        sb.append(s"pnm${c}_$t AS MATERIALIZED (SELECT sqrt($nrm) AS nm FROM pwp${c}_$t),\n")
        sb.append(s"pv${c}_$t AS MATERIALIZED (SELECT i AS d, round(w / pnm.nm, 6) + 0.0 AS v " +
          s"FROM pw${c}_$t CROSS JOIN pnm${c}_$t pnm),\n")
      }
      sb.append(s"psg$c AS MATERIALIZED (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s " +
        s"FROM pv${c}_$iters ORDER BY abs(v) DESC, d ASC LIMIT 1),\n")
      sb.append(s"pvf$c AS MATERIALIZED (SELECT d, v * psg$c.s AS v FROM pv${c}_$iters CROSS JOIN psg$c),\n")
      pivot(s"pvfp$c", s"pvf$c", "d", "v", "v")
      val mv2 = (0 until D).map(d => s"c$d * p.v$d").mkString(" + ")
      sb.append(s"pw2$c AS MATERIALIZED (SELECT i, ($mv2) AS w FROM pC$c CROSS JOIN pvfp$c p),\n")
      pivot(s"pw2p$c", s"pw2$c", "i", "w", "w")
      val ray = (0 until D).map(d => s"p.v$d * w.w$d").mkString(" + ")
      sb.append(s"plam$c AS MATERIALIZED (SELECT round($ray, 6) + 0.0 AS l FROM pvfp$c p CROSS JOIN pw2p$c w),\n")
      if (c < k - 1) {
        val defl = (0 until D).map(d =>
          s"pC.c$d - pl.l * vi.v * p.v$d AS c$d").mkString(", ")
        sb.append(s"pC${c + 1} AS MATERIALIZED (SELECT pC.i, $defl FROM pC$c pC " +
          s"JOIN pvf$c vi ON vi.d = pC.i CROSS JOIN pvfp$c p CROSS JOIN plam$c pl),\n")
      }
    }
    pivot("pmp", "pm", "d", "m", "m")
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb.append("\n")
    val projCols = (0 until k).map { c =>
      val terms = (0 until D).map(d =>
        s"(CAST(embedding[${d + 1}] AS DOUBLE) - pmp.m$d) * pvfp$c.v$d").mkString(" + ")
      s"round($terms, 6) + 0.0 AS p$c"
    }.mkString(",\n  ")
    sb.append(s"SELECT pe.vec_id, $projCols\nFROM pe CROSS JOIN pmp " +
      (0 until k).map(c => s"CROSS JOIN pvfp$c").mkString(" "))
    sb.toString
  }

  /** BM25 replica — the SAME IEEE expression tree as
    * [[graft.llm.Search.scoreBm25]] (Lucene idf, Robertson k1=1.2 b=0.75
    * written as the literal arithmetic, round-6 per-(query, doc) sum,
    * (score desc, doc_id asc) ranks). Shared verbatim by `search_bm25`
    * and `search_index`: the store path's stats/df merges are exact, so
    * both must hash-match the one whole-corpus replay. */
  def oracleSearchBm25: String =
    """WITH bmq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 5),
      |bmqt AS (SELECT DISTINCT query_id, unnest(qt) AS token FROM bmq),
      |bmc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 5),
      |bmdl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM bmc),
      |bmst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM bmdl),
      |bmocc AS (SELECT doc_id, unnest(tk) AS token FROM bmc),
      |bmtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM bmocc GROUP BY 1, 2),
      |bmdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM bmtf GROUP BY 1),
      |bmsc AS (SELECT q.query_id, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(l.dl AS DOUBLE) /
      |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS w
      |  FROM bmtf t JOIN bmqt q USING (token) JOIN bmdf d USING (token)
      |  JOIN bmdl l ON t.doc_id = l.doc_id CROSS JOIN bmst s),
      |bmag AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit,
      |    round(sum(w), 6) AS score
      |  FROM bmsc GROUP BY 1, 2)
      |SELECT query_id, doc_id, n_hit, score, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM bmag)
      |WHERE rk <= 5""".stripMargin

  /** BM25F replica: the two field chains (title = list_slice(tk, 1, 4)
    * at w=2, body = tk at w=1) each with their OWN dl/avdl, weighted
    * pre-saturation tfn summed per (query, doc, token), document df over
    * the union, then the shared `idf · wtf/(k1 + wtf)` saturation —
    * field arithmetic replayed term-for-term against
    * [[graft.llm.Search.bm25fTopK]]. */
  def oracleSearchBm25f: String =
    """WITH bmq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 5),
      |bmqt AS (SELECT DISTINCT query_id, unnest(qt) AS token FROM bmq),
      |bmc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 5),
      |fld AS (SELECT doc_id, list_slice(tk, 1, 4) AS ftk, 2.0 AS w FROM bmc
      |  UNION ALL SELECT doc_id, tk AS ftk, 1.0 AS w FROM bmc),
      |fdl AS (SELECT doc_id, w, CAST(len(ftk) AS BIGINT) AS dl FROM fld),
      |fst AS (SELECT w, CAST(count(*) AS DOUBLE) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS DOUBLE) AS sum_dl FROM fdl GROUP BY 1),
      |focc AS (SELECT doc_id, w, unnest(ftk) AS token FROM fld),
      |ftf AS (SELECT doc_id, w, token, CAST(count(*) AS DOUBLE) AS tf
      |  FROM focc GROUP BY 1, 2, 3),
      |tfn AS (SELECT t.doc_id, t.token,
      |    t.w * t.tf / (1.0 - 0.75 + 0.75 * CAST(l.dl AS DOUBLE) /
      |      (s.sum_dl / s.n_docs)) AS tfn
      |  FROM ftf t JOIN fdl l ON t.doc_id = l.doc_id AND t.w = l.w
      |  JOIN fst s ON t.w = s.w),
      |wtf AS (SELECT q.query_id, x.doc_id, x.token, sum(x.tfn) AS wtf
      |  FROM tfn x JOIN bmqt q USING (token) GROUP BY 1, 2, 3),
      |fdf AS (SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      |  FROM tfn GROUP BY 1),
      |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM bmc),
      |sc AS (SELECT query_id, w.doc_id,
      |    ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5)) *
      |      w.wtf / (1.2 + w.wtf) AS ws
      |  FROM wtf w JOIN fdf d USING (token) CROSS JOIN nd n),
      |ag AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit,
      |    round(sum(ws), 6) AS score FROM sc GROUP BY 1, 2)
      |SELECT query_id, doc_id, n_hit, score, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM ag)
      |WHERE rk <= 5""".stripMargin

  /** SDM replica: the [[oracleSearchBm25]] unigram chain plus a parallel
    * bigram chain (adjacent tokens joined by one space via the 1-based
    * `range`/`list_transform` idiom), fused full-outer at 0.85/0.15 and
    * rounded at 8 decimals (the exact 5e-8 grid of a λ mix over round-6
    * inputs — round-6 would flip on the half-up boundary). */
  def oracleSearchSdm: String =
    """WITH bmq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 5),
      |bmqt AS (SELECT DISTINCT query_id, unnest(qt) AS token FROM bmq),
      |qbg AS (SELECT DISTINCT query_id, unnest(list_transform(
      |    range(1, len(qt)), j -> qt[j] || ' ' || qt[j + 1])) AS token
      |  FROM bmq),
      |bmc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 5),
      |bmdl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM bmc),
      |bmst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM bmdl),
      |bmocc AS (SELECT doc_id, unnest(tk) AS token FROM bmc),
      |bmtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM bmocc GROUP BY 1, 2),
      |bmdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM bmtf GROUP BY 1),
      |bmsc AS (SELECT q.query_id, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(l.dl AS DOUBLE) /
      |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS w
      |  FROM bmtf t JOIN bmqt q USING (token) JOIN bmdf d USING (token)
      |  JOIN bmdl l ON t.doc_id = l.doc_id CROSS JOIN bmst s),
      |bmag AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
      |  FROM bmsc GROUP BY 1, 2),
      |bgc AS (SELECT doc_id, list_transform(range(1, len(tk)),
      |    j -> tk[j] || ' ' || tk[j + 1]) AS bg FROM bmc),
      |bgdl AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS dl FROM bgc),
      |bgst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM bgdl),
      |bgocc AS (SELECT doc_id, unnest(bg) AS token FROM bgc),
      |bgtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM bgocc GROUP BY 1, 2),
      |bgdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM bgtf GROUP BY 1),
      |bgsc AS (SELECT q.query_id, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(l.dl AS DOUBLE) /
      |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS w
      |  FROM bgtf t JOIN qbg q USING (token) JOIN bgdf d USING (token)
      |  JOIN bgdl l ON t.doc_id = l.doc_id CROSS JOIN bgst s),
      |bgag AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
      |  FROM bgsc GROUP BY 1, 2),
      |fused AS (SELECT coalesce(u.query_id, g.query_id) AS query_id,
      |    coalesce(u.doc_id, g.doc_id) AS doc_id,
      |    coalesce(u.score, 0.0) AS s_uni, coalesce(g.score, 0.0) AS s_bi
      |  FROM bmag u FULL OUTER JOIN bgag g
      |    ON u.query_id = g.query_id AND u.doc_id = g.doc_id),
      |fsc AS (SELECT query_id, doc_id, s_uni, s_bi,
      |    round(0.85 * s_uni + 0.15 * s_bi, 8) AS score FROM fused)
      |SELECT query_id, doc_id, s_uni, s_bi, score, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM fsc)
      |WHERE rk <= 5""".stripMargin

  /** Dirichlet QL replica: the matched-term decomposition re-derived in
    * SQL — integer ctf sums cast after aggregation, the same ln/division
    * parenthesization, round-6 scores before ranks. */
  def oracleSearchQl: String =
    """WITH bmq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 5),
      |qn AS (SELECT query_id, token, CAST(count(*) AS DOUBLE) AS qtf
      |  FROM (SELECT query_id, unnest(qt) AS token FROM bmq) GROUP BY 1, 2),
      |qlen AS (SELECT query_id, sum(qtf) AS qlen FROM qn GROUP BY 1),
      |bmc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 5),
      |bmdl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM bmc),
      |bmst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM bmdl),
      |bmocc AS (SELECT doc_id, unnest(tk) AS token FROM bmc),
      |bmtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM bmocc GROUP BY 1, 2),
      |ctf AS (SELECT token, CAST(sum(tf) AS DOUBLE) AS ctf
      |  FROM bmtf GROUP BY 1),
      |msc AS (SELECT q.query_id, t.doc_id, l.dl,
      |    q.qtf * ln(1.0 + CAST(t.tf AS DOUBLE) /
      |      (2000.0 * (c.ctf / CAST(s.sum_dl AS DOUBLE)))) AS w
      |  FROM bmtf t JOIN qn q USING (token) JOIN ctf c USING (token)
      |  JOIN bmdl l ON t.doc_id = l.doc_id CROSS JOIN bmst s),
      |mag AS (SELECT query_id, doc_id, dl, CAST(count(*) AS BIGINT) AS n_hit,
      |    sum(w) AS s1 FROM msc GROUP BY 1, 2, 3),
      |qsc AS (SELECT m.query_id, m.doc_id, m.n_hit,
      |    round(m.s1 + ql.qlen * ln(2000.0 /
      |      (CAST(m.dl AS DOUBLE) + 2000.0)), 6) AS score
      |  FROM mag m JOIN qlen ql ON m.query_id = ql.query_id)
      |SELECT query_id, doc_id, n_hit, score, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM qsc)
      |WHERE rk <= 5""".stripMargin

  /** RM3 replica: the [[oracleSearchBm25]] chain reused for the feedback
    * ranking, then the relevance model (doc weights = normalized feedback
    * scores, RM1 masses round-6-ranked top-10, renormalized), the α = 0.5
    * interpolation with the query's own term distribution, and a second
    * weighted scoring pass against the same whole-corpus df/stats —
    * multiplication order mirrors [[graft.llm.Search.rm3TopK]]'s
    * expression tree term for term. */
  def oracleSearchRm3: String = {
    val base = oracleSearchBm25
    val cut = base.indexOf("SELECT query_id, doc_id, n_hit, score,")
    require(cut > 0, "bm25 oracle tail not found")
    base.substring(0, cut).stripSuffix("\n") +
      """,
        |fb AS (SELECT query_id, doc_id, score FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        |    FROM bmag) WHERE rk <= 5),
        |fbw AS (SELECT query_id, doc_id,
        |    score / sum(score) OVER (PARTITION BY query_id) AS wd FROM fb),
        |rm1 AS (SELECT f.query_id, t.token,
        |    round(sum(CAST(t.tf AS DOUBLE) / CAST(l.dl AS DOUBLE) * f.wd), 6)
        |      AS wt
        |  FROM bmtf t JOIN fbw f ON t.doc_id = f.doc_id
        |  JOIN bmdl l ON t.doc_id = l.doc_id GROUP BY 1, 2),
        |prm AS (SELECT query_id, token,
        |    wt / sum(wt) OVER (PARTITION BY query_id) AS prm
        |  FROM (SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY wt DESC, token) AS rk FROM rm1)
        |  WHERE rk <= 10),
        |pqn AS (SELECT query_id, token, CAST(count(*) AS DOUBLE) AS qtf
        |  FROM (SELECT query_id, unnest(qt) AS token FROM bmq) GROUP BY 1, 2),
        |pqm AS (SELECT query_id, token,
        |    qtf / sum(qtf) OVER (PARTITION BY query_id) AS pq FROM pqn),
        |wterms AS (SELECT coalesce(p.query_id, r.query_id) AS query_id,
        |    coalesce(p.token, r.token) AS token,
        |    round(0.5 * coalesce(p.pq, 0.0) +
        |      (1.0 - 0.5) * coalesce(r.prm, 0.0), 6) AS w
        |  FROM pqm p FULL OUTER JOIN prm r
        |    ON p.query_id = r.query_id AND p.token = r.token),
        |wsc AS (SELECT q.query_id, t.doc_id,
        |    (ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
        |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
        |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
        |        0.75 * CAST(l.dl AS DOUBLE) /
        |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) * q.w
        |      AS w2
        |  FROM bmtf t JOIN wterms q USING (token) JOIN bmdf d USING (token)
        |  JOIN bmdl l ON t.doc_id = l.doc_id CROSS JOIN bmst s),
        |wag AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit,
        |    round(sum(w2), 6) AS score FROM wsc GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_hit, score, CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
        |  FROM wag)
        |WHERE rk <= 5""".stripMargin
  }

  /** Retention replica: [[oracleSearchBm25]] with the corpus restricted
    * to the docs surviving the `% 17 == 3` removal — remove ≡
    * build-without means df, N and avgdl all derive from the survivors,
    * which is exactly what recomputing the chain over the filtered corpus
    * does. */
  def oracleSearchRetention: String = {
    val out = oracleSearchBm25.replace(
      "FROM documents WHERE doc_id % 101 <> 5),",
      "FROM documents WHERE doc_id % 101 <> 5 AND doc_id % 17 <> 3),")
    require(out != oracleSearchBm25, "retention corpus filter not spliced")
    out
  }

  /** Filtered-ANN replica: the IVF×PQ chain with the scored candidate
    * rows restricted to the allow list BEFORE ranking (filter-then-rank —
    * the [[graft.llm.AnnIndex.query]] `allowed` contract). */
  def oracleAnnFiltered: String =
    s"""$ivfPqCtes,
       |fsc AS (SELECT * FROM score WHERE neighbor_id % 3 = 1),
       |franked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rn FROM fsc)
       |SELECT query_id, neighbor_id, dist, rn FROM franked WHERE rn <= 5""".stripMargin

  /** Hybrid-RRF replica: the [[oracleSearchBm25]] CTE chain at rk ≤ 10,
    * the [[oracleAnnBrute]] cosine chain at rn ≤ 10 over the mirrored
    * embedding split, and the fusion — 1/(60+rank) terms summed lex-first
    * (the operator's coalesce order), round-6, (rrf desc, doc_id asc)
    * final ranks. */
  def oracleSearchHybrid: String =
    """WITH bmq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 5),
      |bmqt AS (SELECT DISTINCT query_id, unnest(qt) AS token FROM bmq),
      |bmc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 5),
      |bmdl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM bmc),
      |bmst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM bmdl),
      |bmocc AS (SELECT doc_id, unnest(tk) AS token FROM bmc),
      |bmtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM bmocc GROUP BY 1, 2),
      |bmdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM bmtf GROUP BY 1),
      |bmsc AS (SELECT q.query_id, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(l.dl AS DOUBLE) /
      |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS w
      |  FROM bmtf t JOIN bmqt q USING (token) JOIN bmdf d USING (token)
      |  JOIN bmdl l ON t.doc_id = l.doc_id CROSS JOIN bmst s),
      |bmag AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
      |  FROM bmsc GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, CAST(rk AS INT) AS rk_lex FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM bmag) WHERE rk <= 10),
      |aq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 101 = 5),
      |ac AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 101 <> 5),
      |pairs AS (SELECT aq.vec_id AS query_id, ac.vec_id AS neighbor_id,
      |    aq.embedding AS qe, ac.embedding AS ce
      |  FROM ac CROSS JOIN aq WHERE aq.vec_id <> ac.vec_id),
      |gi AS (SELECT unnest(range(1, 65)) AS i),
      |dots AS (SELECT query_id, neighbor_id,
      |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dot,
      |    sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS qq,
      |    sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cc
      |  FROM pairs CROSS JOIN gi GROUP BY 1, 2),
      |ascored AS (SELECT query_id, neighbor_id,
      |    round(dot / (sqrt(qq) * sqrt(cc)), 6) AS score FROM dots),
      |sem AS (SELECT query_id, neighbor_id AS doc_id, CAST(rn AS INT) AS rk_sem FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
      |  FROM ascored) WHERE rn <= 10),
      |fused AS (SELECT coalesce(l.query_id, s.query_id) AS query_id,
      |    coalesce(l.doc_id, s.doc_id) AS doc_id, l.rk_lex, s.rk_sem,
      |    round(coalesce(1.0 / (60 + l.rk_lex), 0.0) +
      |          coalesce(1.0 / (60 + s.rk_sem), 0.0), 6) AS rrf
      |  FROM lex l FULL JOIN sem s
      |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
      |SELECT query_id, doc_id, rk_lex, rk_sem, rrf, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rk
      |  FROM fused)
      |WHERE rk <= 5""".stripMargin

  /** Store-served hybrid replica: the bm25 chain on the % 101 == 97 split
    * (the store path is bit-equal to whole-corpus BM25, so the batch
    * replay stands in for the index), the IVF×PQ chain over the mirrored
    * embedding split with queries assigned SEPARATELY (they are not
    * corpus members here, unlike ann_index), both at rank ≤ 10, fused. */
  def oracleSearchHybridIndex: String =
    """WITH hq AS (SELECT doc_id AS query_id,
      |    list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5) AS qt
      |  FROM documents WHERE doc_id % 101 = 97),
      |hqt AS (SELECT DISTINCT query_id, unnest(qt) AS token FROM hq),
      |hc AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      |  FROM documents WHERE doc_id % 101 <> 97),
      |hdl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM hc),
      |hst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl FROM hdl),
      |hocc AS (SELECT doc_id, unnest(tk) AS token FROM hc),
      |htf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM hocc GROUP BY 1, 2),
      |hdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM htf GROUP BY 1),
      |hsc AS (SELECT q.query_id, t.doc_id,
      |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
      |      (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
      |      (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(l.dl AS DOUBLE) /
      |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS w
      |  FROM htf t JOIN hqt q USING (token) JOIN hdf d USING (token)
      |  JOIN hdl l ON t.doc_id = l.doc_id CROSS JOIN hst s),
      |hag AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
      |  FROM hsc GROUP BY 1, 2),
      |hlex AS (SELECT query_id, doc_id, CAST(rk AS INT) AS rk_lex FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM hag) WHERE rk <= 10),
      |hcorp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 101 <> 97),
      |hqv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 101 = 97),
      |hcents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM hcorp WHERE vec_id < 16),
      |hgi AS (SELECT unnest(range(1, 65)) AS i),
      |hacl AS (SELECT e.vec_id, c.cent_id,
      |    sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
      |      (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
      |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
      |  FROM hcorp e CROSS JOIN hcents c CROSS JOIN hgi GROUP BY 1, 2),
      |hlists AS (SELECT vec_id, cent_id FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM hacl)
      |  WHERE rk = 1),
      |hacq AS (SELECT q.vec_id, c.cent_id,
      |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)) /
      |      (sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) *
      |       sqrt(sum(CAST(c.cent_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE)))) AS csim
      |  FROM hqv q CROSS JOIN hcents c CROSS JOIN hgi GROUP BY 1, 2),
      |hprobes AS (SELECT vec_id, cent_id FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk FROM hacq)
      |  WHERE rk <= 2),
      |hsubs AS (SELECT unnest(range(0, 8)) AS sub),
      |hji AS (SELECT unnest(range(1, 9)) AS j),
      |hcbk AS (SELECT CAST(vec_id AS INT) AS code, embedding AS ce FROM hcorp WHERE vec_id < 16),
      |hcd AS (SELECT vec_id, sub, code, sum(df * df) AS d FROM (
      |    SELECT e.vec_id, s.sub, c.code,
      |      CAST(e.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
      |    FROM hcorp e CROSS JOIN hsubs s CROSS JOIN hcbk c CROSS JOIN hji j)
      |  GROUP BY 1, 2, 3),
      |hcodes AS (SELECT vec_id, sub,
      |    (min(struct_pack(d := d, code := code))).code AS code
      |  FROM hcd GROUP BY 1, 2),
      |hqd AS (SELECT query_id, sub, code, sum(df * df) AS qdist FROM (
      |    SELECT q.vec_id AS query_id, s.sub, c.code,
      |      CAST(q.embedding[s.sub * 8 + j.j] AS DOUBLE) - CAST(c.ce[s.sub * 8 + j.j] AS DOUBLE) AS df
      |    FROM hqv q CROSS JOIN hsubs s CROSS JOIN hcbk c CROSS JOIN hji j)
      |  GROUP BY 1, 2, 3),
      |hscore AS (SELECT p.vec_id AS query_id, l.vec_id AS neighbor_id,
      |    round(sum(qd.qdist), 6) AS dist
      |  FROM hlists l JOIN hprobes p ON p.cent_id = l.cent_id AND p.vec_id <> l.vec_id
      |  JOIN hcodes ON hcodes.vec_id = l.vec_id
      |  JOIN hqd qd ON qd.query_id = p.vec_id AND qd.sub = hcodes.sub AND qd.code = hcodes.code
      |  GROUP BY 1, 2),
      |hsem AS (SELECT query_id, neighbor_id AS doc_id, CAST(rn AS INT) AS rk_sem FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn FROM hscore)
      |  WHERE rn <= 10),
      |hfused AS (SELECT coalesce(l.query_id, s.query_id) AS query_id,
      |    coalesce(l.doc_id, s.doc_id) AS doc_id, l.rk_lex, s.rk_sem,
      |    round(coalesce(1.0 / (60 + l.rk_lex), 0.0) +
      |          coalesce(1.0 / (60 + s.rk_sem), 0.0), 6) AS rrf
      |  FROM hlex l FULL JOIN hsem s
      |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
      |SELECT query_id, doc_id, rk_lex, rk_sem, rrf, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rk
      |  FROM hfused)
      |WHERE rk <= 5""".stripMargin

  /** Shard-assignment replica: 48-bit md5 deal + per-shard order by
    * (key, doc_id). */
  def oracleShardAssign: String =
    """WITH sk AS (SELECT doc_id,
      |    ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 12))::BIGINT AS key
      |  FROM documents)
      |SELECT doc_id, key % 8 AS shard,
      |  CAST(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS INT) AS pos
      |FROM sk""".stripMargin

  /** Unigram-tokenizer replica: the per-word Viterbi DP UNROLLED as one
    * generated chained-CTE program — b_i holds the best (cost, np, path)
    * for every distinct word's prefix of length i, computed as the
    * struct-min over i UNION ALL branches (one per split point j), each
    * a join of b_j against the piece table on the exact substring. The
    * piece fixture re-derives the same top-20 words + dyadic costs, so
    * every cost sum is exact and the struct-min tie order (cost, np,
    * path) matches Spark's array_min field-for-field. */
  def oracleTokenizeUnigram: String = {
    val L = OracleUnrollDepth
    val charRows = graft.llm.Unigram.Chars
      .map(c => s"('$c')").mkString(", ")
    val bs = (1 to L).map { i =>
      val branches = (0 until i).map { j =>
        s"""    SELECT b.w AS w, b.cost + p.cost AS cost, b.np + 1 AS np,
           |      CASE WHEN b.np = 0 THEN p.piece
           |           ELSE b.path || ' ' || p.piece END AS path
           |    FROM b$j b JOIN pieces p ON p.piece = substr(b.w, ${j + 1}, ${i - j})
           |    WHERE len(b.w) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""b$i AS MATERIALIZED (SELECT w,
         |  (min(struct_pack(cost := cost, np := np, path := path))).cost AS cost,
         |  (min(struct_pack(cost := cost, np := np, path := path))).np AS np,
         |  (min(struct_pack(cost := cost, np := np, path := path))).path AS path
         | FROM (
         |$branches
         | ) GROUP BY w)""".stripMargin
    }.mkString(",\n")
    val segUnion = (1 to L)
      .map(i => s"SELECT $i AS i, * FROM b$i").mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
       |wox AS MATERIALIZED (SELECT doc_id, o['ord'] AS ord, o['w'] AS w FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
       |      i -> struct_pack(ord := i, w := tk[i]))) AS o FROM toks)),
       |top20 AS (SELECT w FROM (SELECT w, count(*) AS c FROM wox GROUP BY 1)
       |  ORDER BY c DESC, w ASC LIMIT 20),
       |rawp AS (SELECT piece, 4.0 AS cost FROM (VALUES $charRows) ch(piece)
       |  UNION ALL SELECT w AS piece, len(w) * 4.0 - 2.0 AS cost FROM top20),
       |pieces AS MATERIALIZED (SELECT piece, min(cost) AS cost FROM rawp GROUP BY 1),
       |words AS MATERIALIZED (SELECT DISTINCT w FROM wox),
       |b0 AS MATERIALIZED (SELECT w, 0.0 AS cost, 0 AS np, '' AS path FROM words),
       |$bs,
       |seg AS (SELECT w, np, path FROM ($segUnion) WHERE i = len(w)),
       |agg AS (SELECT wox.doc_id, CAST(sum(seg.np) AS BIGINT) AS n_pieces,
       |    string_agg(seg.path, ' ' ORDER BY wox.ord) AS segmented
       |  FROM wox JOIN seg ON wox.w = seg.w GROUP BY 1)
       |SELECT d.doc_id, coalesce(agg.n_pieces, 0) AS n_pieces,
       |  coalesce(agg.segmented, '') AS segmented
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }

  /** Greedy WordPiece replica: the same fixture derivation (top-20 +
    * halves + char alphabet) and 24 unrolled greedy steps — each step one
    * LEFT JOIN against the piece table taking the LONGEST match at the
    * current position (vs [[oracleTokenizeUnigram]]'s struct-min DP:
    * greedy keeps only ONE state per word, so the unroll is a walk, not a
    * frontier). A word with an unmatched position collapses to [UNK]. */
  def oracleTokenizeWordPiece: String = {
    val K = OracleUnrollDepth
    val charRows = graft.llm.Unigram.Chars
      .map(c => s"('$c')").mkString(", ")
    val steps = (1 to K).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT a.w, a.pos, a.np, a.path, max(p.plen) AS ml
         |  FROM (SELECT * FROM s${k - 1} WHERE pos < len(w) AND NOT failed) a
         |  LEFT JOIN pieces p
         |    ON p.cont = (a.pos > 0)
         |   AND p.plen <= len(a.w) - a.pos
         |   AND substr(a.w, a.pos + 1, p.plen) = p.raw
         |  GROUP BY 1, 2, 3, 4),
         |s$k AS MATERIALIZED (
         |  SELECT w, pos, np, path, failed FROM s${k - 1}
         |  WHERE pos >= len(w) OR failed
         |  UNION ALL
         |  SELECT w,
         |    CASE WHEN ml IS NULL THEN len(w) ELSE pos + ml END AS pos,
         |    CASE WHEN ml IS NULL THEN 1 ELSE np + 1 END AS np,
         |    CASE WHEN ml IS NULL THEN '[UNK]'
         |         ELSE path || (CASE WHEN np = 0 THEN '' ELSE ' ' END) ||
         |              (CASE WHEN pos = 0 THEN '' ELSE '##' END) ||
         |              substr(w, pos + 1, ml) END AS path,
         |    ml IS NULL AS failed
         |  FROM m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
       |wox AS MATERIALIZED (SELECT doc_id, o['ord'] AS ord, o['w'] AS w FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
       |      i -> struct_pack(ord := i, w := tk[i]))) AS o FROM toks)),
       |top20 AS (SELECT w FROM (SELECT w, count(*) AS c FROM wox GROUP BY 1)
       |  ORDER BY c DESC, w ASC LIMIT 20),
       |rawp AS (
       |  SELECT piece AS raw, 1 AS plen, false AS cont FROM (VALUES $charRows) ch(piece)
       |  UNION ALL SELECT piece, 1, true FROM (VALUES $charRows) ch2(piece)
       |  UNION ALL SELECT w, len(w), false FROM top20
       |  UNION ALL SELECT substr(w, 1, (len(w) + 1) // 2),
       |    (len(w) + 1) // 2, false FROM top20 WHERE len(w) >= 4
       |  UNION ALL SELECT substr(w, (len(w) + 1) // 2 + 1),
       |    len(w) - (len(w) + 1) // 2, true FROM top20 WHERE len(w) >= 4),
       |pieces AS MATERIALIZED (SELECT DISTINCT raw, plen, cont FROM rawp),
       |words AS MATERIALIZED (SELECT DISTINCT w FROM wox),
       |s0 AS MATERIALIZED (SELECT w, 0 AS pos, 0 AS np, '' AS path,
       |  false AS failed FROM words),
       |$steps,
       |seg AS (SELECT w, np, path FROM s$K),
       |agg AS (SELECT wox.doc_id, CAST(sum(seg.np) AS BIGINT) AS n_pieces,
       |    string_agg(seg.path, ' ' ORDER BY wox.ord) AS segmented
       |  FROM wox JOIN seg ON wox.w = seg.w GROUP BY 1)
       |SELECT d.doc_id, coalesce(agg.n_pieces, 0) AS n_pieces,
       |  coalesce(agg.segmented, '') AS segmented
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }

  /** Balanced-shard replica: DuckDB states the SPEC (one global
    * row_number over (n_tokens DESC, doc_id)); the Spark side implements
    * it as the decomposed two-phase rank — the gate proves they agree. */
  def oracleShardBalanced: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (SELECT doc_id, n_tokens, CAST(row_number() OVER (
      |    ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rk FROM t)
      |SELECT doc_id, n_tokens, (rk - 1) % 8 AS shard, ((rk - 1) // 8) + 1 AS pos
      |FROM r""".stripMargin

  /** Classifier replica: the DSIR gram/bucket CTEs with the md5-derived
    * weight fixture joined in place of the likelihood-ratio table. */
  def oracleTextClassifier: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '') AS tk FROM documents),
      |g AS (SELECT doc_id, unnest(tk) AS g FROM t
      |  UNION ALL
      |  SELECT doc_id, tk[CAST(u.i AS BIGINT)] || ' ' || tk[CAST(u.i AS BIGINT) + 1] AS g
      |  FROM t, UNNEST(range(1, len(tk))) AS u(i)),
      |bkt AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b FROM g),
      |bc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt FROM bkt GROUP BY 1, 2),
      |w AS (SELECT CAST(u.i AS BIGINT) AS b,
      |    ((('0x' || substr(md5('w:' || CAST(u.i AS BIGINT)), 1, 8))::BIGINT % 65536) - 32768) / 65536.0 AS w
      |  FROM UNNEST(range(0, 4096)) AS u(i)),
      |s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
      |    round(0.0 + sum(cnt * w) / sum(cnt), 6) AS logit6
      |  FROM bc JOIN w USING (b) GROUP BY doc_id)
      |SELECT doc_id, n_grams, logit6, logit6 > 0.0 AS keep FROM s""".stripMargin

  /** Replays [[graft.llm.Curation.trainClassifier]]'s full training run
    * in unrolled CTEs — the [[graft.llm.Bpe.oracleTrainSql]] pattern: the
    * weights are DERIVED by the SQL, not embedded, so the oracle
    * reproduces every gradient step (feature build, per-doc sigmoid
    * margins, per-bucket gradients, round-6 weight update) rather than
    * checking a frozen answer. Labels: lang = 'en' as the positive
    * class, matching the gate query. */
  def oracleClassifierTrain(iters: Int, lr: Double): String = {
    val pre =
      """WITH t AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '') AS tk FROM documents),
        |g AS (SELECT doc_id, y, unnest(tk) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id, y, tk[CAST(u.i AS BIGINT)] || ' ' || tk[CAST(u.i AS BIGINT) + 1] AS g
        |  FROM t, UNNEST(range(1, len(tk))) AS u(i)),
        |bc AS MATERIALIZED (SELECT doc_id, y, ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2, 3),
        |ng AS (SELECT doc_id, y, CAST(sum(cnt) AS BIGINT) AS n FROM bc GROUP BY 1, 2),
        |f AS MATERIALIZED (SELECT bc.doc_id, bc.y, bc.b, bc.cnt / CAST(ng.n AS DOUBLE) AS x FROM bc JOIN ng USING (doc_id)
        |  UNION ALL SELECT doc_id, y, CAST(-1 AS BIGINT) AS b, 1.0 AS x FROM ng),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ng),
        |w0 AS (SELECT DISTINCT b, 0.0 AS w FROM f)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""m$i AS (SELECT f.doc_id, f.y, 1.0 / (1.0 + exp(-sum(f.x * w.w))) AS p
         |  FROM f JOIN w$i w USING (b) GROUP BY 1, 2),
         |g$i AS (SELECT f.b, sum(f.x * (m.p - m.y)) / (SELECT n FROM nd) AS g
         |  FROM f JOIN m$i m USING (doc_id) GROUP BY 1),
         |w${i + 1} AS (SELECT w.b, round(w.w - $lr * coalesce(g.g, 0.0), 6) + 0.0 AS w
         |  FROM w$i w LEFT JOIN g$i g USING (b))""".stripMargin
    }
    s"$pre,\n${steps.mkString(",\n")}\nSELECT b, w FROM w$iters"
  }

  def oracleTextRepetition: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |b AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) AS char_total FROM t),
      |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      |  FROM t WHERE len(w) >= 2),
      |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2),
      |t2 AS (SELECT doc_id, g AS top_2gram, CAST(cnt * (length(g) - 1) AS DOUBLE) AS top2_chars FROM
      |    (SELECT doc_id, g, cnt, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn FROM c2)
      |  WHERE rn = 1),
      |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g
      |  FROM t WHERE len(w) >= 3),
      |c3 AS (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY 1, 2),
      |d3 AS (SELECT doc_id, CAST(sum(cnt * (length(g) - 2)) AS DOUBLE) AS dup3_chars FROM c3 WHERE cnt >= 2 GROUP BY 1)
      |SELECT b.doc_id, n_words,
      |  coalesce(top_2gram, '') AS top_2gram,
      |  CASE WHEN char_total = 0 THEN 0.0 ELSE round(coalesce(top2_chars, 0.0) / char_total, 6) END AS top_2gram_frac,
      |  CASE WHEN char_total = 0 THEN 0.0 ELSE round(coalesce(dup3_chars, 0.0) / char_total, 6) END AS dup_3gram_frac
      |FROM b LEFT JOIN t2 USING (doc_id) LEFT JOIN d3 USING (doc_id)""".stripMargin

  def oracleTextPii: String = {
    val (em, ip, ph, sn) =
      (TextAnalysis.EmailRe, TextAnalysis.Ipv4Re, TextAnalysis.PhoneRe, TextAnalysis.SsnRe)
    s"""WITH p AS (SELECT doc_id, $PiiInjectSql AS pt FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(pt, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(pt, '$ip')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(pt, '$ph')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(pt, '$sn')) AS BIGINT) AS n_ssn,
       |  CAST(len(regexp_extract_all(pt, '$em')) + len(regexp_extract_all(pt, '$ip')) +
       |       len(regexp_extract_all(pt, '$ph')) + len(regexp_extract_all(pt, '$sn')) AS BIGINT) AS pii_total,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(pt,
       |    '$em', '<EMAIL>', 'g'), '$sn', '<SSN>', 'g'), '$ph', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS redacted
       |FROM p""".stripMargin
  }

  /** Explicit 64-term left-associated sums (SQL `a + b + c` parses as
    * `((a+b)+c)`), matching Spark's strict-fold dot exactly — no reliance
    * on any engine's aggregate ordering. The integer `m/65536.0` literals
    * reproduce [[Ann.planeComponent]] bit-for-bit. */
  def oracleEmbedProject: String = {
    val dims = (0 until 4).map { j =>
      val terms = (0 until Ann.Dims).map { d =>
        val m = math.round(Ann.planeComponent(256 + j, d) * 65536).toInt
        s"CAST(embedding[${d + 1}] AS DOUBLE) * ($m / 65536.0)"
      }.mkString(" + ")
      s"round($terms, 6) AS p$j"
    }.mkString(", ")
    s"SELECT vec_id, $dims FROM embeddings"
  }

  /** The identical left-associated 37-term sums (DuckDB parses `a + b + c`
    * as `((a+b)+c)` too), with counts from the same literal replaces. */
  def oracleTextEntropy: String = {
    val alphabet = ('a' to 'z') ++ ('0' to '9') :+ ' '
    def cnt(ch: Char): String = {
      val lit = if (ch == '\'') "''" else ch.toString
      s"CAST(length(lt) - length(replace(lt, '$lit', '')) AS DOUBLE)"
    }
    val n = alphabet.map(cnt).mkString(" + ")
    val terms = alphabet.map { ch =>
      val c = cnt(ch)
      s"CASE WHEN $c > 0 THEN -($c / n) * ln($c / n) ELSE 0.0 END"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
       |c AS (SELECT doc_id, lt, $n AS n FROM t)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_alpha,
       |  CASE WHEN n = 0 THEN 0.0 ELSE round($terms, 6) END AS char_entropy
       |FROM c""".stripMargin
  }

  def oracleTextTypicality: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g2 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> concat_ws(' ', tk[i], tk[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks),
      |cf AS (SELECT g, count(*) AS c FROM g2 GROUP BY 1),
      |sc AS (SELECT g2.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    avg(ln(cf.c)) AS alf
      |  FROM g2 JOIN cf USING (g) GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
      |  round(coalesce(sc.alf, 0.0), 6) AS avg_ln_freq
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin

  /** The same smoothed-conditional arithmetic tree as
    * [[TextAnalysis.perplexity]]: c2+α over c1+α·V, ln, per-doc avg,
    * exp(−·), round 6 — reference counts from the lang='en' subset. */
  def oracleTextPerplexity: String =
    """WITH toks AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g2 AS (SELECT doc_id, lang, unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> concat_ws(' ', tk[i], tk[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks),
      |c1 AS (SELECT w1, count(*) AS c1 FROM (
      |    SELECT unnest(tk) AS w1 FROM toks WHERE lang = 'en') GROUP BY 1),
      |c2 AS (SELECT g, count(*) AS c2 FROM g2 WHERE lang = 'en' GROUP BY 1),
      |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
      |occ AS (SELECT g2.doc_id,
      |    ln((CAST(coalesce(c2.c2, 0) AS DOUBLE) + 1.0) /
      |       (CAST(coalesce(c1.c1, 0) AS DOUBLE) + 1.0 * v.v)) AS lnp
      |  FROM g2
      |  LEFT JOIN c2 ON g2.g = c2.g
      |  LEFT JOIN c1 ON string_split(g2.g, ' ')[1] = c1.w1
      |  CROSS JOIN v),
      |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    avg(lnp) AS alp FROM occ GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
      |  round(coalesce(exp(-sc.alp), 0.0), 6) AS ppl
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin

  /** Kneser–Ney replica: the same count tables (bigram tokens, context
    * count + distinct-successor types per w1, distinct-predecessor types
    * per w2, T = Σ continuation counts, V = unigram vocab), the same
    * interpolation with the identical association order — every count is
    * an exact integer, so only the final avg-of-logs needs round-6. */
  def oracleTextPerplexityKn: String =
    """WITH toks AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g2 AS (SELECT doc_id, lang, unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> concat_ws(' ', tk[i], tk[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks),
      |big AS (SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2, g
      |  FROM g2 WHERE lang = 'en'),
      |c2 AS (SELECT g, count(*) AS c2 FROM big GROUP BY 1),
      |ctx AS (SELECT w1, count(*) AS c1, count(DISTINCT w2) AS nfw FROM big GROUP BY 1),
      |contw AS (SELECT w2, count(DISTINCT w1) AS nprec FROM big GROUP BY 1),
      |tt AS (SELECT CAST(sum(nprec) AS DOUBLE) AS t FROM contw),
      |vv AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM (
      |    SELECT unnest(tk) AS w1 FROM toks WHERE lang = 'en')),
      |occ AS (SELECT g2.doc_id,
      |    ln(CASE WHEN ctx.c1 IS NULL
      |        THEN (CAST(coalesce(contw.nprec, 0) AS DOUBLE) + 1.0) / ((tt.t + vv.v) + 1.0)
      |        ELSE greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE) - 0.75, 0.0)
      |               / CAST(ctx.c1 AS DOUBLE)
      |             + ((0.75 * CAST(ctx.nfw AS DOUBLE)) / CAST(ctx.c1 AS DOUBLE))
      |               * ((CAST(coalesce(contw.nprec, 0) AS DOUBLE) + 1.0) / ((tt.t + vv.v) + 1.0))
      |        END) AS lnp
      |  FROM g2
      |  LEFT JOIN c2 ON g2.g = c2.g
      |  LEFT JOIN ctx ON string_split(g2.g, ' ')[1] = ctx.w1
      |  LEFT JOIN contw ON string_split(g2.g, ' ')[2] = contw.w2
      |  CROSS JOIN tt CROSS JOIN vv),
      |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    avg(lnp) AS alp FROM occ GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
      |  round(coalesce(exp(-sc.alp), 0.0), 6) AS ppl
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin

  /** mix_perplexity replica: the text_perplexity CTE chain, then the same
    * integer-arithmetic tercile cutoffs over the (lang, round-2 bin)
    * histogram — cum·3 ≥ n / cum·3 ≥ 2n, ≤ on exact round-2 doubles. */
  def oracleMixPerplexity: String =
    """WITH toks AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g2 AS (SELECT doc_id, lang, unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> concat_ws(' ', tk[i], tk[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks),
      |c1 AS (SELECT w1, count(*) AS c1 FROM (
      |    SELECT unnest(tk) AS w1 FROM toks WHERE lang = 'en') GROUP BY 1),
      |c2 AS (SELECT g, count(*) AS c2 FROM g2 WHERE lang = 'en' GROUP BY 1),
      |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
      |occ AS (SELECT g2.doc_id,
      |    ln((CAST(coalesce(c2.c2, 0) AS DOUBLE) + 1.0) /
      |       (CAST(coalesce(c1.c1, 0) AS DOUBLE) + 1.0 * v.v)) AS lnp
      |  FROM g2
      |  LEFT JOIN c2 ON g2.g = c2.g
      |  LEFT JOIN c1 ON string_split(g2.g, ' ')[1] = c1.w1
      |  CROSS JOIN v),
      |sc AS (SELECT doc_id, avg(lnp) AS alp FROM occ GROUP BY 1),
      |ppl AS (SELECT d.doc_id, d.lang,
      |    round(coalesce(exp(-sc.alp), 0.0), 6) AS ppl
      |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
      |binned AS (SELECT doc_id, lang, ppl, round(ppl, 2) AS pb FROM ppl),
      |hist AS (SELECT lang, pb, count(*) AS cnt FROM binned GROUP BY 1, 2),
      |cum AS (SELECT lang, pb,
      |    sum(cnt) OVER (PARTITION BY lang ORDER BY pb) AS cum,
      |    sum(cnt) OVER (PARTITION BY lang) AS n FROM hist),
      |thr AS (SELECT lang,
      |    min(CASE WHEN cum * 3 >= n THEN pb END) AS t1,
      |    min(CASE WHEN cum * 3 >= n * 2 THEN pb END) AS t2
      |  FROM cum GROUP BY 1)
      |SELECT b.doc_id, b.lang, b.ppl,
      |  CASE WHEN b.pb <= t.t1 THEN 'head'
      |       WHEN b.pb <= t.t2 THEN 'middle' ELSE 'tail' END AS bucket,
      |  (b.pb <= t.t2) AS keep
      |FROM binned b JOIN thr t ON b.lang = t.lang""".stripMargin

  def oracleDecontaminate: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g5 AS (SELECT DISTINCT doc_id, g FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(range(1, len(tk) - 3),
      |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks)),
      |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 20 = 7),
      |agg AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(count(CASE WHEN b.g IS NOT NULL THEN 1 END) AS BIGINT) AS n_hits
      |  FROM (SELECT doc_id, g FROM g5 WHERE doc_id % 20 <> 7) c
      |  LEFT JOIN bench b ON c.g = b.g GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams, coalesce(a.n_hits, 0) AS n_hits,
      |  coalesce(a.n_hits, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |WHERE d.doc_id % 20 <> 7""".stripMargin

  /** Bloom decontamination replica: the oracleDecontaminate gram CTEs with
    * the membership join swapped for the 4-hash / 2^18-slot bit set —
    * identical md5 bit positions, all-k-hit verdict per gram. */
  def oracleDecontaminateBloom: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g5 AS (SELECT DISTINCT doc_id, g FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(range(1, len(tk) - 3),
      |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM toks)),
      |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 20 = 7),
      |bits AS (SELECT DISTINCT ('0x' || substr(md5('bloom:' || u.j::VARCHAR || ':' || g), 1, 12))::BIGINT % 262144 AS pos
      |  FROM bench, UNNEST(range(0, 4)) AS u(j)),
      |probe AS (SELECT doc_id, g,
      |    ('0x' || substr(md5('bloom:' || u.j::VARCHAR || ':' || g), 1, 12))::BIGINT % 262144 AS pos
      |  FROM (SELECT doc_id, g FROM g5 WHERE doc_id % 20 <> 7), UNNEST(range(0, 4)) AS u(j)),
      |pg AS (SELECT doc_id, g, (count(b.pos) = 4) AS bloom_hit
      |  FROM probe p LEFT JOIN bits b ON p.pos = b.pos GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(count(CASE WHEN bloom_hit THEN 1 END) AS BIGINT) AS n_hits FROM pg GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams, coalesce(a.n_hits, 0) AS n_hits,
      |  coalesce(a.n_hits, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |WHERE d.doc_id % 20 <> 7""".stripMargin

  /** HLL replica: same 60-bit md5 hash split 10/50, trailing-zero rank via
    * bit_count, register max, exact scaled-BIGINT register sum, one final
    * division (numerator literal shared with the library). */
  def oracleSketchHll: String = {
    val num = graft.llm.Sketches.HllNumerator.toString
    s"""WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
       |h AS (SELECT lang, ('0x' || substr(md5('hll:' || token), 1, 15))::BIGINT AS h FROM tok),
       |r AS (SELECT lang, h % 1024 AS idx, h // 1024 AS w FROM h),
       |rr AS (SELECT lang, idx, CASE WHEN w = 0 THEN 51 ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM r),
       |regs AS (SELECT lang, idx, max(rho) AS mreg FROM rr GROUP BY 1, 2),
       |pg AS (SELECT lang, count(*) AS used,
       |    CAST(sum((1::BIGINT) << (51 - mreg)) AS BIGINT) AS s_used FROM regs GROUP BY 1),
       |est0 AS (SELECT lang, CAST(1024 - used AS INT) AS v_zero,
       |    s_used + (1024 - used) * 2251799813685248 AS s_scaled FROM pg),
       |est1 AS (SELECT lang, v_zero, s_scaled, $num / CAST(s_scaled AS DOUBLE) AS e_raw FROM est0),
       |est AS (SELECT lang, v_zero, s_scaled,
       |    round(CASE WHEN e_raw <= 2560.0 AND v_zero > 0
       |      THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE)) ELSE e_raw END, 6) AS est FROM est1),
       |ex AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct FROM tok GROUP BY 1)
       |SELECT est.lang, est.v_zero, est.s_scaled, est.est, ex.exact_distinct
       |FROM est JOIN ex USING (lang)""".stripMargin
  }

  /** KMV replica: the k smallest distinct 60-bit token hashes per half,
    * merged union sample via list concat + distinct + sort + truncate,
    * inclusion-ratio Jaccard — every estimate a single division of
    * integers both engines agree on exactly (the BIGINT→DOUBLE cast of a
    * >2^53 hash rounds identically under IEEE nearest). */
  def oracleSketchKmv: String = {
    val k = graft.llm.Sketches.KmvK
    val num = graft.llm.Sketches.KmvNumerator.toString
    s"""WITH tok AS (SELECT (doc_id % 2 = 0) AS ev,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
       |h AS (SELECT DISTINCT ev, ('0x' || substr(md5('kmv:' || token), 1, 15))::BIGINT AS h FROM tok),
       |ka AS (SELECT h FROM h WHERE ev ORDER BY h LIMIT $k),
       |kb AS (SELECT h FROM h WHERE NOT ev ORDER BY h LIMIT $k),
       |aa AS (SELECT list_sort(list(h)) AS ha FROM ka),
       |bb AS (SELECT list_sort(list(h)) AS hb FROM kb),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(count(*) FILTER (a AND b) AS BIGINT) AS exact_inter
       |  FROM (SELECT token, bool_or(ev) AS a, bool_or(NOT ev) AS b FROM tok GROUP BY 1)),
       |m AS (SELECT ha, hb, list_sort(list_distinct(ha || hb))[1:$k] AS us FROM aa, bb),
       |est AS (SELECT ha, hb, us,
       |    CASE WHEN len(us) < $k THEN CAST(len(us) AS DOUBLE)
       |         ELSE $num / CAST(us[$k] AS DOUBLE) END AS uest,
       |    CAST(len(list_filter(us, x -> list_contains(ha, x) AND list_contains(hb, x))) AS DOUBLE)
       |      / CAST(len(us) AS DOUBLE) AS rho
       |  FROM m)
       |SELECT CAST($k AS INT) AS k,
       |  round(CASE WHEN len(ha) < $k THEN CAST(len(ha) AS DOUBLE)
       |             ELSE $num / CAST(ha[$k] AS DOUBLE) END, 6) AS d_even,
       |  round(CASE WHEN len(hb) < $k THEN CAST(len(hb) AS DOUBLE)
       |             ELSE $num / CAST(hb[$k] AS DOUBLE) END, 6) AS d_odd,
       |  round(uest, 6) AS union_est,
       |  round(rho, 6) AS jaccard_est,
       |  round(rho * uest, 6) AS inter_est,
       |  exact_union, exact_inter
       |FROM est, ex""".stripMargin
  }

  /** KMV store replica: per-lang k smallest distinct hashes over the
    * WHOLE corpus (build+append+compact fold exactly to this). */
  def oracleSketchKmvStore: String = {
    val k = graft.llm.Sketches.KmvK
    val num = graft.llm.Sketches.KmvNumerator.toString
    s"""WITH tok AS (SELECT lang,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
       |h AS (SELECT DISTINCT lang, ('0x' || substr(md5('kmv:' || token), 1, 15))::BIGINT AS h FROM tok),
       |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rk FROM h),
       |kk AS (SELECT lang, h, rk FROM r WHERE rk <= $k)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_mins,
       |  round(CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE $num / CAST(max(CASE WHEN rk = $k THEN h END) AS DOUBLE) END, 6) AS est
       |FROM kk GROUP BY 1""".stripMargin
  }

  /** Store-lifecycle replica: the incremental merge is exact, so the
    * whole-corpus HLL estimate (minus the raw-corpus audit column the
    * store cannot produce) IS the oracle. */
  def oracleSketchStore: String = {
    val num = graft.llm.Sketches.HllNumerator.toString
    s"""WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
       |h AS (SELECT lang, ('0x' || substr(md5('hll:' || token), 1, 15))::BIGINT AS h FROM tok),
       |r AS (SELECT lang, h % 1024 AS idx, h // 1024 AS w FROM h),
       |rr AS (SELECT lang, idx, CASE WHEN w = 0 THEN 51 ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM r),
       |regs AS (SELECT lang, idx, max(rho) AS mreg FROM rr GROUP BY 1, 2),
       |pg AS (SELECT lang, count(*) AS used,
       |    CAST(sum((1::BIGINT) << (51 - mreg)) AS BIGINT) AS s_used FROM regs GROUP BY 1),
       |est0 AS (SELECT lang, CAST(1024 - used AS INT) AS v_zero,
       |    s_used + (1024 - used) * 2251799813685248 AS s_scaled FROM pg),
       |est1 AS (SELECT lang, v_zero, s_scaled, $num / CAST(s_scaled AS DOUBLE) AS e_raw FROM est0)
       |SELECT lang, v_zero, s_scaled,
       |  round(CASE WHEN e_raw <= 2560.0 AND v_zero > 0
       |    THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE)) ELSE e_raw END, 6) AS est FROM est1""".stripMargin
  }

  /** CMS replica: 4×1024 counter grid straight off the token stream, true
    * top-20 by (cnt desc, token), estimate = min over the 4 salted cells. */
  def oracleSketchCms: String =
    """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
      |grid AS (SELECT j, c, CAST(count(*) AS BIGINT) AS cnt FROM (
      |  SELECT u.j AS j, ('0x' || substr(md5('cms:' || u.j::VARCHAR || ':' || token), 1, 12))::BIGINT % 1024 AS c
      |  FROM tok, UNNEST(range(0, 4)) AS u(j)) GROUP BY 1, 2),
      |truth AS (SELECT token, CAST(count(*) AS BIGINT) AS true_cnt FROM tok GROUP BY 1),
      |top AS (SELECT token, true_cnt FROM (
      |  SELECT *, row_number() OVER (ORDER BY true_cnt DESC, token ASC) AS rk FROM truth) WHERE rk <= 20),
      |probe AS (SELECT t.token, t.true_cnt, u.j AS j,
      |    ('0x' || substr(md5('cms:' || u.j::VARCHAR || ':' || t.token), 1, 12))::BIGINT % 1024 AS c
      |  FROM top t, UNNEST(range(0, 4)) AS u(j))
      |SELECT p.token, max(p.true_cnt) AS true_cnt, min(g.cnt) AS est_cnt
      |FROM probe p JOIN grid g ON p.j = g.j AND p.c = g.c GROUP BY 1""".stripMargin

  /** Quantile-sketch replica: identical string-arithmetic 2-digit binning,
    * integer cumulative cutoffs (cum·100 ≥ q·n). */
  def oracleSketchQuantile: String =
    """WITH b AS (SELECT source,
      |    CAST(concat(substring(CAST(n_chars AS VARCHAR), 1, 2),
      |      repeat('0', greatest(length(CAST(n_chars AS VARCHAR)) - 2, 0))) AS BIGINT) AS bin
      |  FROM documents),
      |bins AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
      |cum AS (SELECT source, bin,
      |    sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
      |    sum(cnt) OVER (PARTITION BY source) AS n FROM bins)
      |SELECT source, CAST(max(n) AS BIGINT) AS n,
      |  min(CASE WHEN cum * 100 >= 50 * n THEN bin END) AS p50,
      |  min(CASE WHEN cum * 100 >= 90 * n THEN bin END) AS p90,
      |  min(CASE WHEN cum * 100 >= 99 * n THEN bin END) AS p99
      |FROM cum GROUP BY 1""".stripMargin

  def oracleDedupSpans: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |ch AS (
      |  SELECT doc_id, CAST(u.c AS BIGINT) AS cidx,
      |    array_to_string(tk[(CAST(u.c AS BIGINT) * 15 + 1):(CAST(u.c AS BIGINT) * 15 + 15)], ' ') AS chunk
      |  FROM toks, UNNEST(range(0, greatest(CAST(ceil(len(tk) / 15.0) AS BIGINT), 1))) AS u(c)
      |),
      |nz AS (SELECT * FROM ch WHERE chunk <> ''),
      |rn AS (SELECT doc_id, cidx,
      |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS r FROM nz),
      |spans AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM nz GROUP BY 1),
      |kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept FROM rn WHERE r = 1 GROUP BY 1)
      |SELECT d.doc_id, coalesce(s.n_spans, 0) AS n_spans, coalesce(k.n_kept, 0) AS n_kept,
      |  CASE WHEN coalesce(s.n_spans, 0) = 0 THEN 1.0
      |       ELSE round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / CAST(s.n_spans AS DOUBLE), 6) END AS kept_frac
      |FROM documents d
      |LEFT JOIN spans s ON d.doc_id = s.doc_id
      |LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin

  /** Exact-substring dedup replica: sliding 15-gram per position, 60-bit
    * md5-prefix hash (the Dedup.md5Hash60 convention), first occurrence
    * by (doc_id, p) wins, later occurrences run-length merged per doc
    * with a lag window — coverage `min(15, p - prev_p)` new tokens. */
  def oracleDedupSubstr: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(u.p AS BIGINT) AS p,
      |    ('0x' || substr(md5(array_to_string(tk[(CAST(u.p AS BIGINT) + 1):(CAST(u.p AS BIGINT) + 15)], ' ')), 1, 15))::BIGINT AS h
      |  FROM toks, UNNEST(range(0, greatest(len(tk) - 14, 0))) AS u(p)
      |),
      |rn AS (SELECT doc_id, p, row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS r FROM g),
      |hits AS (SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
      |  FROM rn WHERE r > 1),
      |cov AS (SELECT doc_id,
      |    CAST(sum(CASE WHEN pp IS NULL THEN 15 ELSE least(15, p - pp) END) AS BIGINT) AS dup_tok
      |  FROM hits GROUP BY 1),
      |n AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok FROM toks)
      |SELECT n.doc_id, n.n_tok, coalesce(c.dup_tok, 0) AS dup_tok,
      |  CASE WHEN n.n_tok = 0 THEN 1.0
      |       ELSE round(1.0 - CAST(coalesce(c.dup_tok, 0) AS DOUBLE) / CAST(n.n_tok AS DOUBLE), 6) END AS kept_frac
      |FROM n LEFT JOIN cov c ON n.doc_id = c.doc_id""".stripMargin

  /** The persistent-index run IS the whole-corpus run restricted to the
    * probe half: a batch position is duplicated iff its gram occurs in
    * the (older) index or earlier within the batch — exactly the
    * whole-corpus first-occurrence rule, doc_id-split. So the oracle is
    * [[oracleDedupSubstr]] with the output filtered to the probe docs. */
  def oracleDedupSubstrIncremental: String =
    oracleDedupSubstr +
      "\nWHERE n.doc_id > (SELECT max(doc_id) // 2 FROM documents)"

  /** The shared tokenization CTE body of [[oraclePackBlocks]] — also the
    * whole oracle of the `pack_tok` isolation probe (VERDICT r9 item 1:
    * localize the driver-only pack_blocks hash skew to tokenization vs
    * window arithmetic with one driver run). */
  def oraclePackTok: String =
    """SELECT doc_id,
      |    CAST(len(list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS tok FROM documents""".stripMargin

  /** The packing oracle is the ONE global window the Spark side avoids
    * via the bucketed two-phase prefix sum.
    *
    * Every output column is explicitly CAST to BIGINT: DuckDB's `sum`
    * over BIGINT yields HUGEINT (int128), so an un-cast `off` (and the
    * `off % 512` derived from it) ships as a decimal128 arrow column —
    * identical VALUES to Spark's int64 but a different physical type,
    * which a value-hash taken over the raw arrow buffers will miss while
    * rows and names still "match". This is the only gate oracle that ever
    * OUTPUT an un-cast windowed sum — prime suspect for the hash-only
    * driver-red that was locally unreproducible in r8/r9. */
  def oraclePackBlocks: String =
    s"""WITH t AS ($oraclePackTok),
       |c AS (SELECT doc_id, tok,
       |    CAST(coalesce(sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM t)
       |SELECT doc_id, tok, off,
       |  CAST(floor(off / 512.0) AS BIGINT) AS first_block,
       |  CAST(greatest(floor((off + tok - 1) / 512.0), floor(off / 512.0)) AS BIGINT) AS last_block,
       |  CAST(off % 512 AS BIGINT) AS block_offset
       |FROM c""".stripMargin

  /** Temperature-mix replica: per-source token mass, q_s ∝ m^alpha, keep
    * when the doc's 24-bit md5 draw falls under the rounded rate. */
  def oracleMixTemperature: String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS tok,
       |    (('0x' || substr(md5(text), 1, 8))::BIGINT % 16777216) / 16777216.0 AS draw
       |  FROM documents),
       |m AS (SELECT source, sum(tok) AS mass FROM t GROUP BY 1),
       |q AS (SELECT source, mass, pow(CAST(mass AS DOUBLE), 0.5) AS p FROM m),
       |r AS (SELECT source,
       |    round(least(1.0, 20000.0 * (p / (SELECT sum(p) FROM q)) / CAST(mass AS DOUBLE)), 9) AS rate9
       |  FROM q)
       |SELECT t.source, t.doc_id, t.tok, r.rate9
       |FROM t JOIN r USING (source) WHERE t.draw < r.rate9""".stripMargin

  /** Span-corruption replica: UNNEST chunking (the dedup_spans house
    * style), a per-doc running count for sentinel ranks, ordered
    * string_agg assembly. */
  def oracleSpanCorrupt: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '') AS tk FROM documents),
      |ch AS (SELECT doc_id, CAST(u.c AS BIGINT) AS c,
      |    array_to_string(tk[(CAST(u.c AS BIGINT) * 3 + 1):(CAST(u.c AS BIGINT) * 3 + 3)], ' ') AS txt,
      |    (CAST(u.c AS BIGINT) + doc_id) % 7 = 0 AS m
      |  FROM t, UNNEST(range(0, CAST(ceil(len(tk) / 3.0) AS BIGINT))) AS u(c)),
      |k AS (SELECT *, coalesce(sum(CASE WHEN m THEN 1 ELSE 0 END) OVER (
      |    PARTITION BY doc_id ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kk FROM ch)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
      |  string_agg(CASE WHEN m THEN '<X_' || CAST(kk AS VARCHAR) || '>' ELSE txt END, ' ' ORDER BY c) AS input_text,
      |  coalesce(string_agg(CASE WHEN m THEN '<X_' || CAST(kk AS VARCHAR) || '> ' || txt END, ' ' ORDER BY c), '') AS target_text
      |FROM k GROUP BY doc_id""".stripMargin

  /** Sliding-window chunking replica: UNNEST(range) window starts, list
    * slicing for the window text (DuckDB's l[a:b] is 1-based inclusive =
    * Spark's slice(l, a, len) with b = a + len - 1). */
  def oracleChunkOverlap: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t WHERE len(tk) > 0),
      |c AS (SELECT doc_id, tk, n, CAST(u.c AS BIGINT) AS chunk_id
      |  FROM n, UNNEST(range(0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT) + 1)) AS u(c))
      |SELECT doc_id, chunk_id,
      |  least(CAST(64 AS BIGINT), n - chunk_id * 48) AS n_tok,
      |  array_to_string(tk[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ') AS chunk_text
      |FROM c""".stripMargin

  /** CDC replica: the same 48-bit md5 boundary test per char position
    * (DuckDB range(a, b) is [a, b) = Spark sequence(a, b−1)), chunk spans
    * rebuilt from the boundary list, md5 over the same UTF-8 substring
    * bytes. One corrupted boundary anywhere in the corpus hash-fails. */
  def oracleChunkCdc: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0),
      |b AS (SELECT doc_id, text, n,
      |    list_filter(range(16, greatest(n, 16)),
      |      p -> ('0x' || substr(md5('cdc:' || substr(text, CAST(p - 15 AS INT), 16)), 1, 12))::BIGINT % 64 = 0) AS bounds
      |  FROM d),
      |c AS (SELECT doc_id, text, n, bounds, u.i AS i
      |  FROM b, UNNEST(range(1, len(bounds) + 2)) AS u(i)),
      |s AS (SELECT doc_id, text, n, bounds, i,
      |    CASE WHEN i = 1 THEN 1 ELSE bounds[CAST(i - 1 AS INT)] + 1 END AS st,
      |    CASE WHEN i = len(bounds) + 1 THEN n ELSE bounds[CAST(i AS INT)] END AS en
      |  FROM c)
      |SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
      |  CAST(st AS BIGINT) AS start,
      |  CAST(en - st + 1 AS BIGINT) AS chunk_len,
      |  md5(substr(text, CAST(st AS INT), CAST(en - st + 1 AS INT))) AS chunk_hash
      |FROM s""".stripMargin

  /** DSIR replica: unigrams+bigrams → md5 hash buckets, one bucket-count
    * aggregate for both distributions, λ joined back per gram occurrence.
    * Same round(…, 6) as the Spark side so float-sum order is off the
    * gate. */
  def oracleDsirWeight: String =
    """WITH t AS (SELECT doc_id, lang = 'en' AS tgt, list_filter(string_split(replace(replace(replace(text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '') AS tk FROM documents),
      |g AS (SELECT doc_id, tgt, unnest(tk) AS g FROM t
      |  UNION ALL
      |  SELECT doc_id, tgt, tk[CAST(u.i AS BIGINT)] || ' ' || tk[CAST(u.i AS BIGINT) + 1] AS g
      |  FROM t, UNNEST(range(1, len(tk))) AS u(i)),
      |bkt AS (SELECT doc_id, tgt, ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b FROM g),
      |bc AS (SELECT doc_id, tgt, b, CAST(count(*) AS BIGINT) AS cnt FROM bkt GROUP BY 1, 2, 3),
      |c AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cr,
      |    CAST(sum(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS ct
      |  FROM bc GROUP BY 1),
      |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM c),
      |lam AS (SELECT b, ln((ct + 1.0) / (tt + 4096.0)) - ln((cr + 1.0) / (tr + 4096.0)) AS lam
      |  FROM c, tot)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams, round(sum(cnt * lam), 6) AS w6
      |FROM bc JOIN lam USING (b) GROUP BY doc_id""".stripMargin

  def oracleSampleStratified: String =
    """WITH b AS (SELECT doc_id, lang,
      |    ('0x' || substr(md5(text), 1, 6))::BIGINT % 100 AS bucket FROM documents)
      |SELECT doc_id, lang AS stratum, bucket FROM b
      |WHERE bucket < CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50
      |  WHEN 'es' THEN 40 WHEN 'zh' THEN 20 ELSE 30 END""".stripMargin

  /** A-ES replica: the same dyadic uniform (48 md5 bits + 0.5, over 2^48),
    * the same pow/rounding, top-100 by (skey desc, doc_id). */
  def oracleSampleWeighted: String =
    """SELECT doc_id, weight, skey FROM (
      |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
      |    CASE WHEN n_chars > 0 THEN
      |      round(pow((('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)),
      |          1, 12))::BIGINT + 0.5) / 281474976710656.0,
      |        1.0 / CAST(n_chars AS DOUBLE)), 9)
      |    ELSE 0.0 END AS skey
      |  FROM documents)
      |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin

  /** The oracle states the mixing semantics as the ONE window the Spark
    * side deliberately avoids (see [[graft.llm.Curation.mixByBudget]]):
    * per-source running token sum in (quality DESC, doc_id) order, keep
    * while ≤ budget. */
  def oracleMixBudget: String =
    s"""SELECT source, doc_id, tok FROM (
       |  SELECT source, doc_id, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY p DESC, doc_id) AS cum
       |  FROM (
       |    SELECT d.source, d.doc_id,
       |      CAST(len(list_filter(string_split(replace(replace(replace(d.text, chr(9), ' '), chr(10), ' '), chr(13), ' '), ' '), t -> t <> '')) AS BIGINT) AS tok,
       |      q.quality_score AS p
       |    FROM documents d JOIN ($oracleTextQuality) q ON d.doc_id = q.doc_id))
       |WHERE cum <= 800""".stripMargin

  /** winnowPairs replica: the text_fingerprint winnowing chain feeds the
    * dedup_ngram-style inverted-index pair join, df-capped, containment
    * overlap round-6. */
  def oracleDedupWinnow: String =
    s"""WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
       |g AS (SELECT doc_id,
       |    list_transform(range(1, greatest(length(t) - 7, 1) + 1), i -> substr(t, i, 8)) AS gs FROM t),
       |h AS (SELECT doc_id, list_transform(gs, x -> ${md5Big.format("x")}) AS hs FROM g),
       |w AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
       |    j -> list_aggregate(list_slice(hs, j, j + 3), 'min'))) AS fps FROM h),
       |fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
       |dfc AS (SELECT fp, count(*) AS c FROM fp GROUP BY 1),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM fp GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  JOIN dfc ON dfc.fp = a.fp AND dfc.c BETWEEN 2 AND 200
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 2)
       |SELECT p.doc_a, p.doc_b, p.shared,
       |  round(CAST(p.shared AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS overlap
       |FROM pairs p
       |JOIN sizes sa ON sa.doc_id = p.doc_a
       |JOIN sizes sb ON sb.doc_id = p.doc_b
       |WHERE round(CAST(p.shared AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) >= 0.5""".stripMargin

  def oracleTextFingerprint: String =
    s"""WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
       |g AS (SELECT doc_id,
       |    list_transform(range(1, greatest(length(t) - 7, 1) + 1), i -> substr(t, i, 8)) AS gs FROM t),
       |h AS (SELECT doc_id, list_transform(gs, x -> ${md5Big.format("x")}) AS hs FROM g),
       |w AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
       |    j -> list_aggregate(list_slice(hs, j, j + 3), 'min'))) AS fps FROM h)
       |SELECT doc_id, unnest(fps) AS fp FROM w""".stripMargin

  def oracleCorpusCurate: String = {
    val m = TextAnalysis.Stopwords
    val allStops = m.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       |    CAST(len(list_filter(tk, x -> list_contains(${sqlList(allStops)}, x))) AS BIGINT) AS n_stop
       |  FROM t),
       |r AS (SELECT doc_id, n_words,
       |    CASE WHEN n_chars = 0 THEN 0.0
       |         ELSE round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS punct_ratio,
       |    CASE WHEN n_words = 0 THEN 0.0
       |         ELSE round(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS stop_ratio
       |  FROM c),
       |qual AS (SELECT doc_id, n_words,
       |    round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |          stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score FROM r),
       |h AS (SELECT doc_id,
       |  len(list_filter(tk, x -> list_contains(${sqlList(m("en"))}, x))) AS en_hits,
       |  len(list_filter(tk, x -> list_contains(${sqlList(m("de"))}, x))) AS de_hits,
       |  len(list_filter(tk, x -> list_contains(${sqlList(m("fr"))}, x))) AS fr_hits,
       |  len(list_filter(tk, x -> list_contains(${sqlList(m("es"))}, x))) AS es_hits
       |  FROM t),
       |langp AS (SELECT doc_id,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS pred_lang FROM h),
       |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(lower(trim(text))))
       |SELECT d.doc_id, d.lang, p.pred_lang,
       |  CAST(p.pred_lang = d.lang AS INT) AS lang_match, q.n_words, q.quality_score
       |FROM documents d
       |JOIN keep k ON d.doc_id = k.doc_id
       |JOIN qual q ON d.doc_id = q.doc_id
       |JOIN langp p ON d.doc_id = p.doc_id
       |WHERE q.quality_score >= 0.5 AND q.n_words >= 20""".stripMargin
  }

  /** Injected-image hex payloads for the dedup_media gate, generated for
    * BOTH engines from one definition so they cannot drift. Per 50-doc
    * block b: residues 11 and 31 carry the IDENTICAL synthetic PNG
    * (valid signature + IHDR, 100×200×8-bit, aperiodic 480-byte body
    * from 30 chained md5 segments) — an exact-duplicate pair; residue
    * 41 carries the SAME image re-encoded at 16-bit depth (one IHDR
    * byte differs) — a near-duplicate; everyone else keeps their
    * text-derived payload. */
  private val PngSig = "89504E470D0A1A0A" + "0000000D" + "49484452" +
    "00000064" + "000000C8"
  private val PngTail = "02000000" + "DEADBEEF"
  private def pngHdr(bitDepth: String): String = PngSig + bitDepth + PngTail
  private def mediaBodySpark: String =
    (0 until 30).map(j =>
      s"upper(md5(concat('img:', cast(doc_id div 50 as string), ':$j')))")
      .mkString("concat(", ", ", ")")
  private def mediaBodyDuck: String =
    (0 until 30).map(j =>
      s"upper(md5('img:' || (doc_id // 50)::VARCHAR || ':$j'))")
      .mkString(" || ")
  private[queries] def mediaInjectSpark: String =
    s"""unhex(CASE
       | WHEN doc_id % 50 IN (11, 31) THEN concat('${pngHdr("08")}', $mediaBodySpark)
       | WHEN doc_id % 50 = 41 THEN concat('${pngHdr("10")}', $mediaBodySpark)
       | ELSE hex(cast(text as binary)) END)""".stripMargin
  private def mediaInjectDuckHex: String =
    s"""CASE
       | WHEN doc_id % 50 IN (11, 31) THEN '${pngHdr("08")}' || $mediaBodyDuck
       | WHEN doc_id % 50 = 41 THEN '${pngHdr("10")}' || $mediaBodyDuck
       | ELSE hex(encode(text)) END""".stripMargin

  def oracleDedupMedia: String =
    s"""WITH pay AS (SELECT doc_id, $mediaInjectDuckHex AS hx FROM documents),
       |shd AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, (length(hx) - 16) // 2 + 1, 4),
       |    k -> substr(hx, 1 + 2 * CAST(k AS INT), 16))) AS s
       |  FROM pay WHERE length(hx) >= 16)),
       |th AS (SELECT doc_id, ${md5Big.format("s")} AS h FROM shd),
       |bits AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
       |         FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j) GROUP BY 1, 2),
       |fp AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
       |       FROM bits GROUP BY 1),
       |banded AS (SELECT doc_id, fp, b.b AS band, (fp >> (b.b * 15)) & 32767 AS bkey
       |           FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
       |bsz AS (SELECT band, bkey FROM banded GROUP BY band, bkey HAVING count(*) <= 10000),
       |bf AS (SELECT banded.* FROM banded JOIN bsz USING (band, bkey)),
       |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |  FROM bf a JOIN bf b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= 8),
       |ph AS (SELECT doc_id, hx, least(length(hx) // 2, 64) AS n FROM pay),
       |dims AS (SELECT unnest(range(0, 8)) AS dim),
       |hcnt AS (SELECT doc_id, ('0x' || substr(hx, CAST(i AS INT) * 2 + 1, 2))::INT % 8 AS dim, count(*) AS c
       |  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM ph) GROUP BY 1, 2),
       |hv AS (SELECT p.doc_id, d.dim, CAST(coalesce(c.c, 0) AS DOUBLE) / greatest(p.n, 1) AS f
       |  FROM ph p CROSS JOIN dims d LEFT JOIN hcnt c ON c.doc_id = p.doc_id AND c.dim = d.dim),
       |dots AS (SELECT pr.doc_a, pr.doc_b, pr.hamming,
       |    sum(a.f * b.f) AS dot, sum(a.f * a.f) AS aa, sum(b.f * b.f) AS bb
       |  FROM prs pr JOIN hv a ON a.doc_id = pr.doc_a
       |  JOIN hv b ON b.doc_id = pr.doc_b AND b.dim = a.dim
       |  GROUP BY 1, 2, 3)
       |SELECT doc_a, doc_b, hamming, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS feat_cos
       |FROM dots""".stripMargin

  def oracleMultimodalMeta: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CAST(ascii(text) AS BIGINT) AS first_cp,
      |  substr(md5(text), 1, 16) AS md5_prefix,
      |  CAST((octet_length(encode(text)) * 7) % 640 + 16 AS BIGINT) AS fake_width
      |FROM documents""".stripMargin


  /** Re-derives FakeCodec's byte histogram in SQL: UTF-8 payload bytes via
    * hex(), bin = byte % 8 over the first 64 bytes, normalized. */
  def oracleMultimodalFeatures: String =
    """WITH p AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |         least(octet_length(encode(text)), 64) AS n
      |  FROM documents),
      |dims AS (SELECT unnest(range(0, 8)) AS dim),
      |cnt AS (
      |  SELECT doc_id, ('0x' || substr(hx, CAST(i AS INT) * 2 + 1, 2))::INT % 8 AS dim, count(*) AS c
      |  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM p)
      |  GROUP BY 1, 2)
      |SELECT p.doc_id AS doc_id, d.dim AS dim,
      |  round(CAST(coalesce(c.c, 0) AS DOUBLE) / greatest(p.n, 1), 6) AS feature
      |FROM p CROSS JOIN dims d LEFT JOIN cnt c ON c.doc_id = p.doc_id AND c.dim = d.dim""".stripMargin


  /** Recursive min-reachable-doc_id over the same minhash pair graph. */
  /** Shared minhash→LSH→verified-pairs→connected-components CTE chain
    * (the dedup_minhash parameters); terminal relation `clu` =
    * (doc_id, cluster). Used by dedup_clusters and dedup_keep_best. */
  private def clusterCtes: String =
    s"""$gramsCte,
       |seeds AS (SELECT unnest(range(0, 12)) AS seed),
       |mh AS (SELECT doc_id, seed, min(${md5Big.format("seed::VARCHAR || ':' || g")}) AS mh
       |       FROM grams CROSS JOIN seeds GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
       |banded AS (
       |  SELECT doc_id, b.b AS band,
       |    md5(array_to_string(list_transform(list_slice(sig, b.b * 3 + 1, b.b * 3 + 3), x -> x::VARCHAR), ',')) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
       |-- replicate the operator's maxBucket skew guard (minhashLsh drops
       |-- degenerate (band, bkey) buckets instead of exploding them)
       |bsz AS (SELECT band, bkey FROM banded GROUP BY band, bkey HAVING count(*) <= 10000),
       |bf AS (SELECT banded.* FROM banded JOIN bsz USING (band, bkey)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bf a JOIN bf b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |co AS (SELECT c.doc_a, c.doc_b, count(*) AS common
       |       FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a JOIN grams gb ON gb.doc_id = c.doc_b AND ga.g = gb.g
       |       GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT co.doc_a, co.doc_b,
       |      round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
       |    FROM co JOIN sizes sa ON co.doc_a = sa.doc_id JOIN sizes sb ON co.doc_b = sb.doc_id)
       |  WHERE jaccard >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc_id, r) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id
       |),
       |clu AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id)""".stripMargin

  def oracleDedupClusters: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT doc_id, cluster FROM clu""".stripMargin

  /** Leakage-safe split replica: the cluster CTE chain + the 48-bit md5
    * cluster deal. Cut points are computed by the SAME Scala arithmetic
    * as the operator (normalized cumulative sums) and embedded at full
    * precision, so the two engines compare u against bit-identical
    * thresholds. */
  def oracleSplitLeakage: String = {
    val fr = Seq(("train", 0.9), ("val", 0.05), ("test", 0.05))
    val tot = fr.map(_._2).sum
    val cuts = fr.map(_._2 / tot).scanLeft(0.0)(_ + _).tail
    val cases = fr.init.zip(cuts.init).map { case ((n, _), c) =>
      s"WHEN u < ${java.lang.Double.toString(c)} THEN '$n'"
    }.mkString(" ")
    s"""WITH RECURSIVE $clusterCtes,
       |spk AS (SELECT doc_id, cluster,
       |    ('0x' || substr(md5('split:' || cluster::VARCHAR), 1, 12))::BIGINT
       |      / 281474976710656.0 AS u
       |  FROM clu)
       |SELECT doc_id, cluster,
       |  CASE $cases ELSE '${fr.last._1}' END AS split
       |FROM spk""".stripMargin
  }

  /** Keep-best replica: the cluster chain + the text_quality score CTEs +
    * a per-cluster argmax by (quality_score desc, doc_id asc). */
  def oracleDedupKeepBest: String = {
    val allStops = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH RECURSIVE $clusterCtes,
       |kbc AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       |    CAST(len(list_filter(tk, x -> list_contains(${sqlList(allStops)}, x))) AS BIGINT) AS n_stop
       |  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents)),
       |kbq AS (SELECT doc_id,
       |    round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |          (CASE WHEN n_words = 0 THEN 0.0
       |                ELSE round(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END) * 0.3 +
       |          (1.0 - CASE WHEN n_chars = 0 THEN 0.0
       |                      ELSE round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END) * 0.2, 6)
       |      AS quality_score
       |  FROM kbc),
       |kbj AS (SELECT clu.doc_id, clu.cluster, kbq.quality_score
       |  FROM clu JOIN kbq USING (doc_id)),
       |kbw AS (SELECT cluster, doc_id AS kept_id FROM (
       |    SELECT cluster, doc_id, row_number() OVER (
       |        PARTITION BY cluster ORDER BY quality_score DESC, doc_id ASC) AS rn
       |    FROM kbj)
       |  WHERE rn = 1)
       |SELECT kbj.doc_id, kbj.cluster, kbj.quality_score, kbw.kept_id,
       |  (kbj.doc_id = kbw.kept_id) AS keep
       |FROM kbj JOIN kbw USING (cluster)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_winnow" -> (dedupWinnow _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_clusters" -> (dedupClusters _),
    "split_leakage" -> (splitLeakageQ _),
    "dedup_keep_best" -> (dedupKeepBestQ _),
    "dedup_embed" -> (dedupEmbed _),
    "dedup_semdedup" -> (dedupSemdedupQ _),
    "dedup_semdedup_incremental" -> (dedupSemdedupIncrementalQ _),
    "dedup_incremental" -> (dedupIncrementalQ _),
    "dedup_allpairs" -> (dedupAllpairsQ _),
    "dedup_editdist" -> (dedupEditdistQ _),
    "merge_upsert" -> (mergeUpsertQ _),
    "dedup_editdist_lookup" -> (dedupEditdistLookupQ _),
    "text_collocations" -> (textCollocationsQ _),
    "text_nfc" -> (textNfcQ _),
    "ann_brute" -> (annBrute _),
    "ann_mmr" -> (annMmr _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_sq" -> (annSq _),
    "ann_sign" -> (annSign _),
    "ann_sign_mih" -> (annSignMih _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_index" -> (annIndex _),
    "ann_ivfpq_rr" -> (annIvfPqRr _),
    "decontaminate_embed" -> (decontaminateEmbedQ _),
    "text_lang" -> (textLang _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_tokens_bpe" -> (textTokensBpe _),
    "tokenize_unigram" -> (tokenizeUnigramQ _),
    "tokenize_wordpiece" -> (tokenizeWordPieceQ _),
    "tokenize_raw_unigram" -> (tokenizeRawUnigramQ _),
    "tokenize_raw_wordpiece" -> (tokenizeRawWordPieceQ _),
    "bpe_raw" -> (bpeRawQ _),
    "tokenizer_store" -> (tokenizerStoreQ _),
    "text_extract_html" -> (textExtractHtmlQ _),
    "warc_parse" -> (warcParseQ _),
    "extract_links" -> (extractLinksQ _),
    "link_pagerank" -> (linkPagerankQ _),
    "link_prior" -> (linkPriorQ _),
    "robots_filter" -> (robotsFilterQ _),
    "link_harmonic" -> (linkHarmonicQ _),
    "tokenize_fertility" -> (tokenizeFertilityQ _),
    "bpe_train" -> (bpeTrainQ _),
    "bpe_roundtrip" -> (bpeRoundtripQ _),
    "vocab_build" -> (vocabBuildQ _),
    "search_bm25" -> (searchBm25Q _),
    "search_ql" -> (searchQlQ _),
    "search_bm25f" -> (searchBm25fQ _),
    "search_sdm" -> (searchSdmQ _),
    "search_rm3" -> (searchRm3Q _),
    "search_rm3_index" -> (searchRm3IndexQ _),
    "search_ql_index" -> (searchQlIndexQ _),
    "search_sdm_index" -> (searchSdmIndexQ _),
    "search_hybrid" -> (searchHybridQ _),
    "mine_negatives" -> (mineNegativesQ _),
    "search_hybrid_index" -> (searchHybridIndexQ _),
    "search_index" -> (searchIndexQ _),
    "search_retention" -> (searchRetentionQ _),
    "ann_filtered" -> (annFilteredQ _),
    "text_tfidf" -> (textTfidfQ _),
    "decontaminate_bloom" -> (decontaminateBloomQ _),
    "sketch_hll" -> (sketchHllQ _),
    "sketch_kmv" -> (sketchKmvQ _),
    "sketch_kmv_store" -> (sketchKmvStoreQ _),
    "sketch_cms" -> (sketchCmsQ _),
    "sketch_quantile" -> (sketchQuantileQ _),
    "sketch_store" -> (sketchStoreQ _),
    "shard_assign" -> (shardAssignQ _),
    "shard_balanced" -> (shardBalancedQ _),
    "text_classifier" -> (textClassifier _),
    "classifier_train" -> (classifierTrainQ _),
    "text_fingerprint" -> (textFingerprint _),
    "text_gopher" -> (textGopher _),
    "text_repetition" -> (textRepetition _),
    "text_entropy" -> (textEntropy _),
    "text_typicality" -> (textTypicality _),
    "text_perplexity" -> (textPerplexity _),
    "text_perplexity_kn" -> (textPerplexityKn _),
    "text_pii" -> (textPii _),
    "text_blocklist" -> (textBlocklistQ _),
    "embed_project" -> (embedProject _),
    "embed_pca" -> (embedPcaQ _),
    "decontaminate" -> (decontaminateQ _),
    "sample_stratified" -> (sampleStratifiedQ _),
    "sample_weighted" -> (sampleWeightedQ _),
    "mix_budget" -> (mixBudgetQ _),
    "mix_temperature" -> (mixTemperatureQ _),
    "mix_cluster" -> (mixClusterQ _),
    "mix_perplexity" -> (mixPerplexityQ _),
    "span_corrupt" -> (spanCorruptQ _),
    "chunk_overlap" -> (chunkOverlapQ _),
    "chunk_cdc" -> (chunkCdcQ _),
    "dsir_weight" -> (dsirWeightQ _),
    "dedup_spans" -> (dedupSpansQ _),
    "dedup_substr" -> (dedupSubstrQ _),
    "dedup_substr_incremental" -> (dedupSubstrIncrementalQ _),
    "pack_blocks" -> (packBlocksQ _),
    "pack_ffd" -> (packFfdQ _),
    "dedup_domain" -> (dedupDomainQ _),
    "dedup_domain_psl" -> (dedupDomainPslQ _),
    "text_boilerplate" -> (textBoilerplateQ _),
    "pack_tok" -> (packTokQ _),
    "corpus_curate" -> (corpusCurate _),
    "dedup_media" -> (dedupMediaQ _),
    "multimodal_meta" -> (multimodalMeta _),
    "media_frames" -> (mediaFramesQ _),
    "media_resize" -> (mediaResizeQ _),
    "multimodal_features" -> (multimodalFeatures _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> oracleDedupExact,
    "dedup_ngram" -> oracleDedupNgram,
    "dedup_winnow" -> oracleDedupWinnow,
    "dedup_minhash" -> oracleDedupMinhash,
    "dedup_simhash" -> oracleDedupSimhash,
    "dedup_clusters" -> oracleDedupClusters,
    "split_leakage" -> oracleSplitLeakage,
    "dedup_keep_best" -> oracleDedupKeepBest,
    "dedup_embed" -> oracleDedupEmbed,
    "dedup_semdedup" -> oracleDedupSemdedup,
    "dedup_semdedup_incremental" -> oracleDedupSemdedupIncremental,
    "dedup_incremental" -> oracleDedupIncremental,
    "dedup_allpairs" -> oracleDedupAllpairs,
    "dedup_editdist" -> oracleDedupEditdist,
    "merge_upsert" -> oracleMergeUpsert,
    "dedup_editdist_lookup" -> oracleDedupEditdistLookup,
    "text_collocations" -> oracleTextCollocations,
    "text_nfc" -> oracleTextNfc,
    "ann_brute" -> oracleAnnBrute,
    "ann_mmr" -> oracleAnnMmr,
    "ann_lsh" -> oracleAnnLsh,
    "ann_ivf" -> oracleAnnIvf,
    "ann_pq" -> oracleAnnPq,
    "ann_sq" -> oracleAnnSq,
    "ann_sign" -> oracleAnnSign,
    "ann_sign_mih" -> oracleAnnSignMih,
    "ann_ivfpq" -> oracleAnnIvfPq,
    "ann_index" -> oracleAnnIvfPq,
    "ann_ivfpq_rr" -> oracleAnnIvfPqRr,
    "decontaminate_embed" -> oracleDecontaminateEmbed,
    "text_lang" -> oracleTextLang,
    "text_quality" -> oracleTextQuality,
    "text_tokens" -> oracleTextTokens,
    "text_tokens_bpe" -> oracleTextTokensBpe,
    "tokenize_unigram" -> oracleTokenizeUnigram,
    "tokenize_wordpiece" -> oracleTokenizeWordPiece,
    "tokenize_raw_unigram" -> oracleTokenizeRawUnigram,
    "tokenize_raw_wordpiece" -> oracleTokenizeRawWordPiece,
    "bpe_raw" -> oracleBpeRaw,
    "tokenizer_store" -> oracleTokenizerStore,
    "text_extract_html" -> oracleTextExtractHtml,
    "warc_parse" -> oracleWarcParse,
    "extract_links" -> oracleExtractLinks,
    "link_pagerank" -> oracleLinkPagerank,
    "link_prior" -> oracleLinkPrior,
    "robots_filter" -> oracleRobotsFilter,
    "link_harmonic" -> oracleLinkHarmonic,
    "tokenize_fertility" -> oracleTokenizeFertility,
    "bpe_train" -> graft.llm.Bpe.oracleTrainSql(8),
    "bpe_roundtrip" -> oracleBpeRoundtrip,
    "vocab_build" -> oracleVocabBuild,
    "search_bm25" -> oracleSearchBm25,
    "search_ql" -> oracleSearchQl,
    "search_bm25f" -> oracleSearchBm25f,
    "search_sdm" -> oracleSearchSdm,
    "search_rm3" -> oracleSearchRm3,
    "search_rm3_index" -> oracleSearchRm3,
    "search_ql_index" -> oracleSearchQl,
    "search_sdm_index" -> oracleSearchSdm,
    "search_hybrid" -> oracleSearchHybrid,
    "mine_negatives" -> oracleMineNegatives,
    "search_hybrid_index" -> oracleSearchHybridIndex,
    "search_index" -> oracleSearchBm25,
    "search_retention" -> oracleSearchRetention,
    "ann_filtered" -> oracleAnnFiltered,
    "text_tfidf" -> oracleTextTfidf,
    "decontaminate_bloom" -> oracleDecontaminateBloom,
    "sketch_hll" -> oracleSketchHll,
    "sketch_kmv" -> oracleSketchKmv,
    "sketch_kmv_store" -> oracleSketchKmvStore,
    "sketch_cms" -> oracleSketchCms,
    "sketch_quantile" -> oracleSketchQuantile,
    "sketch_store" -> oracleSketchStore,
    "shard_assign" -> oracleShardAssign,
    "shard_balanced" -> oracleShardBalanced,
    "text_classifier" -> oracleTextClassifier,
    "classifier_train" -> oracleClassifierTrain(4, 1.0),
    "text_fingerprint" -> oracleTextFingerprint,
    "text_gopher" -> oracleTextGopher,
    "text_repetition" -> oracleTextRepetition,
    "text_entropy" -> oracleTextEntropy,
    "text_typicality" -> oracleTextTypicality,
    "text_perplexity" -> oracleTextPerplexity,
    "text_perplexity_kn" -> oracleTextPerplexityKn,
    "text_pii" -> oracleTextPii,
    "text_blocklist" -> oracleTextBlocklist,
    "embed_project" -> oracleEmbedProject,
    "embed_pca" -> oracleEmbedPca(2, 4),
    "decontaminate" -> oracleDecontaminate,
    "sample_stratified" -> oracleSampleStratified,
    "sample_weighted" -> oracleSampleWeighted,
    "mix_budget" -> oracleMixBudget,
    "mix_temperature" -> oracleMixTemperature,
    "mix_cluster" -> oracleMixCluster,
    "mix_perplexity" -> oracleMixPerplexity,
    "span_corrupt" -> oracleSpanCorrupt,
    "chunk_overlap" -> oracleChunkOverlap,
    "chunk_cdc" -> oracleChunkCdc,
    "dsir_weight" -> oracleDsirWeight,
    "dedup_spans" -> oracleDedupSpans,
    "dedup_substr" -> oracleDedupSubstr,
    "dedup_substr_incremental" -> oracleDedupSubstrIncremental,
    "pack_blocks" -> oraclePackBlocks,
    "pack_ffd" -> oraclePackFfd,
    "dedup_domain" -> oracleDedupDomain,
    "dedup_domain_psl" -> oracleDedupDomainPsl,
    "text_boilerplate" -> oracleTextBoilerplate,
    "pack_tok" -> oraclePackTok,
    "corpus_curate" -> oracleCorpusCurate,
    "dedup_media" -> oracleDedupMedia,
    "multimodal_meta" -> oracleMultimodalMeta,
    "media_frames" -> oracleMediaFrames,
    "media_resize" -> oracleMediaResize,
    "multimodal_features" -> oracleMultimodalFeatures)
}
