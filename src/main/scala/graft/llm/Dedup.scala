package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale text corpora.
  *
  * Design rules for 100 TB:
  *  - never an all-pairs compare: every candidate generation step shuffles on
  *    a bounded key (content hash, LSH band hash, SimHash band) and joins only
  *    within buckets;
  *  - per-document features (gram sets, minhash signatures, simhash
  *    fingerprints) are computed IN-ROW — a document's grams all live in its
  *    own `text` column, so the explode → groupBy(doc_id) → collect round
  *    trip is a wasted full shuffle of the gram corpus. Signature extraction
  *    here is map-only; the only wide dependencies are the bucket groupBys
  *    over (band, hash) keys and small candidate-pair joins;
  *  - all hashing is md5-derived (reproducible in any engine — the DuckDB
  *    oracle replicates each algorithm bit-for-bit);
  *  - no UDFs: higher-order functions + native codegen'd expressions
  *    ([[graft.functions.MinHash60]], [[graft.functions.SimHash60]],
  *    [[graft.functions.Hash60Array]]).
  */
object Dedup {

  /** 60-bit positive hash from md5 (identical in DuckDB:
    * `('0x'||substr(md5(x),1,15))::BIGINT`). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

  /** Lowercased alphanumeric word tokens. */
  def tokens(text: Column): Column = {
    val _ = text
    expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
  }

  /** Adds `gs`: the document's DISTINCT word n-gram set, computed in-row
    * (token array → sliding concat → array_distinct; no shuffle). */
  def withGramSet(docs: DataFrame, n: Int): DataFrame = {
    val gram = (1 to n).map(j => s"element_at(__tk__, i + ${j - 1})")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs.withColumn("__tk__", tokens(col("text")))
      .withColumn("gs",
        when(size(col("__tk__")) >= n,
          array_distinct(expr(s"transform(sequence(1, size(__tk__) - ${n - 1}), i -> $gram)")))
          .otherwise(array().cast(ArrayType(StringType))))
      .drop("__tk__")
  }

  /** Raw (duplicate-carrying) word n-grams, long form: (doc_id, g). The
    * in-row distinct set is NOT exploded here on purpose: Spark evaluates
    * `explode(array_distinct(...))` an order of magnitude slower than the
    * raw generator (measured 17 s vs 1.6 s on sf0.1 documents) — consumers
    * dedup in their aggregation instead (`collect_set`, `distinct`). */
  private[llm] def rawNgrams(docs: DataFrame, n: Int): DataFrame = {
    val gram = (1 to n).map(j => s"element_at(__tk__, i + ${j - 1})")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs.withColumn("__tk__", tokens(col("text")))
      .select(col("doc_id"), explode(
        when(size(col("__tk__")) >= n,
          expr(s"transform(sequence(1, size(__tk__) - ${n - 1}), i -> $gram)"))
          .otherwise(array().cast(ArrayType(StringType)))).as("g"))
  }

  /** Distinct word n-grams per document, long form: (doc_id, g). */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame =
    rawNgrams(docs, n).distinct()

  /** Exact dedup: hash of normalized text → keep lowest doc_id per group.
    * Shuffles on the hash (bounded key), not the full text. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(lower(trim(col("text"))).cast(BinaryType)).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")

  /** Exact n-gram Jaccard near-dup pairs via an inverted index: join per
    * gram (postings capped at `maxDf` to bound skew — at corpus scale the
    * head grams carry no signal), count common grams, Jaccard from the
    * in-row set sizes. Output: (doc_a, doc_b, jaccard), jaccard >= minJaccard. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.3,
                   maxDf: Long = 1000): DataFrame = {
    // Distinct (gram, doc) pairs via a groupBy on BOTH columns — the
    // aggregation buffer is constant-size per key (no per-gram list), and
    // the map-side partial dedups each doc's repeated grams before the
    // shuffle. Hot grams spread across (g, doc) hash partitions instead
    // of accumulating in one buffer.
    val gd = rawNgrams(docs, n).select("g", "doc_id").distinct()
    // Per-doc distinct gram counts — map-side-combinable counts over the
    // deduped pairs; every (gram, doc) pair appears exactly once.
    val sizes = gd.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("sz"))
    // Pre-count df per gram and keep only grams inside the cap BEFORE any
    // posting list is built (the [[DedupIndex.build]] / dedupSubstr
    // two-pass shape): a boilerplate gram shared by 10⁸ docs is counted —
    // map-side combinable, constant buffer — and dropped without ever
    // materializing its member list. df=1 singleton grams (the Zipf-tail
    // majority) are dropped here too, before the posting shuffle.
    val kept = gd.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
      .select("g")
    // Posting lists only for in-cap grams: collect_set buffers are now
    // bounded by maxDf by construction. `maxDf` also bounds the per-row
    // pair fan-out (a df-capped list explodes to at most maxDf² pairs).
    val common = gd.join(kept, "g")
      .groupBy("g")
      .agg(collect_set("doc_id").as("ds"))
      .select(col("ds"), explode(col("ds")).as("da"))
      .select(col("da"), explode(col("ds")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy(col("da").as("doc_a"), col("db").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) /
          (col("sza") + col("szb") - col("common")).cast(DoubleType), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** EXACT all-pairs set-similarity self-join with PREFIX FILTERING
    * (Bayardo et al. WWW'07 "AllPairs"; Xiao et al. WWW'08 "PPJoin"):
    * every pair of documents whose word-SET Jaccard ≥ `minJaccard`, with
    * NO false negatives — the guarantee [[ngramJaccard]] gives up (its
    * `maxDf` cap silently drops pairs that only share hot grams) and
    * [[minhashLsh]] only approximates (banding misses below-threshold-
    * probability pairs).
    *
    * The filter that makes exactness affordable: order every doc's token
    * set by GLOBAL rarity (document frequency asc, token asc — a total,
    * deterministic order), and index only each doc's PREFIX of length
    * |A| − ⌈τ·|A|⌉ + 1. Theorem (prefix filter): J(A,B) ≥ τ implies
    * |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and the minimum-rank common token must
    * then sit inside BOTH prefixes — if it sat outside A's, all of A∩B
    * would fit in A's suffix of size ⌈τ|A|⌉−1 < ⌈τ|A|⌉. So joining
    * prefix postings with themselves finds every qualifying pair, while
    * hot tokens (which sort LAST in the rarity order) almost never enter
    * a prefix — the inverted index is skew-resistant by construction,
    * not by a lossy cap. A length filter (τ·|A| ≤ |B| ≤ |A|/τ, applied
    * with an epsilon so a boundary pair is never over-pruned) cuts
    * candidates further; verification is one exact `array_intersect`
    * per candidate. (PPJoin's positional filter would prune another
    * ~2×; omitted for plan simplicity — the prefix+length pair is the
    * load-bearing part.)
    *
    * Scale shape: one token-keyed df aggregate (map-side combined), one
    * doc-keyed sort-collect (per-doc bounded), prefix postings explode to
    * Σ(|A|−⌈τ|A|⌉+1) rows ≈ (1−τ)·corpus tokens, the candidate self-join
    * shuffles on the prefix token, verify joins shuffle on doc ids with
    * candidate-bounded fan-in. `maxBucket` remains as a pure SAFETY
    * brake on adversarial prefix buckets — at the gate's corpus scale no
    * bucket comes near it, so the DuckDB brute-force oracle is the
    * honest spec. Output: (doc_a < doc_b, round-6 jaccard ≥ τ). */
  def allPairsJoin(docs: DataFrame, minJaccard: Double,
                   maxBucket: Int = 100000): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val eps = 1e-9
    val ts = docs
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
    val tok = ts.select(col("doc_id"), explode(col("ts")).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    // per doc: tokens sorted by (df asc, token asc) — struct sort IS the
    // global rarity order, no corpus-wide rank window needed
    val ranked = tok.join(dfreq, "token")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("token")))).as("ord"),
        count(lit(1)).cast(LongType).as("sz"))
    val prefLen = (col("sz") - ceil(lit(minJaccard) * col("sz").cast(DoubleType)
      - lit(eps)) + 1).cast(IntegerType)
    // pin the prefix postings: three consumers (bucket pre-count + both
    // self-join sides) would otherwise each replay the tokenize + df join
    // + sort-collect chain — the dsir_weight shared-frame rule. The frame
    // is (1−τ)·corpus tokens of (id, sz, token), far smaller than the
    // corpus at useful τ.
    val pref0 = ranked
      .select(col("doc_id"), col("sz"),
        explode(slice(col("ord"), lit(1), prefLen)).as("pt"))
      .select(col("doc_id"), col("sz"), col("pt.token").as("token"))
    val sc = docs.sparkSession.sparkContext
    val pref = if (sc.getCheckpointDir.isDefined) pref0.checkpoint()
               else pref0.localCheckpoint()
    // safety brake only (see scaladoc): pre-counted, never list-built
    val ok = pref.groupBy("token").agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket)).select("token")
    val p = pref.join(ok, "token")
    val cand = p.as("a").join(p.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.sz").cast(DoubleType) >=
            lit(minJaccard) * col("a.sz").cast(DoubleType) - lit(eps) &&
          col("a.sz").cast(DoubleType) >=
            lit(minJaccard) * col("b.sz").cast(DoubleType) - lit(eps))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(ts.select(col("doc_id").as("doc_a"), col("ts").as("__ta__")),
        "doc_a")
      .join(ts.select(col("doc_id").as("doc_b"), col("ts").as("__tb__")),
        "doc_b")
      .withColumn("common",
        size(array_intersect(col("__ta__"), col("__tb__"))).cast(LongType))
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) /
          (size(col("__ta__")) + size(col("__tb__")) - col("common"))
            .cast(DoubleType), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Winnowed-fingerprint near-dup pairs (Schleimer et al. 2003, the MOSS
    * local-fingerprinting algorithm): docs sharing ≥ `minShared` winnowed
    * fingerprints, scored by containment overlap = shared / min(|fps|).
    * The winnowing guarantee makes this the SUBSTRING-match detector among
    * the pair generators: any common substring of ≥ w+k−1 chars (11 at
    * the [[graft.functions.Winnow]] defaults, 8-char shingles / window 4)
    * is caught by a shared fingerprint — shorter-range than [[ngramJaccard]]'s
    * whole-set similarity, which is exactly what plagiarism-style reuse
    * detection wants.
    *
    * Scale shape = [[ngramJaccard]]'s inverted index, but the posting
    * lists hold winnowed fingerprints — ~1/⌈(w+1)/2⌉ of the raw shingle
    * set (winnowing's expected density 2/(w+1)), so the groupBy keys,
    * per-doc sizes, and the maxDf-capped pair fan-out all shrink by the
    * same factor: winnowing IS the standard way to keep a fingerprint
    * index sublinear in corpus bytes. Same `maxDf` degenerate-posting
    * guard as every sibling.
    *
    * `minShared` gates the pair JOIN (cheap, applied at the count);
    * `minOverlap` gates the verdict — on a homogeneous corpus shared
    * vocabulary alone gives most pairs a couple of common fingerprints
    * (measured at sf0.01: 108k pairs at shared ≥ 2, but only 26 at
    * containment ≥ 0.5), so the containment threshold is what separates
    * reused passages from topic overlap. */
  def winnowPairs(docs: DataFrame, minShared: Long = 2,
                  maxDf: Long = 1000, minOverlap: Double = 0.0): DataFrame = {
    val fps = TextAnalysis.fingerprints(docs) // (doc_id, fp), distinct per doc
    val sizes = fps.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("sz"))
    // df pre-count before any posting list exists (see [[ngramJaccard]]):
    // hot fingerprints are counted map-side-combinably and dropped without
    // materializing their member list.
    val kept = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
      .select("fp")
    val shared = fps.join(kept, "fp")
      .groupBy("fp").agg(collect_set("doc_id").as("ds"))
      .select(col("ds"), explode(col("ds")).as("da"))
      .select(col("da"), explode(col("ds")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy(col("da").as("doc_a"), col("db").as("doc_b"))
      .agg(count(lit(1)).cast(LongType).as("shared"))
      .filter(col("shared") >= minShared)
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("overlap",
        round(col("shared").cast(DoubleType) /
          least(col("sza"), col("szb")).cast(DoubleType), 6))
      .filter(col("overlap") >= minOverlap)
      .select("doc_a", "doc_b", "shared", "overlap")
  }

  /** MinHash signatures: k md5-seeded permutation mins over the distinct
    * n-gram set — map-only: the in-row gram set feeds the native single-pass
    * [[graft.functions.MinHash60]] expression (bit-identical to the k-pass
    * HOF/SQL formulation the oracle uses; the min is invariant to gram
    * order). Returns (doc_id, sig array<long>). */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int): DataFrame = {
    graft.functions.MinHash60.register(docs.sparkSession)
    withGramSet(docs, n)
      .select(col("doc_id"), expr(s"graft_minhash(gs, $k)").as("sig"))
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `k/bands` rows; docs sharing any band-hash become candidates; candidates
    * are verified with the exact n-gram Jaccard. The ONLY shuffles are the
    * (band, band-hash) bucket groupBy and the candidate distinct — signature
    * extraction and verification gram sets are in-row, so the gram corpus is
    * never shuffled. Candidate joins are small (near-dup rate × corpus) and
    * AQE broadcasts them against the map-side gram-set scan.
    *
    * Docs with fewer than n tokens have an EMPTY gram set and hence an empty
    * MinHash signature; they are dropped at the banding step — otherwise
    * every such doc would share the md5("") band key and one degenerate
    * bucket per band (up to maxBucket² pair fan-out × bands). Matches the
    * oracle, where gram-less docs never produce signature rows.
    *
    * The drop is expressed IN the band generator (`when` → NULL → explode
    * emits nothing), NOT as a Filter: a `filter(size(sig) > 0)` gets
    * predicate-pushed below the signature projection, re-evaluating the
    * whole tokenize→gram→minhash chain per row outside codegen (measured
    * 2.4× on the signature stage, 1.8 s → 10.3 s on the sf0.1 query). The
    * guard references `sig` twice, so CollapseProject keeps the signature
    * projection separate and it is computed once. */
  /** Per-doc LSH band keys from the minhash signature: `bands` keys per
    * doc, each the md5 of its `k / bands`-row signature slice. Shared by
    * [[minhashLsh]] (within-corpus pairs) and
    * [[graft.llm.DedupIndex]] (stored postings + incremental probes). */
  private[llm] def bandKeys(docs: DataFrame, n: Int, k: Int,
                            bands: Int): DataFrame = {
    val r = k / bands
    minhashSignatures(docs, n, k).select(col("doc_id"),
        explode(when(size(col("sig")) > 0, expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b as band, md5(array_join(transform(slice(sig, b * $r + 1, $r), x -> cast(x as string)), ',')) as bkey))"))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  def minhashLsh(docs: DataFrame, n: Int = 3, k: Int = 12, bands: Int = 4,
                 minJaccard: Double = 0.5, maxBucket: Int = 10000): DataFrame = {
    val banded = bandKeys(docs, n, k, bands)
    // Candidates per LSH bucket via groupBy + ordered-pair explode. A bucket
    // with more than `maxBucket` members is degenerate (everything near-dups
    // everything); dropping it bounds the O(B²) fan-out — the skew guard a
    // 100 TB corpus needs against adversarial/boilerplate buckets. The
    // bucket is counted FIRST (map-side combinable, constant buffer) and
    // joined back, so a degenerate bucket's member list is never built —
    // the [[DedupIndex.build]] pre-count shape.
    val okBuckets = banded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket))
      .select("band", "bkey")
    val cand = banded.join(okBuckets, Seq("band", "bkey"))
      .groupBy("band", "bkey")
      .agg(collect_list("doc_id").as("ds"))
      .select(explode(expr(
        "flatten(transform(ds, a -> transform(filter(ds, b -> a < b), b -> struct(a as doc_a, b as doc_b))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    // verify candidates against the exact in-row gram sets: two joins of the
    // small candidate table against the map-side scan, intersection size via
    // array_intersect — zero gram-corpus shuffles.
    val gsets = withGramSet(docs, n).select(col("doc_id"), col("gs"))
    cand
      .join(gsets.select(col("doc_id").as("doc_a"), col("gs").as("__ga__")), "doc_a")
      .join(gsets.select(col("doc_id").as("doc_b"), col("gs").as("__gb__")), "doc_b")
      .withColumn("common", size(array_intersect(col("__ga__"), col("__gb__"))).cast(LongType))
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) /
          (size(col("__ga__")) + size(col("__gb__")) - col("common")).cast(DoubleType), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair graph — each doc converges to the smallest doc_id reachable from
    * it. The step a production dedup pipeline runs after pair generation
    * (keep one doc per cluster).
    *
    * Iterative Spark shape: per round, ONE hop of neighbor min-propagation
    * followed by ONE pointer-doubling step (cluster := cluster(cluster)),
    * so label information moves two hops per round — half the rounds of
    * plain propagation on chain-shaped components. Each round's frame is
    * checkpointed to truncate lineage (20 rounds of joins would otherwise
    * build an exponential plan): RELIABLY (HDFS/object store) when
    * `SparkContext.setCheckpointDir` is configured — the cluster-safe mode,
    * surviving executor loss — falling back to `localCheckpoint` for
    * single-JVM tools where executor loss means process death anyway.
    * Convergence needs at most ~log2(diameter)+1 rounds; near-dup clusters
    * are shallow. Returns (doc_id, cluster). */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // Each round's frame is checkpointed eagerly; once the NEXT round's frame
    // is materialized, the previous one is dead weight — ~2·maxIters cached
    // RDDs (the r4 bench's slow heap leak) unless released. Track the RDD ids
    // each ckpt() persists (localCheckpoint registers them in
    // sc.persistentRdds) and unpersist superseded rounds; only `edges` and
    // the final labels frame survive the loop.
    val reliable = sc.getCheckpointDir.isDefined
    def ckpt(df: DataFrame): (DataFrame, Seq[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = if (reliable) df.checkpoint() else df.localCheckpoint()
      (out, (sc.getPersistentRDDs.keySet -- before).toSeq)
    }
    def release(ids: Seq[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val (edges, edgeIds) = ckpt(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    var (labels, labelIds) = ckpt(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbr = edges.join(labels.select(col("doc_id").as("dst"), col("cluster").as("nc")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("nc").as("nbr"))
      // hop is used twice (both sides of the pointer-jump self-join): a lazy
      // persist makes the second use a cache read WITHOUT its own driver
      // action — it materializes inside the `next` checkpoint job. Lineage
      // is truncated at `next`, so hop doesn't need a checkpoint of its own.
      val hop = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"),
          col("cluster").as("__old__"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ptr = hop.select(col("doc_id").as("__cid__"), col("cluster").as("__cc__"))
      val (next, nextIds) = ckpt(hop.join(ptr, hop("cluster") === ptr("__cid__"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("__cc__"), col("cluster"))).as("cluster"),
          col("__old__")))
      iter += 1
      // Convergence is polled every 2nd round only (pointer doubling
      // converges in ~log2(diameter) rounds; the worst case is one spare
      // round of work) — the round-start label rides along as __old__ so
      // the poll is a filter over the already-checkpointed frame, not a
      // join. Per round this leaves the checkpoint job plus at most one
      // short-circuiting isEmpty, versus the previous 2 checkpoints + 1
      // isEmpty every round.
      converged = iter % 2 == 0 && next.filter(col("cluster") =!= col("__old__")).isEmpty
      hop.unpersist(blocking = false)
      release(labelIds)
      labels = next.drop("__old__")
      labelIds = nextIds
    }
    release(edgeIds)
    labels
  }

  /** Quality-aware cluster resolution — "fuzzy dedup, keep the BEST copy":
    * instead of first-occurrence-wins (the [[semDedup]]/[[DedupIndex]]
    * convention, right for rolling crawls where older == canonical), each
    * near-dup cluster keeps its highest-quality member — the curation
    * policy when duplicates differ in extraction quality (boilerplate
    * stripped vs not, truncated vs whole).
    *
    * `clusters` is [[duplicateClusters]] output (doc_id, cluster);
    * `quality` any per-doc score table (doc_id, quality_score) —
    * [[TextAnalysis.quality]] in the gate. Winner per cluster = argmax by
    * (quality_score desc, doc_id asc).
    *
    * Scale shape: the argmax is a `groupBy(cluster).agg(max(struct(...)))`
    * — map-side combinable, NO per-cluster window sort, so a degenerate
    * mega-cluster (10⁷ copies of a boilerplate page: exactly what dedup
    * finds at 100 TB) costs a combiner-reduced max, not a single-task
    * sort (the dedup_substr r11 lesson applied from the start). Winners
    * then broadcast back over a cluster-keyed join. */
  def keepBest(clusters: DataFrame, quality: DataFrame): DataFrame = {
    val joined = clusters
      .join(quality.select("doc_id", "quality_score"), "doc_id")
    // argmax by (quality desc, doc_id asc) == max of (quality, -doc_id)
    val best = joined.groupBy("cluster")
      .agg(max(struct(col("quality_score"),
        (-col("doc_id")).as("__nid__"))).as("__m__"))
      .select(col("cluster"), (-col("__m__.__nid__")).as("kept_id"))
    joined.join(best, Seq("cluster"))
      .withColumn("keep", col("doc_id") === col("kept_id"))
      .select("doc_id", "cluster", "quality_score", "kept_id", "keep")
  }

  /** 60-bit SimHash over distinct word tokens — map-only: in-row token
    * hashing ([[graft.functions.Hash60Array]]) feeding ONE codegen'd pass
    * maintaining all 60 bit counters ([[graft.functions.SimHash60]]).
    * Per-bit integer sums are order-independent: identical fingerprints to
    * the portable 60-pass HOF/SQL definition the oracle uses.
    *
    * Zero-token docs (no [a-z0-9] characters at all) are EXCLUDED rather
    * than fingerprinted as 0 — an all-zero fingerprint would band every such
    * doc together and emit hamming-0 "duplicate" pairs; the oracle's
    * token-level CTE likewise produces no rows for them. The exclusion is an
    * `explode(when(...))` (NULL generator input → no rows), not a Filter: a
    * filter on the token array gets predicate-pushed below the projection
    * and re-tokenizes every row; the guard's double reference to `__ts__`
    * keeps the tokenize projection un-collapsed, evaluated once. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    graft.functions.SimHash60.register(docs.sparkSession)
    graft.functions.Hash60Array.register(docs.sparkSession)
    docs.withColumn("__ts__", array_distinct(tokens(col("text"))))
      .select(col("doc_id"),
        explode(when(size(col("__ts__")) > 0,
          array(expr(s"${graft.functions.SimHash60.FunctionName}(" +
            s"${graft.functions.Hash60Array.FunctionName}(__ts__))")))).as("fp"))
  }

  /** Near-dup pairs via 4 bands of 15 bits (any equal band → candidate)
    * verified by Hamming distance. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6, maxBucket: Int = 10000): DataFrame =
    simhashBandPairs(simhashFingerprints(docs), maxHamming, maxBucket)

  /** Banded candidate generation + Hamming verification over ANY
    * (doc_id, fp) 60-bit fingerprint frame — shared by the text
    * ([[simhashPairs]]) and media-payload
    * ([[Multimodal.mediaNearDup]]) SimHash families. */
  private[llm] def simhashBandPairs(fps: DataFrame, maxHamming: Int,
                                    maxBucket: Int): DataFrame = {
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr("transform(sequence(0, 3), b -> struct(b as band, shiftright(fp, b * 15) & 32767 as bkey))")).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // bucket-groupBy pair generation (maxBucket bounds degenerate-bucket
    // fan-out). Pairs stream out of TWO codegen'd explodes — an
    // interpreted HOF pair-filter measured 1.7× slower here (hot buckets:
    // near-dup clusters make B² big for simhash). Buckets are counted
    // BEFORE the member list is collected (the [[DedupIndex.build]]
    // pre-count shape), so a boilerplate band key shared by 10⁸ docs is
    // dropped by a constant-size counter, never a multi-GB list buffer.
    val okBuckets = banded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket))
      .select("band", "bkey")
    banded.join(okBuckets, Seq("band", "bkey"))
      .groupBy("band", "bkey")
      .agg(collect_list(struct(col("doc_id"), col("fp"))).as("ds"))
      .select(col("ds"), explode(col("ds")).as("a"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup scoped
    * to k-means clusters — embeddings are clustered, and pairwise cosine is
    * computed only WITHIN a cluster, so the pair budget is Σ|cluster|²
    * instead of N². A vector is dropped iff an earlier (lower `vec_id`)
    * member of its cluster has cosine ≥ `tau` with it — the same
    * deterministic first-occurrence-wins rule as every other dedup family
    * here (the paper keeps one arbitrary member per duplicate group; lowest
    * id is the reproducible choice of "arbitrary").
    *
    * Where [[graft.llm.Ann.lshNearDup]] finds near-dup PAIRS inside narrow
    * LSH buckets (high-τ near-duplicates), SemDeDup's clusters are coarse
    * semantic neighborhoods: lower τ catches paraphrase-level redundancy
    * LSH bucketing never co-locates, and the output is a per-vector
    * keep/drop verdict, not a pair list.
    *
    * Scale shape: centroid fit is first-K seeding (bounded collect, a
    * model parameter — swap in [[Ann.lloydCentroids]]/[[Ann.spreadCentroids]]
    * off the gate path); assignment is one broadcast crossJoin + per-vec
    * argmax (map-only, the ann_ivf shape); pair generation is ONE
    * groupBy(cent_id) + ordered-pair explode — the lshNearDup/simhashPairs
    * convention, one pass over the assignment pipeline instead of a
    * self-join that recomputes it per branch. `nCentroids` grows with the
    * corpus (the paper: 50k clusters at 134M docs) keeping |cluster|
    * bounded; `maxCluster` hard-caps degenerate-cluster fan-out like every
    * other bucket guard in this file.
    *
    * Output: one row per vector — (vec_id, cent_id, keep, min_dup, n_dups)
    * where min_dup is the lowest-id earlier in-cluster duplicate (NULL when
    * kept) and n_dups the count of earlier duplicates. All-integer output:
    * the cosine is rounded to 6 decimals ([[Ann.nativeScore]]) only for the
    * ≥ τ comparison, so the gate hash never sees a float. */
  def semDedup(corpus: DataFrame, tau: Double, nCentroids: Int = 16,
               maxCluster: Int = 10000): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val cents = Ann.seedCentroids(corpus, nCentroids)
    // Materialize the assignment ONCE: the pair branch and the final
    // keep/drop join both consume it, and Catalyst plans the broadcast
    // crossJoin + argmax window twice without it (the dsirWeights /
    // duplicateClusters shared-frame pattern).
    val as0 = Ann.assignTo(corpus, cents, 1)
    val sc = corpus.sparkSession.sparkContext
    val assigned =
      if (sc.getCheckpointDir.isDefined) as0.checkpoint()
      else as0.localCheckpoint()
    // Pre-count cluster sizes (constant-size buffers over the checkpointed
    // assignment — free second pass) and join back, so a degenerate
    // cluster's member+embedding list is never collected: at 100 TB a
    // boilerplate cluster's struct list is multi-GB in one buffer.
    val okClusters = assigned.groupBy("cent_id")
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn").between(2, maxCluster))
      .select("cent_id")
    val dups = assigned.join(okClusters, Seq("cent_id"))
      .groupBy("cent_id")
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ds"))
      .select(col("ds"), explode(col("ds")).as("a"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Ann.nativeScore(corpus, "a.embedding", "b.embedding").as("cos"))
      .filter(col("cos") >= tau)
      .groupBy("vec_b")
      .agg(min(col("vec_a")).as("min_dup"),
        count(lit(1)).cast(LongType).as("n_dups"))
    assigned.select(col("vec_id"), col("cent_id"))
      .join(dups.withColumnRenamed("vec_b", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        col("min_dup").isNull.as("keep"), col("min_dup"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
  }

  /** EXACT edit-distance similarity self-join (q-gram count filtering,
    * Gravano et al. VLDB'01, with the [[allPairsJoin]] prefix-filter
    * index): every pair of rows whose strings are within Levenshtein
    * distance ≤ `k`, with NO false negatives — the fuzzy-entity-matching
    * primitive (typo'd names/titles/IDs) none of the set-similarity
    * dedups covers, because token-set Jaccard cannot see a one-character
    * substitution inside a word.
    *
    * Filter theory: one edit (insert/delete/substitute) destroys at most
    * `q` of a string's positional q-grams, so ed(a,b) ≤ k implies the
    * q-gram MULTISETS overlap in ≥ max(|Ga|,|Gb|) − k·q grams. Multisets
    * become plain sets by tagging each gram with its occurrence index
    * (gram, occ) — set intersection then equals multiset overlap. With
    * the overlap bound t = max − k·q, the [[allPairsJoin]] prefix-filter
    * theorem says a qualifying pair must share one of the first
    * |G| − t + 1 ≤ k·q + 1 grams in ANY shared total order — so only
    * each string's k·q+1 RAREST (df asc, gram, occ) grams are indexed,
    * and hot grams (the skew) almost never enter a prefix. A length
    * filter (|len(a) − len(b)| ≤ k, necessary for ed ≤ k) prunes
    * candidates further. Verification is one native codegen'd
    * `levenshtein` per candidate — integer output, exact in any engine.
    *
    * Exactness at the edges: the gram bound is vacuous only when BOTH
    * strings have ≤ k·q grams (len ≤ k·q + q − 1) — those "short" rows
    * are cross-verified directly within the length filter (a bounded
    * bucket: the strings too short to carry a signature). A short-long
    * pair still satisfies t ≥ 1 via the long side, and the short side's
    * prefix is its whole gram set, so the postings join covers it; a
    * gram-LESS string (len < q) can only be within k of strings that
    * are themselves short-bucket members. LlmSpec pins brute-force
    * equality including both edge classes.
    *
    * Scale shape: gram extraction + occurrence tagging is IN-ROW (O(len²)
    * per row — built for SHORT strings: names, titles, keys; for document
    * bodies use [[allPairsJoin]]/[[minhashLsh]]), one (gram,occ)-keyed df
    * aggregate, one id-keyed sort-collect, prefix postings ≈ (k·q+1)·N
    * rows, candidate self-join shuffles on the prefix gram, verify joins
    * shuffle on ids with candidate-bounded fan-in. `maxBucket` here is
    * NOT the LSH families' silent recall trade: an overflowing bucket
    * FAILS the job loudly ([[requireNoOverflow]]) because this family
    * promises no false negatives.
    *
    * Output: (id_a < id_b, dist ≤ k), both integral — hash-exact by
    * construction. */
  def editDistanceJoin(rows: DataFrame, idCol: String, strCol: String,
                       k: Int = 1, q: Int = 2,
                       maxBucket: Int = 100000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(q >= 2, s"q must be >= 2, got $q")
    if (k <= 2) symDeleteJoin(rows, idCol, strCol, k, maxBucket)
    else qgramJoin(rows, idCol, strCol, k, q, maxBucket)
  }

  /** Deletion-neighborhood edit-distance self-join (FastSS, Bocek et al.
    * 2007; the SymSpell/SymDelete scheme) — the small-k fast path of
    * [[editDistanceJoin]]. Signature set D(s) = every string reachable
    * from s by ≤ k character deletions (s itself included). Exactness:
    * ed(a,b) ≤ k ⟹ D(a) ∩ D(b) ≠ ∅ — align a,b under an edit script
    * with ≤ k ops and delete from a its substituted/deleted characters,
    * from b its substituted/inserted ones: both sides reach the script's
    * common subsequence with ≤ k deletions each. Join postings on the
    * variant string, length-filter, verify with the banded levenshtein.
    *
    * Why it beats q-grams at small k: a candidate bucket holds only
    * strings whose variants COINCIDE — on dense key-like corpora
    * (sequential IDs, typo'd names) q-gram rarity collapses (every gram
    * is hot; measured 10.4M candidates for 262k true pairs at sf0.1)
    * while deletion buckets stay output-sized (the same corpus: 42 s
    * q-gram vs 5 s symdelete solo at sf0.1, identical 262,500 pairs). Cost: |D(s)| ≈ Σ_{d≤k} C(len,d) signatures per row
    * (19 at len 18/k=1, ~190 at k=2) — built IN-ROW; fine for the short
    * strings this operator targets, quadratic-in-len generation at k=2
    * (len ≤ a few hundred). For k ≥ 3 the signature count explodes and
    * [[editDistanceJoin]] switches to the q-gram prefix path. */
  /** Exactness guard for the edit-distance family (and only it): the
    * LSH families' `maxBucket` is a documented RECALL trade, but
    * symDelete/qgram/lookup promise NO false negatives — a silently
    * dropped oversized bucket voids that contract with no symptom. The
    * guard counts overflowing signature buckets over the (checkpointed)
    * postings — one cheap aggregate, no bucket is ever list-built — and
    * fails loudly so incompleteness is an ERROR, not a quiet wrong
    * answer. Remedies are in the message; there is deliberately no
    * "drop anyway" switch — callers who want lossy matching at that
    * density are in LSH territory ([[minhashLsh]]/[[allPairsJoin]]). */
  private def requireNoOverflow(postings: DataFrame, keyCols: Seq[String],
                                maxBucket: Int, op: String): Unit = {
    val n = postings.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bn")).filter(col("bn") > maxBucket).count()
    if (n > 0) throw new IllegalStateException(
      s"$op: $n signature bucket(s) exceed maxBucket=$maxBucket; dropping " +
      "them would silently break the no-false-negatives contract - raise " +
      "maxBucket, reduce k, or use an LSH family for lossy matching")
  }

  private def symDeleteJoin(rows: DataFrame, idCol: String, strCol: String,
                            k: Int, maxBucket: Int): DataFrame = {
    val strs = rows.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // D(s): s plus del-1, plus (k=2) del-1 of every del-1 variant —
    // duplicates collapsed ([[delVariants]]; its greatest(...,1)/CASE
    // guard keeps sequence() ascending for the empty string, whose only
    // variant is itself and folds into the base entry)
    val sigs = strs
      .select(col("id"), col("s"), length(col("s")).as("len"),
        explode(delVariants(k)).as("v"))
    val sc = rows.sparkSession.sparkContext
    val pref = if (sc.getCheckpointDir.isDefined) sigs.checkpoint()
               else sigs.localCheckpoint()
    requireNoOverflow(pref, Seq("v"), maxBucket, "symDeleteJoin")
    // safety brake, as everywhere: pre-counted, never list-built
    val ok = pref.groupBy("v").agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket)).select("v")
    val p = pref.join(ok, Seq("v"))
    p.as("a").join(p.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s"), k).as("dist"))
      .filter(col("dist").between(0, k))
      .distinct()
  }

  /** Two-table edit-distance LOOKUP (the record-linkage shape of
    * [[editDistanceJoin]]): every (probe, reference) pair within
    * Levenshtein ≤ k — match incoming typo'd names/titles/IDs against a
    * canonical table without the self-join's reflexive pairs. Same
    * deletion-neighborhood exactness theorem (ed(a,b) ≤ k ⟹ the
    * ≤k-deletion variant sets intersect), same banded verify; k ≤ 2
    * only (the lookup regime — for larger k the q-gram machinery of the
    * self-join applies, but a lookup that fuzzy is usually a modeling
    * smell). Output: (probe_id, ref_id, dist ≤ k), exact. */
  def editDistanceLookup(probe: DataFrame, probeId: String, probeStr: String,
                         ref: DataFrame, refId: String, refStr: String,
                         k: Int = 1, maxBucket: Int = 100000): DataFrame = {
    require(k >= 1 && k <= 2, s"editDistanceLookup supports k in 1..2, got $k")
    def sigs(df: DataFrame, id: String, str: String, side: String) = {
      val strs = df.select(col(id).as(s"${side}_id"), col(str).as("s"))
        .filter(col("s").isNotNull)
      strs.select(col(s"${side}_id"), col("s").as(s"${side}_s"),
        length(col("s")).as(s"${side}_len"),
        explode(delVariants(k)).as("v"))
    }
    val p = sigs(probe, probeId, probeStr, "probe")
    val r0 = sigs(ref, refId, refStr, "ref")
    val sc = probe.sparkSession.sparkContext
    val r = if (sc.getCheckpointDir.isDefined) r0.checkpoint()
            else r0.localCheckpoint()
    requireNoOverflow(r, Seq("v"), maxBucket, "editDistanceLookup")
    // brake on the REFERENCE side (the indexed one — a degenerate
    // variant bucket there multiplies every probe hitting it)
    val ok = r.groupBy("v").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket).select("v")
    p.join(r.join(ok, Seq("v")), Seq("v"))
      .filter(abs(col("probe_len") - col("ref_len")) <= k)
      .select(col("probe_id"), col("ref_id"),
        levenshtein(col("probe_s"), col("ref_s"), k).as("dist"))
      .filter(col("dist").between(0, k))
      .distinct()
  }

  /** ≤k-deletion variant set of column `s`, in-row (see
    * [[symDeleteJoin]]'s scaladoc for the exactness argument). */
  private def delVariants(k: Int): Column = {
    def del1(c: String): String =
      s"""transform(sequence(1, greatest(length($c), 1)),
         |  i -> CASE WHEN i <= length($c)
         |            THEN concat(substring($c, 1, i - 1),
         |                        substring($c, i + 1, length($c)))
         |            ELSE $c END)""".stripMargin
    if (k == 1) expr(s"array_distinct(concat(array(s), ${del1("s")}))")
    else expr(
      s"""array_distinct(concat(array(s), ${del1("s")},
         |  flatten(transform(${del1("s")}, v -> ${del1("v")}))))""".stripMargin)
  }

  /** q-gram prefix-filter edit-distance self-join — the general-k path
    * of [[editDistanceJoin]] (see its scaladoc for the filter theory). */
  private def qgramJoin(rows: DataFrame, idCol: String, strCol: String,
                        k: Int, q: Int, maxBucket: Int): DataFrame = {
    val strs = rows.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // positional q-grams tagged with their occurrence index, in-row:
    // gram i's occ = how many identical grams start before it. The
    // slice(.., greatest(.., 0)) trick yields an EMPTY array for len < q
    // without a CASE (sequence(1, 0) would count DOWN, not empty).
    val gramsExpr = expr(
      s"""slice(
         |  transform(sequence(1, greatest(length(s) - ${q - 1}, 1)),
         |    i -> struct(substring(s, i, $q) AS gram,
         |                size(filter(sequence(1, i), j ->
         |                  j < i AND substring(s, j, $q) = substring(s, i, $q)))
         |                  AS occ)),
         |  1, greatest(length(s) - ${q - 1}, 0))""".stripMargin)
    val sigd = strs
      .select(col("id"), length(col("s")).as("len"), gramsExpr.as("gs"))
      .select(col("id"), col("len"), size(col("gs")).as("sz"), col("gs"))
    val gd = sigd.select(col("id"), col("len"),
      explode(col("gs")).as("g")).select(col("id"), col("len"),
      col("g.gram").as("gram"), col("g.occ").as("occ"))
    val dfreq = gd.groupBy("gram", "occ").agg(count(lit(1)).as("df"))
    val prefLen = k * q + 1
    // postings CARRY the string: a prefix row is (id, len, s, gram, occ),
    // ~ (k·q+1)·N short rows — so candidates verify inline, no joins back
    // to the string table, and the expensive distinct runs AFTER the
    // levenshtein filter (output-sized, not candidate-sized). A pair
    // sharing multiple prefix grams is verified that many times — the
    // banded DP is cheaper than shuffling candidate-sized frames twice.
    val ranked = gd.join(dfreq, Seq("gram", "occ"))
      .groupBy("id")
      .agg(first(col("len")).as("len"),
        array_sort(collect_list(struct(col("df"), col("gram"), col("occ"))))
          .as("ord"))
      .join(strs, "id")
      .select(col("id"), col("len"), col("s"),
        explode(slice(col("ord"), 1, prefLen)).as("pt"))
      .select(col("id"), col("len"), col("s"),
        col("pt.gram").as("gram"), col("pt.occ").as("occ"))
    // pin the prefix postings: bucket pre-count + both self-join sides
    // (the allPairsJoin shared-frame rule)
    val sc = rows.sparkSession.sparkContext
    val pref = if (sc.getCheckpointDir.isDefined) ranked.checkpoint()
               else ranked.localCheckpoint()
    requireNoOverflow(pref, Seq("gram", "occ"), maxBucket, "editDistanceJoin")
    val ok = pref.groupBy("gram", "occ").agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket)).select("gram", "occ")
    val p = pref.join(ok, Seq("gram", "occ"))
    // levenshtein's threshold form runs the BANDED O(k·len) DP and
    // returns -1 above k — exact at ≤ k, which is all the filter reads
    val candPref = p.as("a").join(p.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s"), k).as("dist"))
    // both-short bucket: the gram filter is vacuous only here (see
    // scaladoc) — bounded cross-verify within the length filter
    val short = sigd.join(strs, "id")
      .filter(col("sz") <= k * q).select("id", "len", "s")
    val candShort = short.as("a").join(short.as("b"),
        col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s"), k).as("dist"))
    candPref.union(candShort)
      .filter(col("dist").between(0, k))
      .distinct()
  }
}
