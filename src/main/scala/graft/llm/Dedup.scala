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
  *  - all hashing is md5-derived (reproducible in any engine — the DuckDB
  *    oracle replicates each algorithm bit-for-bit);
  *  - all heavy lifting is exploded long-form + groupBy (map-side partial
  *    aggregation), no UDFs, no driver-side state.
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

  /** Distinct word n-grams per document: (doc_id, g). */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs
      .withColumn("tk", tokens(col("text")))
      .withColumn("g", explode(
        when(size(col("tk")) >= n,
          expr(s"transform(sequence(1, size(tk) - ${n - 1}), i -> " +
            (1 to n).map(j => s"element_at(tk, i + ${j - 1})").mkString("concat_ws(' ', ", ", ", ")") + ")"))
          .otherwise(array().cast(ArrayType(StringType)))))
    grams.select(col("doc_id"), col("g")).distinct()
  }

  /** Exact dedup: hash of normalized text → keep lowest doc_id per group.
    * Shuffles on the hash (bounded key), not the full text. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(lower(trim(col("text"))).cast(BinaryType)).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")

  /** Exact n-gram Jaccard near-dup pairs via an inverted index: join per
    * gram (postings capped at `maxDf` to bound skew — at corpus scale the
    * head grams carry no signal), count common grams, Jaccard from set
    * sizes. Output: (doc_a, doc_b, jaccard) with jaccard >= minJaccard. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.3,
                   maxDf: Long = 1000): DataFrame = {
    val grams = wordNgrams(docs, n)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Inverted index as ONE groupBy-per-gram posting list (was a window-count
    // + self-join: the join's two branches recompute the whole gram pipeline
    // because column pruning defeats ReuseExchange). Ordered pairs explode
    // from each posting list; `maxDf` both caps skew AND bounds the per-row
    // pair fan-out (a df-capped list explodes to at most maxDf² pairs).
    val common = grams.groupBy("g")
      .agg(collect_list("doc_id").as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
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

  /** MinHash signatures: k md5-seeded permutation mins over the distinct
    * n-gram set — ONE shuffle on doc_id, then the native single-pass
    * [[graft.functions.MinHash60]] expression (bit-identical to the k-pass
    * HOF/SQL formulation the oracle uses). Returns (doc_id, sig array<long>). */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int): DataFrame = {
    graft.functions.MinHash60.register(docs.sparkSession)
    wordNgrams(docs, n)
      .groupBy("doc_id").agg(collect_list("g").as("gs"))
      .select(col("doc_id"), expr(s"graft_minhash(gs, $k)").as("sig"))
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `k/bands` rows; docs sharing any band-hash become candidates; candidates
    * are verified with the exact n-gram Jaccard. The shuffle key is
    * (band index, band hash) — never all-pairs. */
  def minhashLsh(docs: DataFrame, n: Int = 3, k: Int = 12, bands: Int = 4,
                 minJaccard: Double = 0.5, maxBucket: Int = 10000): DataFrame = {
    val r = k / bands
    val sigs = minhashSignatures(docs, n, k)
    val banded = sigs.select(col("doc_id"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b as band, md5(array_join(transform(slice(sig, b * $r + 1, $r), x -> cast(x as string)), ',')) as bkey))")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // Candidates per LSH bucket via groupBy + ordered-pair explode (ONE
    // signature-pipeline pass — the former self-join recomputed it per branch;
    // ReuseExchange can't rescue a self-join whose branches prune differently).
    // A bucket with more than `maxBucket` members is degenerate (everything
    // near-dups everything); dropping it bounds the O(B²) fan-out — the skew
    // guard a 100 TB corpus needs against adversarial/boilerplate buckets.
    val cand = banded.groupBy("band", "bkey")
      .agg(collect_list("doc_id").as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(ds, a -> transform(filter(ds, b -> a < b), b -> struct(a as doc_a, b as doc_b))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard over the gram sets
    val grams = wordNgrams(docs, n)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = cand
      .join(grams.toDF("doc_a", "g"), "doc_a")
      .join(grams.toDF("doc_b", "g"), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    cand.join(common, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("common"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) /
          (col("sza") + col("szb") - col("common")).cast(DoubleType), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair graph via min-label propagation — each doc converges to the
    * smallest doc_id reachable from it. The step a production dedup
    * pipeline runs after pair generation (keep one doc per cluster).
    *
    * Iterative Spark shape: labels(doc) = min(label(doc), min over
    * neighbors) per round; `localCheckpoint` truncates the lineage each
    * round (20 rounds of joins would otherwise build an exponential plan),
    * and the loop stops when a round changes nothing. Convergence needs at
    * most diameter(graph) rounds; near-dup clusters are shallow. Returns
    * (doc_id, cluster). */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbr = edges.join(labels.select(col("doc_id").as("dst"), col("cluster").as("nc")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("nc").as("nbr"))
      // old label rides along so change detection is a filter over the
      // checkpointed frame, not another join
      val next = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"),
          col("cluster").as("__old__"))
        .localCheckpoint()
      changed = next.filter(col("cluster") =!= col("__old__")).count()
      labels = next.drop("__old__")
      iter += 1
    }
    labels
  }

  /** 60-bit SimHash over distinct word tokens; near-dup pairs via 4 bands of
    * 15 bits (any equal band → candidate) verified by Hamming distance. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    // One shuffle on doc_id, then ONE codegen'd pass over the token-hash
    // array maintaining all 60 bit counters (graft.functions.SimHash60).
    // Per-bit integer sums are order-independent: identical fingerprints to
    // the portable 60-pass HOF/SQL definition the oracle uses.
    graft.functions.SimHash60.register(docs.sparkSession)
    val toks = docs.withColumn("t", explode(array_distinct(tokens(col("text")))))
      .select(col("doc_id"), md5Hash60(col("t")).as("h"))
    toks.groupBy("doc_id").agg(collect_list("h").as("hs"))
      .select(col("doc_id"),
        expr(s"${graft.functions.SimHash60.FunctionName}(hs)").as("fp"))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 6, maxBucket: Int = 10000): DataFrame = {
    val fps = simhashFingerprints(docs)
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr("transform(sequence(0, 3), b -> struct(b as band, shiftright(fp, b * 15) & 32767 as bkey))")).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // bucket-groupBy pair generation (one fingerprint-pipeline pass;
    // maxBucket bounds degenerate-bucket fan-out). Pairs stream out of TWO
    // codegen'd explodes — an interpreted HOF pair-filter measured 1.7×
    // slower here (hot buckets: near-dup clusters make B² big for simhash).
    banded.groupBy("band", "bkey")
      .agg(collect_list(struct(col("doc_id"), col("fp"))).as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
      .select(col("ds"), explode(col("ds")).as("a"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
