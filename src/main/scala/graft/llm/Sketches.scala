package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable fixed-size sketches — the bounded-memory summaries a 100 TB
  * corpus pipeline runs on when exact state would be corpus-sized:
  *
  *  - Bloom-filter decontamination ([[decontaminateBloom]]): the benchmark
  *    gram set compressed to an `mBits`-slot bit set (32 KB at the default
  *    2^18 regardless of benchmark size) — the membership structure that
  *    stays broadcastable when the eval suite grows past what a distinct
  *    gram table can ship to every executor.
  *  - HyperLogLog distinct-count ([[hllEstimate]]): per-language distinct
  *    token estimates from 1024 one-byte registers per language; register
  *    build is a map-side-combinable MAX — no distinct, no vocab shuffle —
  *    and two shards' sketches merge by element-wise max ([[hllMerge]]),
  *    so a fleet of ingest jobs can each summarize their shard and a
  *    driver-side union-max yields the corpus cardinality.
  *  - Count-min frequency sketch ([[cmsCounters]] / [[cmsTopK]]): token
  *    frequencies folded into d×w counters (4×1024 by default) straight
  *    off the token stream — the groupBy key space is the COUNTER GRID,
  *    not the vocabulary, so the shuffle is 4096 rows at any corpus size
  *    and two shards' grids merge by cell-wise sum.
  *
  * All hashing is md5-derived (the [[Dedup.md5Hash60]] / shardAssign
  * convention) so every register, counter and bit position is bit-identical
  * in the DuckDB oracle. Estimates use single-division float arithmetic on
  * exactly-representable integer aggregates (register sums are kept as
  * scaled BIGINTs), so cross-engine float drift cannot enter before the
  * final rounded division.
  *
  * The reference server has no sketch surface (its whole function set is
  * rate/irate/sum/histogram_quantile, `query.rs:247-250`); these follow the
  * published constructions: Bloom (1970), Flajolet et al. 2007 (HLL),
  * Cormode & Muthukrishnan 2005 (CMS).
  */
object Sketches {

  /** 48-bit salted md5 hash — small enough that BIGINT↔DOUBLE casts can
    * never round it, large enough that salt families don't collide. */
  private def hash48(salt: String, c: Column): Column =
    conv(substring(md5(concat(lit(salt), c).cast(BinaryType)), 1, 12), 16, 10)
      .cast(LongType)

  // ------------------------------------------------------------- Bloom

  /** Distinct bit positions set by `bench`'s n-grams: k salted hashes per
    * distinct gram, each mod `mBits`. At most min(k·|grams|, mBits) rows —
    * the broadcastable form of the benchmark membership set. */
  def bloomBits(bench: DataFrame, n: Int = 5, k: Int = 4,
                mBits: Int = 1 << 18): DataFrame = {
    val grams = Dedup.rawNgrams(bench, n).select("g").distinct()
    grams
      .select(col("g"), explode(array((0 until k).map(lit): _*)).as("j"))
      .select((hash48("bloom:", concat(col("j").cast(StringType), lit(":"),
        col("g"))) % mBits).as("pos"))
      .distinct()
  }

  /** Bloom-filter decontamination: a corpus gram is flagged iff ALL k of
    * its bit positions are set in the benchmark's bloom bit set — no false
    * negatives (every true bench gram is flagged; exact-hit ⊆ bloom-hit),
    * false positives at the classic (1−e^{−kn/m})^k rate. Output is one
    * row per corpus doc: distinct-gram count, bloom-flagged gram count,
    * and the contamination verdict — the [[Curation.decontaminateAgainst]]
    * shape with the membership test swapped for the sketch.
    *
    * Scale: the bit set is bounded by mBits rows (a real deployment packs
    * it to mBits/8 bytes) and always broadcast; the corpus is scanned once
    * and every join key is gram- or doc-keyed. */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, n: Int = 5,
                         k: Int = 4, mBits: Int = 1 << 18): DataFrame = {
    val bits = bloomBits(bench, n, k, mBits).withColumn("__hit__", lit(1))
    val probeGrams = Dedup.rawNgrams(corpus, n)
      .select("doc_id", "g").distinct()
    val perGram = probeGrams
      .select(col("doc_id"), col("g"),
        explode(array((0 until k).map(lit): _*)).as("j"))
      .select(col("doc_id"), col("g"),
        (hash48("bloom:", concat(col("j").cast(StringType), lit(":"),
          col("g"))) % mBits).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy("doc_id", "g")
      .agg((count(col("__hit__")) === k).as("bloom_hit"))
    val agg = perGram.groupBy("doc_id").agg(
      count(lit(1)).as("n_grams"),
      count(when(col("bloom_hit"), 1)).as("n_hits"))
    corpus.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  // ------------------------------------------------------------- HLL

  /** HLL parameters: m = 1024 registers (p = 10), relative error
    * 1.04/√m ≈ 3.3%. The 60-bit gram hash splits into a 10-bit register
    * index and a 50-bit geometric draw. */
  val HllM = 1024
  private val HllMaxRank = 51 // 50-bit remainder all-zero → rank 51
  private val HllScale = 1L << HllMaxRank
  private val HllAlpha = 0.7213 / (1.0 + 1.079 / HllM)
  /** αm² · 2^51 — the estimate numerator, one double literal so the whole
    * estimate is a single cross-engine-deterministic division. */
  val HllNumerator: Double = HllAlpha * (HllM.toDouble * HllM) * HllScale

  /** Per-(group, register) max geometric rank over the token stream.
    * ρ = trailing-zero count of the 50-bit hash remainder + 1 — the same
    * geometric(1/2) law as Flajolet's leading-zero rank but computable
    * with exact integer ops in any engine (`bit_count((w & -w) - 1)`).
    * Duplicate tokens hash identically, so NO pre-distinct is needed: the
    * register build is one max-aggregate over ≤ m·|groups| keys, fully
    * map-side combined. */
  def hllRegisters(docs: DataFrame, groupCol: String = "lang"): DataFrame =
    hllRegistersOf(
      docs.select(col(groupCol), explode(Dedup.tokens(col("text"))).as("token")),
      groupCol)

  /** [[hllRegisters]] over a pre-exploded (groupCol, token) frame — the
    * SketchStore mutation paths tokenize the batch ONCE and feed every
    * token-consuming sketch from that pinned frame (r18 shared-frame
    * rule) instead of re-running tokenize+explode per sketch. */
  def hllRegistersOf(toks: DataFrame, groupCol: String = "lang"): DataFrame =
    toks
      .withColumn("__h__", Dedup.md5Hash60(concat(lit("hll:"), col("token"))))
      .select(col(groupCol), (col("__h__") % HllM).as("idx"),
        expr(s"__h__ div ${HllM}").as("__w__"))
      .withColumn("rho", expr(
        s"CASE WHEN __w__ = 0 THEN $HllMaxRank " +
          "ELSE CAST(bit_count((__w__ & -__w__) - 1) + 1 AS INT) END"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("mreg"))

  /** Merge two register frames (different shards of the same corpus) by
    * element-wise max — HLL's defining property: sketch(A ∪ B) =
    * merge(sketch(A), sketch(B)) exactly, regardless of overlap. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCol: String = "lang"): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("idx"))
      .agg(max(col("mreg")).as("mreg"))

  /** Cardinality estimate from a register frame, with the audit column an
    * exact distinct count. The register sum Σ2^(−M[j]) is carried as an
    * exact scaled BIGINT (Σ2^(51−M[j]), empty registers at 2^51), so the
    * only float op is the final single division + the small-range
    * `m·ln(m/V)` correction — both rounded to 6. */
  /** Cardinality estimates from a register frame alone — the store-side
    * form ([[SketchStore]]): no raw corpus needed. */
  def hllEstimateFromRegisters(regs: DataFrame, groupCol: String = "lang"): DataFrame =
    regs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__used__"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $HllMaxRank - mreg))")
          .as("__s_used__"))
      .withColumn("v_zero", (lit(HllM.toLong) - col("__used__")).cast(IntegerType))
      .withColumn("s_scaled",
        col("__s_used__") + col("v_zero").cast(LongType) * lit(HllScale))
      .withColumn("__e_raw__",
        lit(HllNumerator) / col("s_scaled").cast(DoubleType))
      .withColumn("est", round(
        when(col("__e_raw__") <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero").cast(DoubleType)))
          .otherwise(col("__e_raw__")), 6))
      .select(col(groupCol), col("v_zero"), col("s_scaled"), col("est"))

  def hllEstimate(docs: DataFrame, groupCol: String = "lang"): DataFrame = {
    val perGroup = hllEstimateFromRegisters(hllRegisters(docs, groupCol), groupCol)
    val exact = docs
      .select(col(groupCol), explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy(col(groupCol))
      .agg(countDistinct(col("token")).as("exact_distinct"))
    perGroup.join(exact, Seq(groupCol))
      .select(col(groupCol), col("v_zero"), col("s_scaled"), col("est"),
        col("exact_distinct"))
  }

  // ------------------------------------------------------- quantile bins

  /** HDR-histogram-style quantile sketch over a non-negative integer
    * column: each value collapses to its 2-significant-decimal-digit
    * lower bound (1234 → 1200) — computed with PURE STRING ops (digit
    * count + prefix + zero-pad), so the binning is bit-identical in any
    * engine, no float log in sight. Relative bin width ≤ 10%, and the
    * bin space is ≤ 90 bins per decimal order of magnitude, so the
    * per-group frame stays a few hundred rows no matter the corpus.
    * Bins merge by count sum (same law as [[cmsCounters]]). */
  def quantileBins(df: DataFrame, valueCol: String,
                   groupCol: String): DataFrame = {
    df
      .select(col(groupCol), col(valueCol).cast(LongType).as("__v__"))
      .withColumn("__s__", col("__v__").cast(StringType))
      .withColumn("bin", expr(
        "CAST(concat(substring(__s__, 1, 2), " +
          "repeat('0', greatest(length(__s__) - 2, 0))) AS BIGINT)"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Discrete quantile estimates from the bin frame: for q ∈ qs (percent),
    * the smallest bin whose cumulative count reaches ceil(q·n/100) — the
    * integer-arithmetic cutoff rule (`cum·100 ≥ q·n`), no float percentile
    * semantics to disagree on. The only window runs over ONE GROUP'S BINS
    * (≤ ~hundreds of rows — the [[Curation.mixByPerplexity]] threshold
    * shape), never over corpus rows; estimates are bin lower bounds, so
    * est ≤ true < est·1.1 for values ≥ 10. */
  def quantileEstimates(bins: DataFrame, groupCol: String,
                        qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
    val cum = bins
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    val ests = qs.map { q =>
      min(when(col("cum") * 100 >= lit(q) * col("n"), col("bin")))
        .as(s"p$q")
    }
    val aggCols = max(col("n")).as("n") +: ests
    cum.groupBy(col(groupCol)).agg(aggCols.head, aggCols.tail: _*)
  }

  /** One-call form over a document frame. */
  def quantileSketch(df: DataFrame, valueCol: String, groupCol: String,
                     qs: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantileEstimates(quantileBins(df, valueCol, groupCol), groupCol, qs)

  // ------------------------------------------------------------- CMS

  /** Count-min counter grid over the raw token stream: d salted rows ×
    * w columns. The aggregation key is the (row, column) CELL — d·w keys
    * total (4096 default) with map-side combine, so corpus size never
    * touches the shuffle. Two shards' grids merge by cell-wise sum. */
  /** The (row j, token) → column hash shared by grid build and lookups. */
  def cmsCell(j: Column, token: Column, w: Int): Column =
    hash48("cms:", concat(j.cast(StringType), lit(":"), token)) % w

  def cmsCounters(docs: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    cmsCountersOf(
      docs.select(explode(Dedup.tokens(col("text"))).as("token")), d, w)

  /** [[cmsCounters]] over a pre-exploded token frame (see
    * [[hllRegistersOf]]). */
  def cmsCountersOf(toks: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    toks
      .select(explode(array((0 until d).map(lit): _*)).as("j"), col("token"))
      .select(col("j"), cmsCell(col("j"), col("token"), w).as("c"))
      .groupBy("j", "c")
      .agg(count(lit(1)).as("cnt"))

  /** Heavy-hitter audit: the true top-`topK` tokens (count desc, token asc
    * — the [[Vocab]] rank rule) with their count-min estimates alongside.
    * CMS guarantees est ≥ true (hash collisions only ever ADD); the gap is
    * the collision mass in the token's minimum cell. The counter grid is
    * d·w rows and broadcast; only the model-sized top-K frame pays a sort. */
  def cmsTopK(docs: DataFrame, topK: Int = 20, d: Int = 4,
              w: Int = 1024): DataFrame = {
    val counters = cmsCounters(docs, d, w)
    val truth = docs
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("true_cnt"))
    // top-K via orderBy+limit, NOT a global row_number window: Spark plans
    // this as TakeOrderedAndProject — each partition keeps its local top-K
    // and the driver merges K-sized heaps — where the window form sorts
    // the ENTIRE vocabulary in one task (the frame here grows with corpus
    // vocabulary, not a knob; same (cnt desc, token asc) total order)
    val top = truth.orderBy(col("true_cnt").desc, col("token").asc)
      .limit(topK)
    top
      .select(col("token"), col("true_cnt"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .select(col("token"), col("true_cnt"), col("j"),
        cmsCell(col("j"), col("token"), w).as("c"))
      .join(broadcast(counters), Seq("j", "c"))
      .groupBy("token")
      .agg(max(col("true_cnt")).as("true_cnt"), min(col("cnt")).as("est_cnt"))
  }

  // ------------------------------------------------------------- KMV

  /** KMV parameters: k = 256 minima → relative error ~1/√(k−2) ≈ 6.3%;
    * hashes are the 60-bit md5 family, so the hash space M = 2^60. The
    * estimate numerator (k−1)·M is one double literal shared with the
    * oracle so the whole estimate is a single cross-engine division
    * (h > 2^53 rounds to double identically under IEEE nearest in both
    * engines before it). */
  val KmvK = 256
  val KmvSpace: Double = (1L << 60).toDouble
  val KmvNumerator: Double = (KmvK - 1).toDouble * KmvSpace

  /** K-minimum-values sketch per shard: a set's summary is its k SMALLEST
    * distinct element hashes (Bar-Yossef et al. RANDOM'02; Beyer et al.
    * SIGMOD'07). Unlike HLL it supports SET OPERATIONS directly:
    * K(A ∪ B) = k-smallest(K(A) ∪ K(B)) exactly (merge = union +
    * truncate — a fixed-size mergeable summary), and the inclusion ratio
    * ρ = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| estimates Jaccard without the
    * noisy inclusion-exclusion HLL needs for intersections.
    *
    * Scale shape: the distinct-(shard, hash) reduction is the one
    * corpus-sized shuffle (map-side combined). The k-minima then come from
    * a DECOMPOSED rank — rank within (shard, hash mod 256) salt buckets
    * first (256 parallel partitions per shard, each seeing ~1/256 of the
    * vocabulary), keep ≤ k, then a final rank over the ≤ 256·k survivors —
    * never a global per-shard sort ([[Curation.shardBalanced]]'s
    * two-phase rank law). Output: one row per shard, `hs` = sorted k-minima
    * (size < k iff the shard's whole distinct set fits — then exact). */
  def kmvSketch(elems: DataFrame, shardCol: String, elemCol: String,
                k: Int = KmvK): DataFrame = {
    val hashed = elems
      .select(col(shardCol).as("shard"),
        Dedup.md5Hash60(concat(lit("kmv:"), col(elemCol))).as("h"))
      .distinct()
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), pmod(col("h"), lit(256L))).orderBy("h")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy("h")
    hashed
      .withColumn("__r1__", row_number().over(w1)).filter(col("__r1__") <= k)
      .withColumn("__r2__", row_number().over(w2)).filter(col("__r2__") <= k)
      .groupBy("shard")
      .agg(array_sort(collect_list(col("h"))).as("hs"))
  }

  /** Distinct-cardinality estimate from a sorted k-minima array: exact
    * size when the set fit entirely, else (k−1)·M / h_k. */
  private def kmvEst(hs: Column, k: Int): Column =
    when(size(hs) < k, size(hs).cast(DoubleType))
      .otherwise(lit(KmvNumerator) / element_at(hs, k).cast(DoubleType))

  /** Shard-overlap report between the even- and odd-doc_id halves of the
    * corpus (token sets): distinct estimates per half, union estimate from
    * the MERGED sketch, Jaccard + intersection from the inclusion ratio —
    * plus exact audit columns (one extra aggregate at gate scale; at
    * 100 TB only the sketches run, and two ingest fleets can each ship
    * their k-minima for a driver-side merge). All estimate arithmetic is
    * divisions of exactly-agreed integers, rounded once at output. */
  def kmvOverlap(docs: DataFrame, k: Int = KmvK): DataFrame = {
    val tok = docs.select(
      when(col("doc_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
        .as("half"),
      explode(Dedup.tokens(col("text"))).as("token"))
    val sk = kmvSketch(tok, "half", "token", k)
      .agg(
        first(when(col("shard") === "even", col("hs")), ignoreNulls = true)
          .as("ha"),
        first(when(col("shard") === "odd", col("hs")), ignoreNulls = true)
          .as("hb"))
    val exact = tok
      .groupBy("token")
      .agg(max(col("half") === "even").as("__a__"),
        max(col("half") === "odd").as("__b__"))
      .agg(count(lit(1)).as("exact_union"),
        count(when(col("__a__") && col("__b__"), 1)).as("exact_inter"))
    val us = slice(array_sort(array_union(col("ha"), col("hb"))), 1, k)
    sk.crossJoin(exact) // 1×1 model frame
      .withColumn("__us__", us)
      .withColumn("__uest__", kmvEst(col("__us__"), k))
      .withColumn("__rho__",
        size(filter(col("__us__"), h =>
          array_contains(col("ha"), h) && array_contains(col("hb"), h)))
          .cast(DoubleType) / size(col("__us__")).cast(DoubleType))
      .select(
        lit(k).as("k"),
        round(kmvEst(col("ha"), k), 6).as("d_even"),
        round(kmvEst(col("hb"), k), 6).as("d_odd"),
        round(col("__uest__"), 6).as("union_est"),
        round(col("__rho__"), 6).as("jaccard_est"),
        round(col("__rho__") * col("__uest__"), 6).as("inter_est"),
        col("exact_union"), col("exact_inter"))
  }
}
