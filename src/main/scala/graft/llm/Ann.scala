package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (array<float>).
  *
  * - [[bruteTopK]]: exact cosine top-k of a small query set against the
  *   corpus — the baseline. The query set is broadcast; the corpus streams
  *   (never corpus × corpus).
  * - [[lshTopK]]: random-hyperplane LSH — vectors bucketed by the sign
  *   pattern of `planes` dot products; queries only compare within their
  *   bucket. The shuffle key is the bucket id: this is the 100 TB path.
  * - [[lshNearDup]]: embedding-cosine near-duplicate pairs within LSH
  *   buckets.
  *
  * Hyperplane components are md5-derived dyadic rationals
  * ((md5_16bit - 32768) / 65536), so any engine (incl. the DuckDB oracle)
  * reproduces them exactly.
  */
object Ann {

  val Dims = 64

  /** Deterministic hyperplane component in [-0.5, 0.5): exact in binary. */
  def planeComponent(plane: Int, dim: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$plane:$dim".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 4), 16)
    (v - 32768).toDouble / 65536.0
  }

  def planes(nPlanes: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, Dims)((p, d) => planeComponent(p, d))

  /** Cosine similarity between two array<float> columns as a strict
    * left-fold (deterministic order). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** LSH bucket id: bit b set iff dot(vec, plane_b) > 0. Plane indices are
    * offset by `planeOffset` so multiple independent tables draw distinct
    * hyperplanes from the same md5 stream. */
  def bucketId(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val comps = Array.tabulate(Dims)(d => planeComponent(planeOffset + p, d))
      val dotP = aggregate(
        zip_with(vec, lit(comps), (x, h) => x.cast(DoubleType) * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotP > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Johnson–Lindenstrauss-style random projection to `outDim` dimensions:
    * out_j = dot(vec, plane_{offset+j}) over the same deterministic
    * md5-derived hyperplane stream the LSH tables draw from (offset keeps
    * the draws independent). Pure in-row column arithmetic — map-only, zero
    * shuffle — the standard cheap pre-step that shrinks every downstream
    * ANN / clustering shuffle by Dims/outDim at corpus scale. The dot is a
    * strict left fold, so any engine replaying the same literal matrix in
    * order reproduces it bit-for-bit. */
  def project(df: DataFrame, outDim: Int, planeOffset: Int = 256): DataFrame = {
    val vec = col("embedding")
    val outs = (0 until outDim).map { j =>
      val comps = Array.tabulate(Dims)(d => planeComponent(planeOffset + j, d))
      val dotP = aggregate(
        zip_with(vec, lit(comps), (x, h) => x.cast(DoubleType) * h),
        lit(0.0), (acc, v) => acc + v)
      round(dotP, 6).as(s"p$j")
    }
    df.select(col("vec_id") +: outs: _*)
  }

  /** Multi-table LSH bucketing: one row per (vector, table). Single-table
    * LSH has near-zero recall on near-orthogonal vectors (one unlucky plane
    * kills the match); L independent tables of fewer planes union their
    * candidates — the standard recall/cost dial. Bucket ids run through the
    * codegen'd [[graft.functions.HyperplaneBucket]] expression (bit-identical
    * to [[bucketId]], asserted by LlmSpec). */
  def bucketTables(df: DataFrame, nTables: Int, planesPerTable: Int): DataFrame = {
    graft.functions.HyperplaneBucket.register(df.sparkSession)
    val fn = graft.functions.HyperplaneBucket.FunctionName
    val entries = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        expr(s"$fn(embedding, ${t * planesPerTable}, $planesPerTable)").as("bucket"))
    }
    df.withColumn("tb", explode(array(entries: _*)))
      .select(col("vec_id"), col("embedding"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** Codegen'd scoring expression (see [[graft.functions.CosineSimilarity]]);
    * bit-identical to [[cosine]] but runs as a primitive loop inside
    * whole-stage codegen instead of interpreted HOF lambdas. */
  private[llm] def nativeScore(df: DataFrame, a: String, b: String): Column = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    round(expr(s"${graft.functions.CosineSimilarity.FunctionName}($a, $b)"), 6)
  }

  /** Exact top-k neighbors of each query vector (cosine, self excluded,
    * ties broken by vec_id). Queries must be small (broadcast). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c").join(broadcast(queries.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        nativeScore(corpus, "q.embedding", "c.embedding").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein,
    * SIGIR 1998): greedily pick `k` of the `nCand` most-relevant candidates,
    * each pick maximizing
    *
    *   mmr(d) = λ·rel(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * (the empty-set penalty is 0, so pick 1 is the plain relevance argmax).
    * The standard redundancy filter over retrieval results — near-duplicate
    * neighbors of an already-picked doc are demoted so the k slots cover
    * the query's neighborhood instead of repeating its densest cluster.
    *
    * Scale shape: stage 1 is [[bruteTopK]]'s one corpus scan (swappable for
    * any ANN shortlist at corpus scale); everything after operates on
    * queries·nCand-row model frames — candidate vectors are fetched with
    * ONE broadcast semi-join against the corpus, the nCand² candidate-pair
    * cosines are computed ONCE, and the k−1 greedy steps are pure
    * relational ops (anti-join, max-aggregate, per-query argmax window)
    * over those bounded frames. Nothing downstream of stage 1 grows with
    * the corpus. Relevance and pair similarities are round-6; the
    * mmr objective itself is rounded at 7 decimals — λ·rel − (1−λ)·msim
    * over round-6 inputs lands EXACTLY on the 1e-7 grid, so rounding at 6
    * would sit on the half-up boundary every ~10th value and flip with
    * engine fp noise, while round-7 recovers the grid point
    * deterministically. Ranks break ties by (mmr desc, id asc), so any
    * engine replaying the same arithmetic reproduces the selection
    * exactly. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
              nCand: Int = 20, lambda: Double = 0.7): DataFrame = {
    val rel = bruteTopK(corpus, queries, nCand)
      .select(col("query_id"), col("neighbor_id"), col("score").as("rel"))
    // attach candidate vectors: broadcast the (queries·nCand)-row shortlist
    // against the corpus — one scan, never corpus×corpus. PINNED (eager
    // localCheckpoint): the greedy loop below references its descendants
    // 2× per step, which on raw lineage re-executes the corpus scans
    // 2^k times (measured: 16 s for the sf0.1 gate; 1-2 s pinned) — the
    // frame is queries·nCand rows, the knob-bounded model-frame class.
    val cand = corpus.as("c")
      .join(broadcast(rel.as("r")), col("r.neighbor_id") === col("c.vec_id"))
      .select(col("r.query_id"), col("r.neighbor_id"), col("r.rel"),
        col("c.embedding").as("cemb"))
      .localCheckpoint(true)
    // all candidate-pair cosines, once (≤ queries·nCand² rows, model-sized)
    val sims = cand.as("a").join(cand.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.neighbor_id") =!= col("b.neighbor_id"))
      .select(col("a.query_id"), col("a.neighbor_id").as("i"),
        col("b.neighbor_id").as("j"),
        nativeScore(cand, "a.cemb", "b.cemb").as("sim"))
      .localCheckpoint(true)
    val slim = cand.select("query_id", "neighbor_id", "rel")
    val byMmr = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("mmr").desc, col("neighbor_id").asc)
    // pick 1: relevance argmax (empty selected set ⇒ penalty 0)
    var sel = slim
      .withColumn("mmr", round(lit(lambda) * col("rel"), 7))
      .withColumn("__rk__", row_number().over(byMmr)).filter(col("__rk__") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel"), col("mmr"),
        lit(1).as("pick"))
    for (step <- 2 to k) {
      val remaining = slim.join(sel.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      val penalized = remaining.as("r")
        .join(sims.as("p"), col("p.query_id") === col("r.query_id") &&
          col("p.i") === col("r.neighbor_id"))
        .join(sel.select(col("query_id").as("sq"), col("neighbor_id").as("sn")),
          col("sq") === col("r.query_id") && col("p.j") === col("sn"))
        .groupBy(col("r.query_id").as("query_id"),
          col("r.neighbor_id").as("neighbor_id"), col("r.rel").as("rel"))
        .agg(max(col("p.sim")).as("msim"))
      val next = penalized
        .withColumn("mmr",
          round(lit(lambda) * col("rel") - (lit(1.0) - lit(lambda)) * col("msim"), 7))
        .withColumn("__rk__", row_number().over(byMmr)).filter(col("__rk__") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel"), col("mmr"),
          lit(step).as("pick"))
      // pin each step's ≤ queries·step-row selection — sel feeds two joins
      // in the next step, and unpinned lineage doubles per level
      sel = sel.unionByName(next).localCheckpoint(true)
    }
    sel
  }

  /** LSH-bucketed top-k: candidates restricted to vectors sharing any of the
    * query's per-table buckets (shuffle key = (table, bucket)). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nTables: Int = 8, planesPerTable: Int = 4): DataFrame = {
    val bucketed = bucketTables(corpus, nTables, planesPerTable)
    val qb = bucketTables(queries, nTables, planesPerTable)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("tbl"), col("bucket"))
    val cand = bucketed.as("c").join(broadcast(qb.as("q")),
        col("q.tbl") === col("c.tbl") && col("q.bucket") === col("c.bucket") &&
          col("q.qid") =!= col("c.vec_id"))
      .select(col("q.qid").as("query_id"), col("q.qemb").as("qemb"),
        col("c.vec_id").as("neighbor_id"), col("c.embedding").as("cemb"))
      .distinct() // a candidate may collide in several tables
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      nativeScore(corpus, "qemb", "cemb").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** Deterministic seed centroids: the first `nCentroids` corpus vectors. */
  private[llm] def seedCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  /** Farthest-point (max-min cosine) seeding over a small deterministic
    * candidate pool — the k-means++-style spread that fixes the weakness of
    * first-N seeding (centroids bunched wherever the first rows happen to
    * lie). The pool (first `poolFactor × nCentroids` vectors) is collected
    * and the greedy scan runs driver-side: pool × Dims floats is model-fit
    * territory, one bounded collect regardless of corpus size. Centroid ids
    * are renumbered 0..n-1 in selection order, so downstream tie-breaks stay
    * deterministic. */
  def spreadCentroids(corpus: DataFrame, nCentroids: Int, poolFactor: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val pool = corpus.filter(col("vec_id") < (nCentroids.toLong * poolFactor))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
    val maxSim = scala.collection.mutable.ArrayBuffer.tabulate(pool.length)(i => cos(pool(i)._2, pool.head._2))
    while (chosen.length < math.min(nCentroids, pool.length)) {
      // the candidate whose NEAREST chosen centroid is farthest (min max-sim)
      var best = -1; var bestSim = Double.MaxValue
      var i = 0
      while (i < pool.length) {
        if (maxSim(i) < bestSim && !chosen.exists(_._1 == pool(i)._1)) { bestSim = maxSim(i); best = i }
        i += 1
      }
      chosen += pool(best)
      var j = 0
      while (j < pool.length) {
        val s = cos(pool(j)._2, pool(best)._2)
        if (s > maxSim(j)) maxSim(j) = s
        j += 1
      }
    }
    import spark.implicits._
    chosen.zipWithIndex.map { case ((_, emb), i) => (i.toLong, emb) }.toSeq
      .toDF("cent_id", "cent_emb")
  }

  /** Assign each vector to its `n` best centroids (max cosine, min centroid
    * id on ties). Centroids broadcast; the corpus streams. */
  private[llm] def assignTo(df: DataFrame, cents: DataFrame, n: Int): DataFrame =
    df.crossJoin(broadcast(cents))
      .withColumn("csim", expr("graft_cosine(embedding, cent_emb)"))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("rk") <= n)
      .select(col("vec_id"), col("embedding"), col("cent_id"))

  /** Spherical-k-means refinement of the seed centroids: `iters` Lloyd
    * rounds of assign → element-wise mean. The mean is 64 declarative `avg`
    * aggregates in ONE map-side-combined groupBy — no posexplode (which
    * would shuffle Dims× the corpus). Cosine assignment doesn't need the
    * mean normalized, and the result is cast back to float so the codegen'd
    * scorer applies unchanged. Empty clusters keep their previous centroid.
    * The final centroid table is collected (≤ nCentroids × Dims floats — a
    * model parameter, like any k-means fit) so downstream plans embed a
    * literal local relation instead of re-running the fit per use. */
  def lloydCentroids(corpus: DataFrame, seed: DataFrame, iters: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    var cents = seed
    for (_ <- 0 until iters) {
      val assigned = assignTo(corpus, cents, 1)
      val meanCols = (1 to Dims).map(i =>
        avg(element_at(col("embedding"), i).cast(DoubleType)).as(s"__m$i"))
      val means = assigned.groupBy("cent_id").agg(meanCols.head, meanCols.tail: _*)
        .select(col("cent_id"),
          array((1 to Dims).map(i => col(s"__m$i").cast(FloatType)): _*).as("new_emb"))
      cents = cents.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("new_emb"), col("cent_emb")).as("cent_emb"))
    }
    if (iters == 0) cents
    else {
      val spark = corpus.sparkSession
      val schema = StructType(Seq(StructField("cent_id", LongType),
        StructField("cent_emb", ArrayType(FloatType))))
      spark.createDataFrame(java.util.Arrays.asList(cents.collect(): _*), schema)
    }
  }

  /** IVF-style top-k: vectors are assigned to their `multiAssign` nearest
    * centroids (deterministic tie-break on centroid id); queries probe the
    * `nprobe` nearest centroid lists only. Shuffle key = centroid id.
    *
    * Defaults (128 cents, nprobe 4, assign 2) come from the AnnSweep
    * recall/cost table (SURVEY §6): recall@5 = 0.988 while scoring
    * ~nprobe·multiAssign/nCentroids ≈ 6% of the corpus per query — list
    * REPLICATION is the measured lever (a vector near a cell boundary lives
    * in both adjacent lists, so the probe that lands on either side finds
    * it), worth far more per candidate than probing additional lists.
    * The refinement options measured WORSE on the synthetic corpus and are
    * off by default, kept because their value is corpus-dependent:
    * `lloydIters` (spherical k-means rounds, [[lloydCentroids]]) pulls
    * centroids into dense regions (0.708 → 0.686 at 64/4/1×); `spreadSeed`
    * (farthest-point, [[spreadCentroids]]) seeds on outliers (→ 0.354).
    * At corpus scale, grow nCentroids ~√N to keep list sizes (and per-probe
    * cost) bounded; multiAssign multiplies index size, not query cost at
    * fixed candidate budget. The oracle gate query pins lloydIters = 0 /
    * spreadSeed = false / multiAssign = 1: first-N seeds are
    * SQL-reproducible, a distributed float mean is not hash-stable across
    * engines. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 128, nprobe: Int = 4, lloydIters: Int = 0,
              spreadSeed: Boolean = false, multiAssign: Int = 2): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val seed =
      if (spreadSeed) spreadCentroids(corpus, nCentroids)
      else seedCentroids(corpus, nCentroids)
    val cents =
      if (lloydIters <= 0) seed
      else lloydCentroids(corpus, seed, lloydIters)

    val lists = assignTo(corpus, cents, multiAssign)
    val probes = assignTo(queries, cents, nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("cent_id"))

    val scored0 = lists.as("c").join(broadcast(probes.as("q")),
        col("q.cent_id") === col("c.cent_id") && col("q.qid") =!= col("c.vec_id"))
      .select(col("q.qid").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(expr("graft_cosine(q.qemb, c.embedding)"), 6).as("score"))
    // with multiAssign = 1 every corpus vector lives in exactly one list and
    // pairs are unique by construction; replicated lists need the dedup
    val scored = if (multiAssign <= 1) scored0 else scored0.distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** Product-quantization top-k (IVF-PQ's compression half): split the
    * `Dims`-dim space into `m` subspaces, quantize each subvector to one of
    * `codebookSize` sub-centroids, and score queries against CODES — the
    * asymmetric-distance (ADC) search that makes billion-vector indexes
    * fit in memory.
    *
    * 100 TB story: a vector shrinks from Dims·4 bytes to m bytes (64-dim
    * float → 8 bytes at the defaults, 32×), and per-candidate scoring
    * drops from a Dims-mult dot product to m table lookups. The codebook
    * (m · codebookSize subvectors) is a BOUNDED model fit — first-K
    * seeding, the same SQL-reproducible convention the IVF gate pins
    * (a Lloyd-refined codebook via [[lloydCentroids]]'s pattern is the
    * production refinement; first-K keeps the oracle exact). Encoding is
    * one broadcast join + two bounded groupBys, scoring one broadcast
    * crossJoin + the top-k window — at scale you compose with IVF list
    * pruning so the crossJoin sees candidates, not the corpus.
    *
    * Distance = summed per-subspace L2²; ranked ascending on the rounded
    * distance with neighbor_id tie-break (rounding first keeps the rank
    * reproducible across engines). */
  /** `normalize = true` L2-normalizes vectors before quantization, making
    * PQ's L2 ranking cosine-equivalent (2 - 2cos) for corpora that are NOT
    * pre-normalized (the synthetic corpus already is — measured no-op
    * there, norms ∈ [1 ± 1e-7]). `codebookIters > 0` Lloyd-refines the
    * codebook per subspace (k-means on subvectors — the production
    * refinement; the SURVEY §6 sweep measured +0.15 recall@5 over first-K
    * seeding at m=8×16, which is why 3 is the library DEFAULT).
    * The GATE queries pin normalize = false / codebookIters = 0
    * explicitly: both knobs put cross-engine float sums upstream of the
    * argmin, and oracle hash stability beats recall there. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, codebookSize: Int = 16,
             normalize: Boolean = false, codebookIters: Int = 3): DataFrame = {
    val cb = pqCodebook(corpus, m, codebookSize, normalize, codebookIters)
    val codes = pqCodes(corpus, cb, m, normalize)
    val dtab = pqQueryTable(queries, cb, m, codebookSize, normalize)
    // ADC against EVERY code vector: correct, and fine as the small-query
    // gate baseline, but the candidate set is the whole corpus — at scale
    // use [[ivfPqTopK]], which prunes candidates to the probed IVF lists.
    val scored = codes.as("c").join(broadcast(dtab.as("q")),
        col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id").as("neighbor_id"),
        adcDistance(col("q.dtab"), col("c.codes"), m, codebookSize).as("dist"))
    pqRank(scored, k)
  }

  /** Split every vector into its `m` subvectors: (idCol, sub, sv). */
  private def pqSubs(df: DataFrame, idCol: String, m: Int,
                     normalize: Boolean): DataFrame = {
    require(Dims % m == 0, s"m=$m must divide Dims=$Dims")
    val w = Dims / m
    val scaled =
      if (!normalize) df
      else df.withColumn("embedding", transform(col("embedding"), x =>
        (x.cast(DoubleType) / sqrt(aggregate(col("embedding"), lit(0.0),
          (a, y) => a + y.cast(DoubleType) * y.cast(DoubleType)))).cast(FloatType)))
    scaled
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col("vec_id").as(idCol), col("sub"),
        slice(col("embedding"), col("sub") * w + 1, lit(w)).as("sv"))
  }

  /** L2² between float subvectors, computed in doubles, fixed fold order. */
  private def subDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast(DoubleType) - y.cast(DoubleType)) *
        (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, d) => acc + d)

  /** The (sub, code, cv) codebook: first-`codebookSize` seeding (the
    * SQL-reproducible gate convention), optionally Lloyd-refined per
    * subspace — assign every subvector to its nearest code, recompute codes
    * as element-wise means (posexplode + one bounded groupBy per iteration);
    * codes that lose all members keep their old position. */
  private[llm] def pqCodebook(corpus: DataFrame, m: Int, codebookSize: Int,
                         normalize: Boolean, codebookIters: Int): DataFrame = {
    val cb0 = pqSubs(corpus.filter(col("vec_id") < codebookSize), "code", m, normalize)
      .select(col("code").cast(IntegerType).as("code"), col("sub"),
        col("sv").as("cv"))
    if (codebookIters <= 0) return cb0
    val corpusSubs = pqSubs(corpus, "vec_id", m, normalize)
    (1 to codebookIters).foldLeft(cb0) { (cur, _) =>
      val d = corpusSubs.join(broadcast(cur), "sub")
        .select(col("vec_id"), col("sub"), col("code"),
          subDist(col("sv"), col("cv")).as("d"))
      val best = d.groupBy("vec_id", "sub")
        .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      val means = corpusSubs.join(best, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(avg(col("x").cast(DoubleType)).as("mx"))
        .groupBy("sub", "code")
        .agg(sort_array(collect_list(struct(col("pos"), col("mx")))).as("ps"))
        .select(col("sub"), col("code"),
          transform(col("ps"), p => p("mx").cast(FloatType)).as("ncv"))
      cur.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"), coalesce(col("ncv"), col("cv")).as("cv"))
    }
  }

  /** Encode the corpus: per (vec, sub) the closest code in ONE aggregation —
    * min over struct(d, code) orders lexicographically in both engines
    * (smallest code wins ties), so the corpus is scanned once, no
    * min-join-back second pass. Output: (vec_id, codes array<int>[m]). */
  private[llm] def pqCodes(corpus: DataFrame, cb: DataFrame, m: Int,
                      normalize: Boolean): DataFrame =
    pqSubs(corpus, "vec_id", m, normalize).join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"), col("code"),
        subDist(col("sv"), col("cv")).as("d"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub"),
        col("best").getField("code").as("code")))).as("cs"))
      .select(col("vec_id"), transform(col("cs"), c => c("code")).as("codes"))

  /** Per-query ADC distance table to every (sub, code), flattened
    * sub-major: (query_id, dtab array<double>[m·codebookSize]).
    *
    * The table is SLOT-DENSE by construction (scatter through a slot-keyed
    * map into a fixed m·codebookSize array), not a positional collect: a
    * trained codebook may hold FEWER than codebookSize codes for a sub —
    * k-means drops empty cells on duplicate-heavy corpora, the exact shape
    * a replicated crawl has — and a positional table would shift every
    * lookup after the first gap ([[adcDistance]] indexes by slot
    * arithmetic; the factor-10 StoreScale lifecycle crashed on this).
    * Gap slots carry a NaN sentinel: no stored code ever references them
    * ([[pqCodes]] assigns from the same codebook), so a NaN in a distance
    * sum means a code/codebook mismatch and poisons that rank visibly
    * instead of silently scoring with a shifted table. */
  private[llm] def pqQueryTable(queries: DataFrame, cb: DataFrame, m: Int,
                           codebookSize: Int, normalize: Boolean): DataFrame =
    pqSubs(queries, "query_id", m, normalize).join(broadcast(cb), "sub")
      .select(col("query_id"),
        (col("sub") * codebookSize + col("code")).as("slot"),
        subDist(col("sv"), col("cv")).as("qd"))
      .groupBy("query_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("slot"), col("qd"))))).as("dm"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m * codebookSize - 1)),
          s => coalesce(element_at(col("dm"), s), lit(Double.NaN)))
          .as("dtab"))

  /** ADC: m table lookups per (query, candidate), rounded so the rank is
    * reproducible across engines. */
  private[llm] def adcDistance(dtab: Column, codes: Column, m: Int,
                          codebookSize: Int): Column =
    round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(dtab,
        (s * codebookSize + element_at(codes, s + 1) + 1)
          .cast(IntegerType))), 6)

  private[llm] def pqRank(scored: DataFrame, k: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "dist", "rn")
  }

  /** Scalar quantization (SQ8 — the FAISS ScalarQuantizer contract, the
    * training-free end of the compression spectrum): every dimension i
    * gets a [mn_i, mx_i] range from ONE corpus aggregate, each float32
    * collapses to an 8-bit level `code = min(levels−1, ⌊(x−mn_i)/step_i⌋)`
    * with `step_i = (mx_i−mn_i)/levels`, and search scores the RAW query
    * against level-midpoint reconstructions `mn_i + (code+½)·step_i` —
    * asymmetric distance (ADC), summed L2², rounded 6, ranked ascending
    * with neighbor_id tie-break (the [[pqRank]] contract).
    *
    * vs PQ (26d): SQ keeps full per-dimension resolution at 1 byte/dim
    * (4× smaller than float32) with NO codebook training — the "model"
    * is two Dims-length extrema arrays, so index build is one scan and
    * decode is pure arithmetic (no codebook broadcast into the scoring
    * join). PQ compresses harder (m bytes/vector) but pays a trained
    * codebook and loses within-subspace resolution. The family now
    * spans brute (exact) / LSH+IVF (pruning) / SQ+PQ (compression) /
    * IVF×PQ(+R) (composition).
    *
    * Determinism: mn/mx are exact float32 extrema (min/max reorder
    * freely); the code arithmetic is a chain of single IEEE double ops
    * (sub, div, floor — each correctly rounded, no sum to reorder), so
    * codes are bit-identical across engines and only the final L2² sum
    * needs the round-6 guard.
    *
    * Scale: stats = one map-side-combined groupBy on Dims keys; encode =
    * pure map (the stored index is levels-ary codes, 1 byte/dim); the
    * gate baseline then scores the whole corpus against the broadcast
    * query set exactly like [[pqTopK]] — at scale compose with IVF list
    * pruning (the [[ivfPqTopK]] shape) so only probed lists decode. */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             levels: Int = 256): DataFrame = {
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast(DoubleType)).as("mn"),
        max(col("x").cast(DoubleType)).as("mx"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("ps"))
      .select(transform(col("ps"), p => p("mn")).as("mns"),
        transform(col("ps"), p => p("mx")).as("mxs"))
    def mn(i: Column) = element_at(col("mns"), i + 1)
    def step(i: Column) =
      (element_at(col("mxs"), i + 1) - mn(i)) / lit(levels.toDouble)
    val codes = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        zip_with(col("embedding"), sequence(lit(0), lit(Dims - 1)), (x, i) =>
          when(step(i) === 0.0, lit(0L)).otherwise(
            least(lit((levels - 1).toLong),
              floor((x.cast(DoubleType) - mn(i)) / step(i)).cast(LongType))))
          .as("codes"))
    val scored = codes.as("c")
      .join(broadcast(queries.select(col("vec_id"), col("embedding")).as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .crossJoin(broadcast(stats))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(aggregate(
          zip_with(col("q.embedding"),
            zip_with(col("c.codes"), sequence(lit(0), lit(Dims - 1)), (c, i) =>
              mn(i) + (c.cast(DoubleType) + lit(0.5)) * step(i)),
            (qx, r) => (qx.cast(DoubleType) - r) * (qx.cast(DoubleType) - r)),
          lit(0.0), (acc, d) => acc + d), 6).as("dist"))
    pqRank(scored, k)
  }

  /** IVF×PQ — the composition that makes a billion-vector index real: IVF
    * list pruning picks WHICH vectors to score (candidates ≈
    * nprobe·multiAssign/nCentroids of the corpus), PQ ADC decides HOW each
    * candidate is scored (m byte-code lookups against a per-query table
    * instead of a Dims-mult dot product on the raw floats).
    *
    * Plan shape: corpus → IVF lists (one shuffle on cent_id via the
    * assignment window) joined to its PQ codes on vec_id; the query side —
    * probes ⋈ per-query distance tables — is tiny and BROADCAST, so
    * scoring is a broadcast HASH join keyed on cent_id (the fix for
    * [[pqTopK]]'s full-corpus nested-loop scan). At 100 TB the code table
    * (m bytes/vector) is the only per-vector state the scoring join
    * touches; raw embeddings never leave the encode stage.
    *
    * The GATE queries pin first-N centroid seeding, first-K codebook,
    * codebookIters = 0 — every float the oracle must reproduce is a
    * deterministic literal. The library DEFAULT refines the codebook
    * (codebookIters = 3, the measured +0.15 recall@5 from the §6 sweep);
    * production knobs (lloydIters on either half, normalize, multiAssign)
    * compose exactly as in the halves. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 128, nprobe: Int = 4, multiAssign: Int = 2,
                m: Int = 8, codebookSize: Int = 16,
                normalize: Boolean = false, codebookIters: Int = 3): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val cents = seedCentroids(corpus, nCentroids)
    val lists = assignTo(corpus, cents, multiAssign).select("vec_id", "cent_id")
    val cb = pqCodebook(corpus, m, codebookSize, normalize, codebookIters)
    val codes = pqCodes(corpus, cb, m, normalize)
    val listCodes = lists.join(codes, "vec_id")
    val probes = assignTo(queries, cents, nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"))
    val qside = probes.join(pqQueryTable(queries, cb, m, codebookSize, normalize),
      "query_id")
    val scored0 = listCodes.as("c").join(broadcast(qside.as("q")),
        col("q.cent_id") === col("c.cent_id") && col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id").as("neighbor_id"),
        adcDistance(col("q.dtab"), col("c.codes"), m, codebookSize).as("dist"))
    // multiAssign > 1 replicates a vector into several lists, so a (query,
    // candidate) pair can reappear through each shared list; nprobe alone
    // cannot duplicate (a vector is in exactly one list at multiAssign = 1)
    val scored = if (multiAssign <= 1) scored0 else scored0.distinct()
    pqRank(scored, k)
  }

  /** PQ / IVF×PQ over OPQ-rotated vectors — [[Pca.fitOpq]]'s full-rank
    * PCA + eigenvalue-allocation rotation applied to corpus and queries
    * BEFORE quantization (Ge et al.'s parametric OPQ). An orthogonal
    * rotation preserves every pairwise L2 distance, so the ranking metric
    * is unchanged; what moves is where the quantizer's error lands —
    * decorrelated, variance-balanced subspaces quantize tighter at the
    * SAME m·log2(codebookSize) bits/vector, which is the whole lever
    * (the §6 sweep showed PQ quantization error is the recall ceiling).
    * The rotation is fit on the corpus only (queries are rotated with the
    * frozen model — the [[AnnIndex]] frozen-model rule), and both paths
    * downstream are byte-for-byte the unrotated operators. */
  def opqPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                m: Int = 8, codebookSize: Int = 16,
                pcaIters: Int = 4, codebookIters: Int = 3): DataFrame = {
    val model = Pca.fitOpq(corpus, m, pcaIters)
    pqTopK(Pca.rotate(corpus, model), Pca.rotate(queries, model), k,
      m, codebookSize, normalize = false, codebookIters = codebookIters)
  }

  /** [[ivfPqTopK]] with the OPQ rotation ahead of BOTH the coarse
    * quantizer and the codebook — the composed production shape. */
  def opqIvfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   nCentroids: Int = 128, nprobe: Int = 4,
                   multiAssign: Int = 2, m: Int = 8, codebookSize: Int = 16,
                   pcaIters: Int = 4, codebookIters: Int = 3): DataFrame = {
    val model = Pca.fitOpq(corpus, m, pcaIters)
    ivfPqTopK(Pca.rotate(corpus, model), Pca.rotate(queries, model), k,
      nCentroids, nprobe, multiAssign, m, codebookSize,
      normalize = false, codebookIters = codebookIters)
  }

  /** IVF×PQ with exact re-ranking — the standard production recall
    * recovery (Jégou et al.'s IVFADC+R): the compressed index picks a
    * `rerank`-sized shortlist per query (cheap, m-byte codes), then the
    * shortlist alone is re-scored with exact cosine on the raw vectors
    * and the top `k` of THAT ordering is returned. Recall approaches the
    * raw-vector IVF number while the exact math touches only
    * queries·rerank vectors instead of the corpus.
    *
    * Plan shape: everything in [[ivfPqTopK]] unchanged; the re-rank adds
    * one broadcast hash join (shortlist ⋈ corpus on vec_id — the
    * shortlist side is queries·rerank rows, always the broadcast side)
    * and a queries-keyed window. The corpus-side raw-vector fetch is the
    * only full-width read, and it is hash-pruned to shortlist members. */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      rerank: Int = 50,
                      nCentroids: Int = 128, nprobe: Int = 4,
                      multiAssign: Int = 2, m: Int = 8,
                      codebookSize: Int = 16, normalize: Boolean = false,
                      codebookIters: Int = 3): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val shortlist = ivfPqTopK(corpus, queries, rerank, nCentroids, nprobe,
        multiAssign, m, codebookSize, normalize, codebookIters)
      .select(col("query_id"), col("neighbor_id"))
    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qemb"))
    val sl = shortlist.join(qe, "query_id")
    val scored = corpus.as("c").join(broadcast(sl.as("s")),
        col("s.neighbor_id") === col("c.vec_id"))
      .select(col("s.query_id").as("query_id"),
        col("s.neighbor_id").as("neighbor_id"),
        nativeScore(corpus, "s.qemb", "c.embedding").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** Embedding-cosine near-duplicate pairs within multi-table LSH buckets.
    * Candidate pairs come from a per-bucket groupBy + ordered-pair explode
    * (one bucketing-pipeline pass — a self-join would recompute it per
    * branch); `maxBucket` bounds the O(B²) fan-out of degenerate buckets. */
  def lshNearDup(corpus: DataFrame, minCosine: Double,
                 nTables: Int = 8, planesPerTable: Int = 4,
                 maxBucket: Int = 10000): DataFrame = {
    val bucketed = bucketTables(corpus, nTables, planesPerTable)
    // Pre-count bucket sizes and keep only in-cap buckets BEFORE any
    // member list is built (the dedupNgram/semDedup two-pass shape): a
    // degenerate bucket shared by 10⁸ boilerplate vectors is dropped by a
    // map-side-combinable counter, never accumulated as a multi-GB
    // aggregation buffer.
    val ok = bucketed.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("__c__"))
      .filter(col("__c__").between(2, maxBucket))
      .select("tbl", "bucket")
    // Score each co-bucketed pair BEFORE the cross-table distinct: the
    // cosine is a deterministic pure function of the two vectors, so
    // dedup-on-(ids, cos) equals dedup-then-score — but the exchange now
    // carries (long, long, double) instead of two 64-float embeddings
    // per row, ~40× fewer shuffle bytes (guide §2.3: shuffle keys and
    // small derived values, not payloads). A pair sharing k tables pays
    // k-1 redundant 64-dim dot products map-side — microseconds against
    // the kilobytes it no longer shuffles.
    bucketed.join(ok, Seq("tbl", "bucket"))
      .groupBy("tbl", "bucket")
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ds"))
      .select(explode(expr(
        "flatten(transform(ds, a -> transform(filter(ds, b -> a.vec_id < b.vec_id), " +
          "b -> struct(a.vec_id as vec_a, a.embedding as aemb, b.vec_id as vec_b, b.embedding as bemb))))")).as("p"))
      .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        nativeScore(corpus, "p.aemb", "p.bemb").as("cos"))
      .distinct()
      .filter(col("cos") >= minCosine)
  }

  /** Contrastive hard-negative mining (the DPR / SimCSE / E5 training-pair
    * builder — for each anchor, the most-similar corpus vectors that are
    * NOT near-duplicates): candidate pairs come from the [[lshNearDup]]
    * multi-table buckets (so candidates are already the LSH-nearest slice
    * of the corpus — exactly where hard negatives live — and the pair
    * budget is the bucketed one, never all-pairs), each pair symmetrized
    * so both endpoints serve as anchors; candidates at round-6 cosine ≥
    * `posTau` are POSITIVES (near-dup territory — training on them as
    * negatives would teach the encoder to separate paraphrases) and are
    * excluded; the rest rank per anchor by (cos desc, cand_id asc), top
    * `kNeg` kept.
    *
    * Scale shape: one bucketing pass + the in-cap pair explode
    * ([[lshNearDup]]'s, with the pre-counted bucket guard); symmetrize is
    * an in-row 2-element explode over the pair list (NOT a self-union,
    * which would re-evaluate the whole bucketing+cosine subtree twice);
    * the per-anchor window partition is the anchor's bucket-candidate
    * set — bounded by tables × maxBucket. Output: (anchor_id, cand_id,
    * cos, rk).
    *
    * `maxBucket` defaults to the dedup family's 1000 — TIGHTER than
    * [[lshNearDup]]'s own default, because mining scores EVERY co-bucketed
    * pair (minCosine = −1, no early cosine cut): the worst-case pair
    * budget is nTables × C(maxBucket, 2) ≈ 4·10⁶ at 1000 vs ~4·10⁸ at
    * 10000. A bucket that big is boilerplate/degenerate territory anyway —
    * its members are no one's informative hard negatives; raise the cap
    * explicitly if a coarse LSH (few planes) over a huge corpus makes
    * large buckets legitimate, and budget nTables·maxBucket²/2 pairs. */
  def hardNegatives(corpus: DataFrame, kNeg: Int = 5, posTau: Double = 0.9,
                    nTables: Int = 8, planesPerTable: Int = 4,
                    maxBucket: Int = 1000): DataFrame = {
    val pairs = lshNearDup(corpus, -1.0, nTables, planesPerTable, maxBucket)
    val sym = pairs.select(explode(array(
        struct(col("vec_a").as("anchor_id"), col("vec_b").as("cand_id"),
          col("cos")),
        struct(col("vec_b").as("anchor_id"), col("vec_a").as("cand_id"),
          col("cos")))).as("p"))
      .select(col("p.anchor_id").as("anchor_id"),
        col("p.cand_id").as("cand_id"), col("p.cos").as("cos"))
    val negs = sym.filter(col("cos") < posTau)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(col("cos").desc, col("cand_id").asc)
    negs.withColumn("rk", row_number().over(w)).filter(col("rk") <= kNeg)
      .select("anchor_id", "cand_id", "cos", "rk")
  }

  /** 1-bit sign quantization: bit d is set iff `x_d > μ_d`, the per-dim
    * corpus mean (mean-centering keeps the bits ~balanced; FAISS's
    * `IndexBinaryFlat`-over-`ITQ/sign` contract without the rotation).
    * 64 dims pack into TWO 32-bit halves carried in longs — never one
    * 64-bit long, because the top bit would force signed-overflow
    * arithmetic that engines disagree on (Java wraps, DuckDB throws);
    * two half-codes keep every pack/chunk step in exact small-integer
    * range in BOTH engines. Packing is a Horner fold over the reversed
    * bit slice (acc·2 + bit — pure integer ops, bit-identical anywhere);
    * the mean is round-6 (the repo's order-dependent-sum rule) so the
    * threshold compare agrees across engines.
    *
    * This is the 32× compression point of the family: 8 bytes/vector
    * (vs 256 raw, m=8 PQ's 8 — but with NO training and a 2-instruction
    * distance), and Hamming distance `bit_count(a XOR b)` is the cheapest
    * similarity in the catalog — the standard first-pass filter in front
    * of exact re-rank at web scale.
    *
    * Returns (vec_id, code_lo, code_hi), each half in [0, 2^32). */
  private[graft] def signCodes(corpus: DataFrame): DataFrame = {
    val model = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(round(avg(col("x").cast(DoubleType)), 6).as("mu"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("pos"), col("mu")))).as("ps"))
      .select(transform(col("ps"), p => p("mu")).as("mus"))
    def horner(bits: Column): Column =
      aggregate(reverse(bits), lit(0L), (acc, b) => acc * 2 + b)
    corpus.crossJoin(broadcast(model))
      .withColumn("bits", zip_with(col("embedding"), col("mus"),
        (x, m) => when(x.cast(DoubleType) > m, lit(1L)).otherwise(lit(0L))))
      .select(col("vec_id"),
        horner(slice(col("bits"), 1, Dims / 2)).as("code_lo"),
        horner(slice(col("bits"), Dims / 2 + 1, Dims / 2)).as("code_hi"))
  }

  private def hamming(aLo: Column, aHi: Column,
                      bLo: Column, bHi: Column): Column =
    (bit_count(aLo.bitwiseXOR(bLo)) + bit_count(aHi.bitwiseXOR(bHi)))
      .cast(LongType)

  /** Brute Hamming top-k over [[signCodes]] — the exact ranking in code
    * space (the quantization is the only approximation). Queries are
    * broadcast (model-sized set), the corpus codes stream: one scan of
    * 8-byte codes, no shuffle beyond the final per-query top-k. Rank is
    * (dist asc, neighbor_id asc), the [[pqRank]] contract. */
  def signTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val codes = signCodes(corpus)
    val q = codes.join(
      broadcast(queries.select(col("vec_id"))), Seq("vec_id"))
    val scored = codes.as("c")
      .join(broadcast(q).as("q"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        hamming(col("q.code_lo"), col("q.code_hi"),
          col("c.code_lo"), col("c.code_hi")).as("dist"))
    pqRank(scored, k)
  }

  /** Multi-index hashing (Norouzi, Punjani & Fleet, CVPR 2012 "Fast Search
    * in Hamming Space with Multi-Index Hashing"): the 64-bit code splits
    * into `nChunks` disjoint substrings (default 8 × 8 bits — Norouzi's
    * rule m ≈ b/log₂ n wants substrings short enough that a chunk match
    * is likely for true neighbors; 16-bit chunks at small n retrieve
    * nothing), each indexed exactly.
    * PIGEONHOLE GUARANTEE: a neighbor at Hamming distance < nChunks has
    * too few differing bits to touch every chunk, so it matches the query
    * EXACTLY in at least one — chunk-equality retrieval finds EVERY code
    * within radius nChunks−1 (= 7 here); beyond that radius the result is
    * top-k among candidates only (the documented MIH contract; larger
    * radii take substitution probes, not implemented). Candidates from
    * the 4 equality joins are deduped, then ranked by exact Hamming.
    *
    * 100 TB shape: each chunk join is a plain hash join keyed by a small
    * chunk value — postings per key ≈ corpus/2^w per chunk table, queries
    * broadcast, so the probe reads 4 posting lists per query instead of
    * the corpus. Mean-centered bits keep the 2^16 buckets near-uniform;
    * a skewed corpus (many identical codes) degrades toward brute within
    * the hot bucket and is capped the same way LSH buckets are. */
  def signMihTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                  nChunks: Int = 8): DataFrame = {
    require(Dims % nChunks == 0 && nChunks % 2 == 0,
      s"nChunks=$nChunks must be even and divide Dims=$Dims")
    val w = Dims / nChunks // bits per chunk
    val base = lit(1L << w) // 2^w, exact
    val codes = signCodes(corpus)
    // chunk c of a half-code h (w-bit substrings, low chunks first):
    // floor-div/mod arithmetic only — exact and engine-portable.
    def chunks(df: DataFrame): DataFrame = df.select(col("*"), explode(
      flatten(array(
        transform(sequence(lit(0), lit(nChunks / 2 - 1)), c =>
          struct(c.as("chunk"),
            pmod(floor(col("code_lo") / pow(base, c)).cast(LongType), base)
              .cast(LongType).as("cval"))),
        transform(sequence(lit(0), lit(nChunks / 2 - 1)), c =>
          struct((c + nChunks / 2).as("chunk"),
            pmod(floor(col("code_hi") / pow(base, c)).cast(LongType), base)
              .cast(LongType).as("cval")))))).as("ch"))
      .select(col("vec_id"), col("code_lo"), col("code_hi"),
        col("ch.chunk").as("chunk"), col("ch.cval").as("cval"))
    val qCodes = codes.join(
      broadcast(queries.select(col("vec_id"))), Seq("vec_id"))
    val cand = chunks(codes).as("c")
      .join(broadcast(chunks(qCodes)).as("q"),
        col("q.chunk") === col("c.chunk") && col("q.cval") === col("c.cval") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("q.code_lo").as("qlo"), col("q.code_hi").as("qhi"),
        col("c.code_lo").as("clo"), col("c.code_hi").as("chi"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      hamming(col("qlo"), col("qhi"), col("clo"), col("chi")).as("dist"))
    pqRank(scored, k)
  }
}
