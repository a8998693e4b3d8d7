package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic PCA over the embedding column — the whitening /
  * decorrelation step ahead of clustering, SemDeDup, and compressed ANN
  * (OPQ-style preprocessing): fit the top-k principal components of the
  * corpus embedding distribution, project every vector onto them.
  *
  * The fit is the classic two-stage shape every distributed PCA uses
  * (compute the d×d covariance in one pass, then solve the TINY
  * eigenproblem on the driver — `d² = 4096` doubles is a model parameter,
  * the [[Ann.lloydCentroids]] rule):
  *
  *  1. per-dimension means — one bounded groupBy (64 keys), round-6;
  *  2. covariance — the centered outer product exploded IN-ROW
  *     (`flatten(transform × transform)`: one corpus scan, no self-join)
  *     into a groupBy on the (i, j) dim-pair key — 4096 keys, map-side
  *     combined, so the shuffle is 4096 × partitions rows at any corpus
  *     size; entries round-6 (the cross-engine sync point for the only
  *     order-dependent sums in the whole fit);
  *  3. power iteration with deflation on the driver: `iters` matvec +
  *     normalize rounds per component, every inner sum a LEFT-ASSOCIATED
  *     chain starting from its first term (mirrored token-for-token by
  *     the DuckDB oracle's generated expressions, so the model is
  *     bit-identical across engines — the [[Bpe.oracleTrainSql]] /
  *     trainClassifier unrolled-replay pattern); per-iteration round-6 on
  *     the normalized vector; sign fixed so the largest-|entry| dimension
  *     (ties → lowest index) is positive; eigenvalue = round-6 Rayleigh
  *     product; deflation `C − λvvᵀ` in the same literal tree.
  *
  * Init vectors are md5-derived dyadic rationals ((md5_16 − 32768)/65536,
  * the [[Ann.planeComponent]] convention, "pca:" salt) — exact in binary,
  * reproducible anywhere, and never orthogonal-by-construction to a data
  * direction. Convergence quality is a function of `iters` and is pinned
  * by PcaSpec on a known-spectrum corpus; the GATE pins the deterministic
  * replay, whatever the spectrum.
  *
  * Projection is a pure map (centered dot with literal components,
  * left-associated), round-6.
  */
object Pca {

  val Dims: Int = Ann.Dims

  /** Fitted model: per-dim means, k unit components, k eigenvalues. */
  final case class Model(means: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double])

  /** md5-derived init component in [-0.5, 0.5): exact dyadic. */
  def initComponent(c: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pca:$c:$d".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 4), 16) - 32768).toDouble / 65536.0
  }

  /** round(x, 6) with the SQL rule (half away from zero). */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Left-associated dot starting from the FIRST product (not 0.0 + …, so
    * the tree matches the oracle's `a*b + c*d + …` chain bit-for-bit). */
  private def dotL(a: Array[Double], b: Array[Double]): Double = {
    var s = a(0) * b(0)
    var j = 1
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }

  def fit(emb: DataFrame, k: Int = 2, iters: Int = 4,
          vecCol: String = "embedding"): Model = {
    require(k >= 1 && iters >= 1)
    val n = emb.count().toDouble
    val x = col("__x__").cast(DoubleType)
    val means = emb
      .select(posexplode(col(vecCol)).as(Seq("__d__", "__x__")))
      .groupBy("__d__").agg(round(avg(x), 6).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val mArr = Array.tabulate(Dims)(means)

    // centered outer products exploded in-row: one scan, d²-key groupBy.
    // The product grid is the codegen'd [[graft.functions
    // .CenteredOuterProducts]] (a nested transform×transform here paid n²
    // interpreted lambda dispatches per row — 2.9 of embed_pca's 3.0 s at
    // sf0.1); same cast/subtract/multiply per (i, j), same row-major
    // order, so the folded sums are bit-identical. The (i, j) key rides
    // as the flattened position — one int column through the shuffle
    // instead of two, unpacked on the driver.
    val pairs = emb
      .select(posexplode(org.apache.spark.sql.GraftExpr.column(
        graft.functions.CenteredOuterProducts(
          org.apache.spark.sql.GraftExpr.expression(col(vecCol)),
          org.apache.spark.sql.GraftExpr.expression(lit(mArr)))))
        .as(Seq("__pos__", "__p__")))
      .groupBy("__pos__").agg(round(sum("__p__") / lit(n), 6).as("c"))
      .collect()
    val c = Array.ofDim[Double](Dims, Dims)
    pairs.foreach(r =>
      c(r.getInt(0) / Dims)(r.getInt(0) % Dims) = r.getDouble(1))

    val comps = Array.ofDim[Double](k, Dims)
    val eigs = Array.ofDim[Double](k)
    for (comp <- 0 until k) {
      var v = Array.tabulate(Dims)(d => initComponent(comp, d))
      for (_ <- 1 to iters) {
        val w = Array.tabulate(Dims)(i => dotL(c(i), v))
        val nm = math.sqrt(dotL(w, w))
        // rank-deficient / constant corpus (or k beyond the covariance
        // rank after deflation): fail fast instead of silently filling
        // components and eigenvalues with NaN
        require(nm > 0,
          s"power iteration collapsed at component $comp: the deflated " +
            "covariance annihilated the iterate — corpus rank < k; " +
            "request fewer components")
        v = w.map(wi => r6(wi / nm))
      }
      // sign convention: largest-|entry| dim (ties → lowest d) positive
      val lead = (0 until Dims).maxBy(d => (math.abs(v(d)), -d))
      if (v(lead) < 0) v = v.map(x => x * -1.0)
      val w2 = Array.tabulate(Dims)(i => dotL(c(i), v))
      val lam = r6(dotL(v, w2))
      comps(comp) = v
      eigs(comp) = lam
      for (i <- 0 until Dims; j <- 0 until Dims)
        c(i)(j) = c(i)(j) - lam * v(i) * v(j)
    }
    Model(mArr, comps, eigs)
  }

  /** Project onto the fitted components: (vec_id, p0 … p{k-1}), each a
    * round-6 centered dot — pure map, left-associated like the fit. */
  def project(emb: DataFrame, model: Model, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val cols = model.components.zipWithIndex.map { case (v, ci) =>
      val terms: Seq[Column] = (0 until Dims).map { d =>
        (element_at(col(vecCol), d + 1).cast(DoubleType) -
          lit(model.means(d))) * lit(v(d))
      }
      round(terms.reduce(_ + _), 6).as(s"p$ci")
    }
    emb.select(col(idCol) +: cols.toSeq: _*)
  }

  def fitProject(emb: DataFrame, k: Int = 2, iters: Int = 4): DataFrame =
    project(emb, fit(emb, k, iters))

  /** OPQ-style parametric rotation (Ge et al., CVPR 2013, the "OPQ-P"
    * variant): a FULL-rank PCA fit whose components are then permuted by
    * greedy eigenvalue allocation — components sorted by variance
    * descending, each assigned to the product-quantizer subspace with the
    * smallest running log-variance product (subspaces hold Dims/m
    * components each) — so every subspace quantizes a comparable share of
    * the corpus variance instead of the raw layout's lopsided split. The
    * returned Model's component order IS the allocation: [[rotate]] lays
    * subspace b's components at rows [b·Dims/m, (b+1)·Dims/m).
    *
    * An orthogonal rotation preserves pairwise L2 distances, so PQ over
    * rotated vectors ranks the SAME metric as PQ over raw vectors — the
    * rotation only moves quantization error, which is exactly the recall
    * ceiling the SURVEY §6 sweep measured (deflated power iteration keeps
    * the fit deterministic; the round-6 component quantization bounds
    * orthogonality error at ~1e-6 per entry, noise next to PQ's own
    * quantization error). */
  def fitOpq(emb: DataFrame, m: Int, iters: Int = 4): Model = {
    require(Dims % m == 0, s"m=$m must divide Dims=$Dims")
    val w = Dims / m
    val raw = fit(emb, Dims, iters)
    // Distance preservation needs an EXACTLY orthogonal matrix, which
    // deflated power iteration at full rank cannot deliver (the noise
    // spectrum's clustered eigenvalues converge slowly, and the round-6
    // per-iteration quantization compounds through 64 deflations —
    // measured ~1% pairwise-distance drift). Re-orthonormalize in fit
    // order: eigen-direction accuracy only shapes WHERE quantization
    // error lands (any near-PCA basis balances fine); orthogonality is
    // what PQ's L2 ranking rides on, so it is restored to machine
    // precision here. Deterministic: plain driver-side double math over
    // a deterministic fit.
    val full = Model(raw.means, gramSchmidt(raw.components), raw.eigenvalues)
    val order = (0 until Dims).sortBy(c => (-full.eigenvalues(c), c))
    // Balance the buckets on logs CENTERED AT THE SPECTRUM MINIMUM, not
    // raw log-eigenvalues: every bucket ends with exactly w components,
    // so the final log-products all shift by w·log(base) — the objective
    // is shift-invariant — but the GREEDY is not. With raw logs and a
    // spectrum entirely below 1 (every L2-normalized embedding corpus:
    // Σλ = E‖x−μ‖² ≤ 1), the first assignment makes its bucket's
    // log-product NEGATIVE, so that bucket stays the minimum and swallows
    // the top w components — the "allocation" silently degenerates to the
    // contiguous split it exists to beat (measured: OPQ pinned at PQ
    // parity on a 0.82-decay corpus; post-fix the same sweep separates
    // them). Non-negative scores restore the intended geometry: the top
    // m components spread one per bucket, later ones fill toward balance.
    val floor = math.max(full.eigenvalues.map(math.max(_, 1e-12)).min, 1e-12)
    val buckets = Array.fill(m)(Vector.empty[Int])
    val logProd = Array.fill(m)(0.0)
    for (c <- order) {
      val b = (0 until m).filter(buckets(_).size < w)
        .minBy(b => (logProd(b), b))
      buckets(b) :+= c
      logProd(b) += math.log(math.max(full.eigenvalues(c), 1e-12) / floor)
    }
    val perm = buckets.flatMap(identity)
    Model(full.means,
      perm.map(full.components).toArray,
      perm.map(full.eigenvalues).toArray)
  }

  /** Modified Gram-Schmidt with one re-orthogonalization pass (the
    * "twice is enough" rule): returns an orthonormal basis spanning the
    * same flags as the input, in input order. A component that collapses
    * under orthogonalization (rank-deficient corpus — e.g. a spectrum
    * decaying below the fit's round-6 noise floor leaves the trailing
    * power-iteration directions linearly dependent on the leading ones)
    * is replaced by a deterministic completion: the canonical basis
    * vector with the largest residual against the span built so far
    * (ties → lowest axis), orthonormalized. Any orthonormal completion
    * preserves the rotation's distance-preservation contract; the
    * replaced direction carries ~zero corpus variance, so WHERE it
    * points is immaterial to PQ error allocation. */
  private def gramSchmidt(vs: Array[Array[Double]]): Array[Array[Double]] = {
    val out = Array.ofDim[Double](vs.length, Dims)
    def orth(src: Array[Double], upto: Int): Array[Double] = {
      val v = src.clone()
      for (_ <- 0 until 2; j <- 0 until upto) {
        val d = dotL(v, out(j))
        var t = 0
        while (t < Dims) { v(t) -= d * out(j)(t); t += 1 }
      }
      v
    }
    for (i <- vs.indices) {
      var v = orth(vs(i), i)
      var nm = math.sqrt(dotL(v, v))
      if (nm <= 1e-8) {
        // deterministic completion: argmax residual over e_0..e_{Dims-1};
        // trace argument guarantees some axis has residual^2 >= (Dims-i)/Dims
        var best: Array[Double] = null
        var bestNm = -1.0
        var ax = 0
        while (ax < Dims) {
          val e = Array.ofDim[Double](Dims); e(ax) = 1.0
          val r = orth(e, i)
          val rn = math.sqrt(dotL(r, r))
          if (rn > bestNm + 1e-12) { bestNm = rn; best = r }
          ax += 1
        }
        v = best; nm = bestNm
        require(nm > 1e-8,
          s"component $i: no completion axis found - basis inconsistent")
      }
      out(i) = v.map(_ / nm)
    }
    out
  }

  /** Apply a full-rank model as a rotation: (idCol, vecCol) with the
    * embedding replaced by its centered projection onto ALL components,
    * back in float (the PQ input type). One typedLit matrix + higher-order
    * array ops per row — a pure map whatever the corpus size; each output
    * coordinate is a fixed-order left fold, so the rotation is
    * deterministic across runs and partitionings. */
  def rotate(emb: DataFrame, model: Model, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    require(model.components.length == Dims,
      s"rotation needs a full-rank model: ${model.components.length} != $Dims")
    val comps = typedLit(model.components.map(_.toSeq).toSeq)
    val meansL = typedLit(model.means.toSeq)
    val centered = transform(col(vecCol),
      (x, j) => x.cast(DoubleType) - element_at(meansL, j + 1))
    emb
      .withColumn("__c__", centered)
      .select(col(idCol),
        transform(sequence(lit(1), lit(Dims)), i =>
          aggregate(
            zip_with(element_at(comps, i), col("__c__"), (a, b) => a * b),
            lit(0.0), (acc, p) => acc + p).cast(FloatType)).as(vecCol))
  }
}
