package graft

import org.apache.spark.sql.DataFrame

import graft.llm.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus with a known spectrum: x = a·e0 + b·e1 (+ mean
    * shift), var(a) = 25, var(b) = 1 — component 0 must align with e0. */
  private def corpus(n: Int = 200): DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val a = rnd.nextGaussian() * 5.0
      val b = rnd.nextGaussian() * 1.0
      val v = Array.fill(Pca.Dims)(0.0f)
      v(0) = (3.0 + a).toFloat
      v(1) = (-1.0 + b).toFloat
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("top component aligns with the dominant variance direction") {
    val m = Pca.fit(corpus(), k = 2, iters = 12)
    assert(math.abs(m.components(0)(0)) > 0.99, m.components(0)(0))
    assert(math.abs(m.components(1)(1)) > 0.99, m.components(1)(1))
    // eigenvalues ordered and near the population variances
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(0) > 10 && m.eigenvalues(1) < 5)
    // means recovered
    assert(math.abs(m.means(0) - 3.0) < 1.5 && math.abs(m.means(1) + 1.0) < 0.5)
  }

  test("sign convention: the largest-|entry| dimension is positive") {
    val m = Pca.fit(corpus(), k = 2, iters = 12)
    m.components.foreach { v =>
      val lead = (0 until Pca.Dims).maxBy(d => (math.abs(v(d)), -d))
      assert(v(lead) > 0)
    }
  }

  test("fit is bit-deterministic across runs") {
    val m1 = Pca.fit(corpus(), k = 2, iters = 4)
    val m2 = Pca.fit(corpus(), k = 2, iters = 4)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.means.toSeq == m2.means.toSeq)
  }

  test("projections decorrelate: sample covariance of (p0, p1) is ~0, variances ordered") {
    val rows = Pca.fitProject(corpus(), k = 2, iters = 12)
      .select("p0", "p1").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val (m0, m1) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val v0 = rows.map(r => (r._1 - m0) * (r._1 - m0)).sum / n
    val v1 = rows.map(r => (r._2 - m1) * (r._2 - m1)).sum / n
    val cov = rows.map(r => (r._1 - m0) * (r._2 - m1)).sum / n
    assert(v0 > v1)
    assert(math.abs(cov) < 0.05 * math.sqrt(v0 * v1))
  }

  test("unit components: round-6 norm within a quantum of 1") {
    val m = Pca.fit(corpus(), k = 2, iters = 4)
    m.components.foreach { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, nrm)
    }
  }

  /** Full-rank corpus for the OPQ fit: two dominant directions + noise in
    * every dimension. */
  private def fullRankCorpus(n: Int = 300): DataFrame = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val v = Array.tabulate(Pca.Dims) { d =>
        val scale = if (d == 0) 5.0 else if (d == 1) 2.0 else 0.3
        (rnd.nextGaussian() * scale).toFloat
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("OPQ: rotation-then-encode is deterministic and preserves pairwise distance") {
    val emb = fullRankCorpus().cache()
    val m1 = Pca.fitOpq(emb, m = 8, iters = 3)
    val m2 = Pca.fitOpq(emb, m = 8, iters = 3)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq)

    val r1 = Pca.rotate(emb, m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val r2 = Pca.rotate(emb, m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(r1 == r2) // same model, same input -> bit-identical floats

    // orthogonal rotation: ||r(x)-r(y)|| == ||x-y|| up to the round-6
    // component quantization (~1e-4 over 64 dims)
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    for (i <- 0L until 20L; j <- (i + 1) to 20L) {
      val dr = math.sqrt(d2(raw(i), raw(j)))
      val dp = math.sqrt(d2(r1(i), r1(j)))
      assert(math.abs(dr - dp) < 1e-3 * math.max(dr, 1.0), s"($i,$j): $dr vs $dp")
    }
    emb.unpersist()
  }

  test("OPQ: eigenvalue allocation balances subspace variance products") {
    val emb = fullRankCorpus()
    val mm = 8
    val full = Pca.fit(emb, k = Pca.Dims, iters = 3)
    val opq = Pca.fitOpq(emb, m = mm, iters = 3)
    val w = Pca.Dims / mm
    def spread(eigsBySub: Seq[Seq[Double]]): Double = {
      val lp = eigsBySub.map(_.map(e => math.log(math.max(e, 1e-12))).sum)
      lp.max - lp.min
    }
    // allocated order (the model's own layout) vs the naive contiguous
    // split of the PCA order: allocation must be at least as balanced
    val allocated = opq.eigenvalues.grouped(w).map(_.toSeq).toSeq
    val contiguous = full.eigenvalues.grouped(w).map(_.toSeq).toSeq
    assert(spread(allocated) <= spread(contiguous) + 1e-9,
      s"allocated ${spread(allocated)} vs contiguous ${spread(contiguous)}")
    // and every subspace got exactly w components
    assert(allocated.forall(_.length == w))
  }

  test("OPQ: allocation balances a SUB-UNITY decaying spectrum (the normalized-embedding regime)") {
    // Every L2-normalized embedding corpus has Σλ = E‖x−μ‖² ≤ 1, i.e. a
    // spectrum entirely below 1 — the regime where a greedy on RAW
    // log-eigenvalues degenerates to the contiguous split (the first
    // bucket's log-product goes negative and swallows the whole top).
    // 0.8-decay stds, all variances < 1, like a real text-embedding
    // spectrum in miniature.
    val rnd = new scala.util.Random(13)
    val emb = (0 until 300).map { i =>
      val v = Array.tabulate(Pca.Dims) { d =>
        (rnd.nextGaussian() * 0.5 * math.pow(0.8, d)).toFloat
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val mm = 8
    val w = Pca.Dims / mm
    val full = Pca.fit(emb, k = Pca.Dims, iters = 8)
    val opq = Pca.fitOpq(emb, m = mm, iters = 8)
    def spread(eigsBySub: Seq[Seq[Double]]): Double = {
      val lp = eigsBySub.map(_.map(e => math.log(math.max(e, 1e-12))).sum)
      lp.max - lp.min
    }
    val allocated = opq.eigenvalues.grouped(w).map(_.toSeq).toSeq
    val contiguous = full.eigenvalues.grouped(w).map(_.toSeq).toSeq
    // STRICTLY better, by a wide margin — equality is the degeneration
    assert(spread(allocated) < 0.5 * spread(contiguous),
      s"allocated ${spread(allocated)} vs contiguous ${spread(contiguous)}")
    // the top-m components must spread ONE PER SUBSPACE: each bucket's
    // largest eigenvalue is one of the global top m
    val topM = full.eigenvalues.sorted.reverse.take(mm).min
    assert(allocated.forall(_.max >= topM - 1e-12),
      s"a bucket is missing a top-$mm leader: ${allocated.map(_.max).toList}")
  }

  test("OPQ: rank-deficient corpus still yields an orthonormal rotation") {
    // only 3 axes carry variance — the full-rank power-iteration fit
    // collapses past component ~3, exercising the deterministic basis
    // completion in gramSchmidt (a decayed-spectrum real corpus does the
    // same past the round-6 noise floor)
    val rnd = new scala.util.Random(11)
    val emb = (0 until 200).map { i =>
      val v = Array.fill(Pca.Dims)(0.0f)
      v(0) = (rnd.nextGaussian() * 5).toFloat
      v(1) = (rnd.nextGaussian() * 2).toFloat
      v(2) = (rnd.nextGaussian() * 1).toFloat
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding").cache()
    val m1 = Pca.fitOpq(emb, m = 8, iters = 2)
    val m2 = Pca.fitOpq(emb, m = 8, iters = 2)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq,
      "completion must be deterministic")
    // orthonormality to round-6 quantization
    val c = m1.components
    for (i <- c.indices; j <- i until c.length) {
      val d = c(i).zip(c(j)).map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-4, s"<c$i,c$j> = $d")
    }
    // and the rotation still preserves pairwise distance
    val rot = Pca.rotate(emb, m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    for (i <- 0L until 10L; j <- (i + 1) to 10L) {
      val dr = math.sqrt(d2(raw(i), raw(j)))
      val dp = math.sqrt(d2(rot(i), rot(j)))
      assert(math.abs(dr - dp) < 1e-3 * math.max(dr, 1.0), s"($i,$j): $dr vs $dp")
    }
    emb.unpersist()
  }

  test("OPQ: opqPqTopK is well-formed and self-consistent") {
    import graft.llm.Ann
    val emb = fullRankCorpus().cache()
    val queries = emb.filter($"vec_id" < 5)
    val got = Ann.opqPqTopK(emb, queries, k = 3, m = 8, codebookSize = 16,
      pcaIters = 3, codebookIters = 0).cache()
    assert(got.count() == 15) // k rows per query
    val perQ = got.groupBy("query_id").count().collect()
    assert(perQ.forall(_.getLong(1) == 3))
    // ranks are 1..k and distances non-decreasing within a query
    val rows = got.orderBy($"query_id", $"rn")
      .select("query_id", "dist", "rn").collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to 3))
      assert(sorted.map(_.getDouble(1)).toSeq.sliding(2).forall {
        case Seq(a, b) => a <= b; case _ => true })
    }
    got.unpersist(); emb.unpersist()
  }
}
