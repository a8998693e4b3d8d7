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
}
