package graft

import org.apache.spark.sql.functions._

import graft.llm.{Ann, Curation, Dedup, Multimodal, TextAnalysis, Unigram}

/** Operator-level behavior of the LLM-pipeline ops on planted inputs. */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and columnar formats"),
    (3L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY  "), // exact dup of 0 modulo case/trim... actually lower+trim differs? lower('THE..TODAY') == doc0 text
    (4L, "der hund ist ein guter hund und der hund ist nicht das problem von der katze")
  ).toDF("doc_id", "text")

  test("exact dedup keeps first doc_id per normalized text") {
    val out = Dedup.exact(docs).orderBy("doc_id").collect()
    // doc 3 normalizes to doc 0's text -> one group of 2, keeper doc 0
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == 2L)
    assert(!m.contains(3L))
    assert(m(1L) == 1L && m(2L) == 1L && m(4L) == 1L)
  }

  test("minhash LSH finds the planted near-dup and verifies with exact jaccard") {
    val out = Dedup.minhashLsh(docs, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)) || out.contains((0L, 3L)))
    assert(!out.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("ngram jaccard exact pairs") {
    val out = Dedup.ngramJaccard(docs, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // same text modulo case
    out.foreach(p => assert(p._3 > 0.5))
  }

  test("semDedup: cluster-scoped drops, first occurrence wins, cross-cluster dups ignored") {
    // seeds = first 2 vectors: v0 spans cluster 0, v1 cluster 1
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.98f, 0.199f, 0f, 0f)),   // cluster 0, dup of v0
      (3L, Array(0.95f, 0f, 0.312f, 0f)),   // cluster 0, dup of v0 AND v2
      (4L, Array(0f, 0.8f, 0.6f, 0f)),      // cluster 1, dup of v1
      (5L, Array(0.1f, 0f, 0f, 0.995f))     // cluster 0, similar to nobody
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, tau = 0.5, nCentroids = 2)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean, Option[Long], Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 0L, 0L, 1L, 0L)) // assignment
    assert(out.map(_._3).toSeq == Seq(true, true, false, false, false, true))
    assert(out(2)._4.contains(0L) && out(2)._5 == 1L)
    assert(out(3)._4.contains(0L) && out(3)._5 == 2L) // earlier dups: v0, v2
    assert(out(4)._4.contains(1L) && out(4)._5 == 1L) // v1-dup found despite
    // v4's cosine to v0-cluster members being < tau: cluster-scoped, not global
    assert(out(5)._4.isEmpty && out(5)._5 == 0L)
  }

  test("simhash: identical docs get identical fingerprints, near-dups are close") {
    val fps = Dedup.simhashFingerprints(docs).as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(3L)) // same token set
    val hamming01 = java.lang.Long.bitCount(fps(0L) ^ fps(1L))
    val hamming02 = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    assert(hamming01 < hamming02)
  }

  test("language id picks the stopword-dominant language") {
    val out = TextAnalysis.languageId(docs).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en")
    assert(out(4L) == "de")
  }

  test("brute-force ANN is exact; LSH results are a subset ranked identically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val brute = Ann.bruteTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, q, 5)
      .select("query_id", "neighbor_id", "score", "rn").as[(Long, Long, Double, Int)].collect()
    assert(brute.size == 15)
    assert(lsh.nonEmpty)
    // LSH candidates only come from the query's bucket; every reported
    // neighbor must share the query's bucket by construction
    lsh.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted(Ordering[Double].reverse))
    }
  }

  test("MMR: pick 1 is the relevance argmax; a near-duplicate runner-up is deferred behind a diverse pick") {
    // q = (e1+e2)/√2 as the query; corpus: b nearly parallel to a (the
    // near-dup pair leads on relevance), c orthogonal to both
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (10L, v(1, 0, 0)),        // a: rel .707
      (11L, v(0.995, 0.1, 0)),  // b: rel .774 (top-1), sim(a,b) ≈ .995
      (12L, v(0, 0, 1))         // c: rel 0, orthogonal to a and b
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, v(1, 1, 0))).toDF("vec_id", "embedding")
    val brute = Ann.bruteTopK(corpus, q, 3).orderBy("rn")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(brute == Seq(11L, 10L, 12L)) // relevance order: b, a, c
    val mmr = Ann.mmrTopK(corpus, q, k = 3, nCand = 20, lambda = 0.5)
      .orderBy("pick")
      .as[(Long, Long, Double, Double, Int)].collect()
    // pick 1 = brute top-1; pick 2 skips the near-dup a (penalty .995)
    // for orthogonal c (penalty 0); a arrives last
    assert(mmr.map(_._2).toSeq == Seq(11L, 12L, 10L))
    assert(mmr.map(_._5).toSeq == Seq(1, 2, 3))
    // picks are distinct and drawn from the relevance shortlist
    assert(mmr.map(_._2).distinct.length == 3)
    // λ = 1 disables the penalty: MMR degenerates to the relevance order
    val pure = Ann.mmrTopK(corpus, q, k = 3, nCand = 20, lambda = 1.0)
      .orderBy("pick").select("neighbor_id").as[Long].collect().toSeq
    assert(pure == brute)
  }

  test("SQ8: ranked ADC output, and high-resolution SQ converges to brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val sq = Ann.sqTopK(emb, q, 5)
      .select("query_id", "neighbor_id", "dist", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(sq.length == 15) // 3 queries × k=5, self excluded
    sq.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted) // ascending L2²
      assert(rows.forall(r => r._2 != qid && r._3 >= 0.0))
    }
    // levels → ∞ drives the midpoint reconstruction to the raw vector, so
    // ADC L2² → exact L2²; the corpus is L2-normalized (norms ∈ [1±1e-7]),
    // where L2 and cosine rank identically — high-resolution SQ must
    // reproduce the brute-force top-1 for every query
    val brute = Ann.bruteTopK(emb, q, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val fine = Ann.sqTopK(emb, q, 1, levels = 1 << 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(fine == brute)
  }

  test("PQ ADC: codes quantize exactly, distances are additive, top-k ranked") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val pq = Ann.pqTopK(emb, q, 5)
      .select("query_id", "neighbor_id", "dist", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(pq.length == 15) // 3 queries × k=5, self excluded
    pq.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted) // ascending L2²
      assert(rows.forall(r => r._2 != r._1 && r._3 >= 0.0))
    }
    // a codebook member's ADC distance to its own code is exactly 0, so a
    // codebook vector queried against the corpus finds its code-sharers at 0
    val q0 = Ann.pqTopK(emb, emb.filter(col("vec_id") === 1), 5)
      .select("neighbor_id", "dist").as[(Long, Double)].collect()
    assert(q0.exists { case (n, d) => n != 1L && d >= 0.0 })
    // engine-side options keep the output shape: normalized + Lloyd-refined
    val refined = Ann.pqTopK(emb, q, 5, normalize = true, codebookIters = 1)
    assert(refined.count() == 15)
  }

  test("IVF×PQ: pruned candidates are a subset of full-corpus ADC ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    // nprobe = nCentroids ⇒ every list probed ⇒ identical to full-PQ ADC
    val full = Ann.pqTopK(emb, q, 5)
      .select("query_id", "neighbor_id", "dist", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val allProbed = Ann.ivfPqTopK(emb, q, 5, nCentroids = 8, nprobe = 8,
        multiAssign = 1).select("query_id", "neighbor_id", "dist", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(allProbed == full)
    // pruned probing returns well-formed ranked rows whose ADC distances
    // agree with the full table wherever a pair survives the pruning
    val pruned = Ann.ivfPqTopK(emb, q, 5, nCentroids = 16, nprobe = 2,
        multiAssign = 2).select("query_id", "neighbor_id", "dist", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(pruned.nonEmpty)
    val fullDist = full.map(r => (r._1, r._2) -> r._3).toMap
    pruned.foreach { case (qid, nid, d, rn) =>
      assert(rn >= 1 && rn <= 5 && qid != nid)
      fullDist.get((qid, nid)).foreach(fd => assert(fd == d))
    }
  }

  test("IVF×PQ re-rank: exhaustive shortlist recovers exact bruteTopK; pruned shortlist ranks by true cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val n = emb.count().toInt
    // every list probed + shortlist = whole corpus ⇒ the PQ stage prunes
    // nothing and the exact re-rank IS brute force, bit for bit
    val rr = Ann.ivfPqRerankTopK(emb, q, 5, rerank = n, nCentroids = 8,
        nprobe = 8, multiAssign = 1)
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Ann.bruteTopK(emb, q, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rr == brute)
    // pruned shortlist: output is ranked by EXACT cosine (desc), k rows/query
    val pruned = Ann.ivfPqRerankTopK(emb, q, 5, rerank = 10, nCentroids = 16,
        nprobe = 2, multiAssign = 1)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = pruned.groupBy(_._1)
    assert(byQ.values.forall(rows =>
      rows.sortBy(_._4).sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true }))
    val bruteScore = Ann.bruteTopK(emb, q, n - 1)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pruned.foreach { case (qid, nid, s, _) =>
      assert(bruteScore((qid, nid)) == s) } // scores are the true cosines
  }

  test("AnnIndex: build → persist → append → query from the store equals the transient rebuild") {
    import graft.llm.AnnIndex
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val half = emb.agg(max("vec_id")).head().getLong(0) / 2
    val dir = java.nio.file.Files.createTempDirectory("annidx-spec").toString
    // first-N seeds and first-K codebook live in the build half, so the
    // frozen model == the model a full rebuild would fit (iters = 0 keeps
    // the codebook off the corpus-dependent Lloyd path)
    val p = AnnIndex.Params(nCentroids = 8, multiAssign = 1, codebookIters = 0)
    AnnIndex.build(emb.filter(col("vec_id") <= half), dir, p)
    AnnIndex.append(dir, emb.filter(col("vec_id") > half))
    val stored = AnnIndex.query(spark, dir, q, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    val transient = Ann.ivfPqTopK(emb, q, 5, nCentroids = 8, nprobe = 2,
        multiAssign = 1, codebookIters = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(stored == transient)
    // exact re-rank from the store == transient IVFADC+R, row for row
    val rrStored = AnnIndex.queryRerank(spark, dir, emb, q, 5, rerank = 10,
        nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    val rrTransient = Ann.ivfPqRerankTopK(emb, q, 5, rerank = 10,
        nCentroids = 8, nprobe = 2, multiAssign = 1, codebookIters = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rrStored == rrTransient)
    // the store really is the only corpus state the query touches: codes
    // are partitioned by cent_id for probe-pruned reads
    val parts = new java.io.File(s"$dir/codes.parquet").listFiles()
      .filter(_.getName.startsWith("cent_id=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts.forall(_.matches("cent_id=\\d+")))
  }

  test("AnnIndex opq: stored rotation reproduces the transient OPQ pipeline; append encodes in the frozen basis") {
    import graft.llm.AnnIndex
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .cache()
    val q = emb.filter(col("vec_id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("annidx-opq").toString
    // rotation is fit on the BUILD corpus (frozen thereafter), so the
    // store ≡ transient law holds for a full-corpus build
    val p = AnnIndex.Params(nCentroids = 8, multiAssign = 1,
      codebookIters = 0, opq = true, pcaIters = 3)
    AnnIndex.build(emb, dir, p)
    val stored = AnnIndex.query(spark, dir, q, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    val transient = Ann.opqIvfPqTopK(emb, q, 5, nCentroids = 8, nprobe = 2,
        multiAssign = 1, m = 8, codebookSize = 16, pcaIters = 3,
        codebookIters = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(stored.nonEmpty && stored == transient)
    // the rotation shipped with the model...
    assert(new java.io.File(s"$dir/rotation.parquet").exists())
    // ...and appends encode in the SAME frozen basis: an appended exact
    // copy of vector 3 lands at the same ADC distance as vector 3 itself
    val twin = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") * 0 + 9999L).as("vec_id"), col("embedding"))
    AnnIndex.append(dir, twin)
    val q3 = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") * 0 + 10000L).as("vec_id"), col("embedding"))
    val after = AnnIndex.query(spark, dir, q3, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val d3 = after.find(_._2 == 3L).map(_._3)
    val dTwin = after.find(_._2 == 9999L).map(_._3)
    assert(d3.nonEmpty && d3 == dTwin, s"vec3 $d3 vs twin $dTwin")
    emb.unpersist()
  }

  test("DedupIndex: build → dedupAgainst equals cross-half minhashLsh; append extends the index") {
    import graft.llm.DedupIndex
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val half = d.agg(max("doc_id")).head().getLong(0) / 2
    val dir = java.nio.file.Files.createTempDirectory("dedupidx-spec").toString
    DedupIndex.build(d.filter(col("doc_id") <= half), dir)
    val incremental = DedupIndex.dedupAgainst(spark, dir,
        d.filter(col("doc_id") > half))
      .as[(Long, Long, Double)].collect().toSet
    // the whole-corpus operator restricted to cross-half pairs (doc_a <= half
    // < doc_b by the id split) must agree pair for pair, jaccard for jaccard
    val full = Dedup.minhashLsh(d)
      .filter(col("doc_a") <= half && col("doc_b") > half)
      .select(col("doc_b"), col("doc_a"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(incremental == full && incremental.nonEmpty)

    // append: planted docs prove appended postings are probed
    val base = Seq((100000L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("dedupidx-spec2").toString
    DedupIndex.build(base, dir2)
    DedupIndex.append(dir2, Seq(
      (100001L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text"))
    val hits = DedupIndex.dedupAgainst(spark, dir2, Seq(
        (100002L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text"),
        minJaccard = 0.3)
      .select("dup_id").as[Long].collect().toSet
    assert(hits == Set(100000L, 100001L)) // built AND appended doc both found
  }

  test("SubstrIndex: build → dedupAgainst equals whole-corpus dedupSubstr on the probe half; append extends the gram set") {
    import graft.llm.{Curation, SubstrIndex}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val half = d.agg(max("doc_id")).head().getLong(0) / 2
    val dir = java.nio.file.Files.createTempDirectory("substridx-spec").toString
    SubstrIndex.build(d.filter(col("doc_id") <= half), dir, k = 15)
    val incremental = SubstrIndex.dedupAgainst(spark, dir,
        d.filter(col("doc_id") > half))
      .as[(Long, Long, Long, Double)].collect().toSet
    // index-or-earlier-in-batch IS the whole-corpus first-occurrence rule
    // doc_id-split: rows must agree exactly, coverage included
    val full = Curation.dedupSubstr(d, k = 15)
      .filter(col("doc_id") > half)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(incremental == full && incremental.nonEmpty)
    assert(incremental.exists(_._3 > 0L), "some probe doc shares a run with the index")

    // append: a passage indexed only via append() must be found, and
    // append() must not re-add grams the store already holds
    val run = (1 to 15).map(i => s"w$i").mkString(" ")
    val other = (1 to 15).map(i => s"v$i").mkString(" ")
    val dir2 = java.nio.file.Files.createTempDirectory("substridx-spec2").toString
    SubstrIndex.build(Seq((1L, run)).toDF("doc_id", "text"), dir2, k = 15)
    SubstrIndex.append(dir2, Seq((2L, run), (3L, other)).toDF("doc_id", "text"))
    // counted merge-on-read partials: build wrote (run,1); append added
    // (run,1) and (other,1) — compact folds them to one row per gram with
    // the live-doc counts intact
    SubstrIndex.compact(dir2)
    val stored = spark.read.parquet(s"$dir2/postings.parquet")
      .select("h", "cnt").as[(Long, Long)].collect()
    assert(stored.length == 2 && stored.map(_._2).sorted.toSeq == Seq(1L, 2L))
    val scored = SubstrIndex.dedupAgainst(spark, dir2,
        Seq((4L, other), (5L, "w1 w2 unrelated")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(4L) == 15L) // appended passage is probed
    assert(scored(5L) == 0L)  // sub-k overlap is not a duplicate run
  }

  test("CentroidStore: frozen-model semDedup equals whole-corpus semDedup; append extends members; stored mixByCluster matches transient") {
    import graft.llm.{CentroidStore, Curation}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val mx = emb.agg(max("vec_id")).head().getLong(0)
    val half = mx / 2
    val q3 = mx * 3 / 4
    val dir = java.nio.file.Files.createTempDirectory("centstore-spec").toString
    CentroidStore.build(emb.filter(col("vec_id") <= half), dir, nCentroids = 16)
    // build-half + probe-rest == whole-corpus semDedup restricted to the
    // probe half, row for row (same frozen first-16 centroids, same TOTAL
    // cluster-size guard, same lowest-id-earlier-duplicate verdict)
    val whole = Dedup.semDedup(emb, tau = 0.3, nCentroids = 16)
    val fullHalf = whole.filter(col("vec_id") > half)
      .as[(Long, Long, Boolean, Option[Long], Long)].collect().toSet
    val incHalf = CentroidStore.semDedupAgainst(spark, dir,
        emb.filter(col("vec_id") > half), tau = 0.3)
      .as[(Long, Long, Boolean, Option[Long], Long)].collect().toSet
    assert(incHalf == fullHalf && incHalf.nonEmpty)
    assert(incHalf.exists(!_._3), "some probe vector is dropped as a dup")
    // append keeps the model frozen and only extends the member store:
    // probing the last quarter after appending the third quarter still
    // equals the whole-corpus run restricted to the last quarter
    CentroidStore.append(dir,
      emb.filter(col("vec_id") > half && col("vec_id") <= q3))
    val incQ = CentroidStore.semDedupAgainst(spark, dir,
        emb.filter(col("vec_id") > q3), tau = 0.3)
      .as[(Long, Long, Boolean, Option[Long], Long)].collect().toSet
    val fullQ = whole.filter(col("vec_id") > q3)
      .as[(Long, Long, Boolean, Option[Long], Long)].collect().toSet
    assert(incQ == fullQ && incQ.nonEmpty)
    // members are laid out one directory per cluster for probe pruning
    val parts = new java.io.File(s"$dir/members.parquet").listFiles()
      .filter(_.getName.startsWith("cent_id=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts.forall(_.matches("cent_id=\\d+")))
    // mixByClusterStored under a whole-corpus store == transient mixByCluster
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val dir2 = java.nio.file.Files.createTempDirectory("centstore-spec2").toString
    CentroidStore.build(emb, dir2, nCentroids = 16)
    val stored = CentroidStore.mixByClusterStored(spark, dir2, d, emb,
        alpha = 0.5, budget = 20000L)
      .as[(String, Long, Long, Double)].collect().toSet
    val transient = Curation.mixByCluster(d, emb, alpha = 0.5, budget = 20000L)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(stored == transient && stored.nonEmpty)
  }

  test("vocab builder: min-count floor, frequency-sorted dense ranks") {
    import graft.llm.Vocab
    val v = Vocab.buildVocab(docs, minCount = 4)
      .as[(String, Long, Int)].collect()
    // only "the" clears 4 occurrences (3 each in docs 0, 1, 3)
    assert(v.toSeq == Seq(("the", 9L, 1)))
    val v3 = Vocab.buildVocab(docs, minCount = 3)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(v3.head == (("the", 9L, 1)))
    assert(v3.map(_._3).toSeq == (1 to v3.length).toSeq) // dense 1-based
    // count ties rank alphabetically (the (cnt desc, token asc) order)
    val ties = v3.filter(_._2 == 3L).map(_._1)
    assert(ties.toSeq == ties.sorted.toSeq && ties.nonEmpty)
  }

  test("vocab builder: banded rank equals a global (cnt desc, token) rank on a large synthetic vocab") {
    import graft.llm.Vocab
    // 5000 distinct tokens, Zipf-ish counts with a hot cnt=2 band sharing
    // prefixes — the shape whose rank was a single-task global sort
    // before the banded rewrite.
    val toks = (0 until 5000).flatMap { i =>
      Seq.fill(2 + (i % 9))(s"tk${i % 37}x$i")
    }
    val d = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Vocab.buildVocab(d, minCount = 2, prefixLen = 2)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((t, c), i) => (t, c, i + 1) }
    assert(got.length == 5000)
    assert(got.toSeq == expect)
  }

  test("tfidf: hand-checked scores, corpus-wide terms score zero, per-doc top-k") {
    val d2 = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(d2, topK = 2)
      .as[(Long, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._5) -> ((r._2, r._3, r._4))).toMap
    // df: a=2 b=1 c=1, N=2 → idf(a)=ln(1)=0, idf(b)=idf(c)=ln(2)
    assert(out((0L, 1)) == (("b", 1L, 0.693147)))
    assert(out((0L, 2)) == (("a", 2L, 0.0))) // everywhere-term scores 0
    assert(out((1L, 1)) == (("c", 1L, 0.693147)))
    assert(out((1L, 2)) == (("a", 1L, 0.0)))
  }

  test("perplexity: smoothed conditional bigram LM, reference-conditioned, hand-checked") {
    val docs = Seq(
      (0L, "a b a b", "en"),
      (1L, "a b", "fr"),
      (2L, "z z z z", "fr"),
      (3L, "a", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexity(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference = docs 0,3 → c1: a=3, b=2; V=2; c2: "a b"=2, "b a"=1 (α=1)
    // doc1 "a b": ln((2+1)/(3+2)) → ppl = 5/3
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - 5.0 / 3.0) < 1e-6)
    // doc2 "z z z z": word unseen in ref → ln((0+1)/(0+2)) per bigram → ppl = 2
    assert(out(2L) == ((3L, 2.0)))
    // doc0: 2×ln(3/5) + 1×ln(2/4) averaged
    val exp0 = math.exp(-(2 * math.log(3.0 / 5.0) + math.log(2.0 / 4.0)) / 3.0)
    assert(out(0L)._1 == 3L && math.abs(out(0L)._2 - exp0) < 1e-6)
    // doc3: no bigrams → sentinel zeros
    assert(out(3L) == ((0L, 0.0)))
    // reference conditioning: against an all-docs reference the z-doc's
    // bigram is in-model and its perplexity drops
    val all = TextAnalysis.perplexity(docs, lit(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(all(2L) < out(2L)._2)
  }

  test("native LSH-bucket expression is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.functions.HyperplaneBucket.register(spark)
    val diffs = emb.select(
        Ann.bucketId(col("embedding"), 4, planeOffset = 8).as("hof"),
        expr("graft_lsh_bucket(embedding, 8, 4)").as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diffs == 0)
  }

  test("native cosine expression is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.functions.CosineSimilarity.register(spark)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
    val diffs = pairs.select(
        Ann.cosine(col("a.embedding"), col("b.embedding")).as("hof"),
        expr("graft_cosine(a.embedding, b.embedding)").as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diffs == 0)
  }

  test("multimodal decode plumbing: typed batch path yields normalized histograms") {
    val feats = Multimodal.decodeFeatures(spark, docs).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // normalized over first-64-byte histogram
      assert(f.width >= 16 && f.height >= 16)
      assert(f.format == "raw") // text-derived blobs are not recognizable media
    }
  }

  test("mediaNearDup: exact copies at hamming 0, header re-encode found, unrelated images apart") {
    import graft.llm.{MediaCodec, Multimodal}
    def md5u(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02X".format(_)).mkString
    def img(n: Int, bitDepth: String): Array[Byte] = {
      val hdr = "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000064" + "000000C8" + bitDepth + "02000000" + "DEADBEEF"
      val hex = hdr + (0 until 30).map(j => md5u(s"img:$n:$j")).mkString
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    // the synthetic PNG is a real PNG as far as the codec is concerned
    val sniffed = MediaCodec.sniff(img(0, "08"))
    assert(sniffed.exists(m => m.format == "png" && m.width == 100 && m.height == 200))
    val media = Seq(
      (1L, img(0, "08")), // original
      (2L, img(0, "08")), // exact copy
      (3L, img(0, "10")), // re-encoded at 16-bit depth (one IHDR byte)
      (4L, img(7, "08"))  // different image entirely
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.mediaNearDup(media, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getDouble(3)))).toMap
    assert(pairs((1L, 2L)) == ((0, 1.0))) // byte-identical: hamming 0, cos 1
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L))._1 > 0) // re-encode caught
    assert(pairs((1L, 3L))._2 > 0.99) // feature histograms nearly identical
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L }) // unrelated apart
  }

  test("media codec: real PNG/JPEG/GIF/BMP headers decode through the Spark path") {
    import spark.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val pngRgba = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, /* w=640 */ 0, 0, 1, 0xe0, /* h=480 */ 8, 6, 0, 0, 0)
    val jpegYcc = bytes(0xff, 0xd8, // SOI
      0xff, 0xe0, 0, 4, 0, 0, // APP0 ahead of the SOF, as real files have
      0xff, 0xc2, 0, 11, 8, 0x04, 0x38, /* h=1080 */ 0x07, 0x80, /* w=1920 */ 3, 0, 0, 0)
    val gif = "GIF89a".getBytes ++ bytes(0x20, 0x03, /* w=800 LE */ 0x58, 0x02, /* h=600 */ 0, 0, 0, 0)
    val bmp = bytes('B', 'M') ++ new Array[Byte](16) ++
      bytes(0x40, 1, 0, 0, /* w=320 LE32 */ 0x10, 0xff, 0xff, 0xff) ++ // h=-240: top-down
      bytes(0, 0) ++ bytes(24, 0) ++ new Array[Byte](4)
    val corrupt = Seq(
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0), // truncated PNG
      bytes(0xff, 0xd8, 0xff, 0xda, 0, 2), // JPEG: scan before any SOF
      bytes(0xff, 0xd8, 0x12, 0x34), // JPEG: lost marker sync
      "GIF89a".getBytes.take(6), // GIF: no screen descriptor
      Array.empty[Byte])
    val rows = Seq(1L -> pngRgba, 2L -> jpegYcc, 3L -> gif, 4L -> bmp) ++
      corrupt.zipWithIndex.map { case (p, i) => (100L + i) -> p }
    val df = rows.toDF("doc_id", "text").withColumn("text", col("text").cast("string"))
    // cast through mediaFrame loses raw bytes for binary input, so decode the
    // payloads directly through the same typed mapPartitions shape instead
    val out = spark.createDataset(rows.map { case (id, p) => Multimodal.MediaRow(id, p) })
      .mapPartitions(_.map(r => Multimodal.decode(r.payload).copy(doc_id = r.doc_id)))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).format == "png" && out(1L).width == 640 && out(1L).height == 480 && out(1L).channels == 4)
    assert(out(2L).format == "jpeg" && out(2L).width == 1920 && out(2L).height == 1080 && out(2L).channels == 3)
    assert(out(3L).format == "gif" && out(3L).width == 800 && out(3L).height == 600 && out(3L).channels == 3)
    assert(out(4L).format == "bmp" && out(4L).width == 320 && out(4L).height == 240 && out(4L).channels == 3)
    corrupt.indices.foreach { i =>
      val f = out(100L + i)
      assert(f.format == "raw", s"corrupt payload $i decoded as ${f.format}") // fell back, no throw
      assert(f.features.length == 8)
    }
    assert(df.count() == rows.length) // frame construction itself is sound
  }
  test("native winnow expression matches the HOF formulation exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.functions.Winnow.register(spark)
    val hof = docs
      .withColumn("t", lower(col("text")))
      .withColumn("hs", expr(
        "transform(transform(sequence(1, greatest(length(t) - 7, 1)), i -> substring(t, i, 8)), " +
          "x -> cast(conv(substring(md5(cast(x as binary)), 1, 15), 16, 10) as bigint))"))
      .withColumn("fp", explode(array_distinct(expr(
        "transform(sequence(1, greatest(size(hs) - 3, 1)), j -> array_min(slice(hs, j, 4)))"))))
      .select(col("doc_id"), col("fp"))
    val native = docs.select(col("doc_id"), explode(expr("graft_winnow(lower(text))")).as("fp"))
    assert(hof.exceptAll(native).count() == 0)
    assert(native.exceptAll(hof).count() == 0)
    // short-text edges: empty, < 8 chars, exactly 8, < 11 (single window)
    import spark.implicits._
    val edge = Seq("", "abc", "abcdefgh", "abcdefghij",
      "h\u00e9llo w\u00f6rld \u00fcn\u00efcode text", "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3067\u3059\u3088")
      .toDF("text").withColumn("doc_id", col("text"))
    val ehof = edge
      .withColumn("t", lower(col("text")))
      .withColumn("hs", expr(
        "transform(transform(sequence(1, greatest(length(t) - 7, 1)), i -> substring(t, i, 8)), " +
          "x -> cast(conv(substring(md5(cast(x as binary)), 1, 15), 16, 10) as bigint))"))
      .withColumn("fp", explode(array_distinct(expr(
        "transform(sequence(1, greatest(size(hs) - 3, 1)), j -> array_min(slice(hs, j, 4)))"))))
      .select(col("doc_id"), col("fp"))
    val enat = edge.select(col("doc_id"), explode(expr("graft_winnow(lower(text))")).as("fp"))
    assert(ehof.exceptAll(enat).count() == 0 && enat.exceptAll(ehof).count() == 0)
  }

  test("native minhash expression matches the HOF formulation exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.functions.MinHash60.register(spark)
    val grams = Dedup.wordNgrams(docs, 3).groupBy("doc_id")
      .agg(collect_list("g").as("gs"))
    val k = 12
    val hof = grams.select(col("doc_id"), expr(
      s"transform(sequence(0, ${k - 1}), s -> array_min(transform(gs, g -> " +
        "cast(conv(substring(md5(cast(concat(cast(s as string), ':', g) as binary)), 1, 15), 16, 10) as bigint))))")
      .as("sig"))
    val native = grams.select(col("doc_id"), expr(s"graft_minhash(gs, $k)").as("sig"))
    val joined = hof.withColumnRenamed("sig", "h").join(native, "doc_id")
    assert(joined.filter(col("h") =!= col("sig")).count() == 0)
    assert(joined.count() == grams.count())
    // multibyte grams: the md5 input is the UTF-8 bytes of "s:gram" in both paths
    import spark.implicits._
    val mb = Seq(Seq("caf\u00e9 con leche", "\u65e5\u672c\u8a9e gram here")).toDF("gs")
    val mbHof = mb.select(expr(
      "transform(sequence(0, 3), s -> array_min(transform(gs, g -> " +
        "cast(conv(substring(md5(cast(concat(cast(s as string), ':', g) as binary)), 1, 15), 16, 10) as bigint))))").as("h"))
    val mbNat = mb.select(expr("graft_minhash(gs, 4)").as("sig"))
    assert(mbHof.head().getSeq[Long](0) == mbNat.head().getSeq[Long](0))
  }

  test("graft_hash60s/graft_simhash: null elements and empty arrays agree across eval paths") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    graft.functions.Hash60Array.register(spark)
    graft.functions.SimHash60.register(spark)

    // codegen path (WholeStageCodegen over a DataFrame select)
    val out = spark.sql(
      """SELECT id, graft_hash60s(toks) AS hs, graft_simhash(graft_hash60s(toks)) AS fp
        |FROM VALUES (1L, array('a','b')),
        |            (2L, array(cast(null as string))),
        |            (3L, array('a', cast(null as string))) AS t(id, toks)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getSeq[Any](1)(1) == null)       // null element hashes to null
    assert(!out(1L).getSeq[Any](1).contains(null))
    // null slots are SKIPPED (not read as 0): fp([h(a), null]) == fp([h(a)])
    val fpA = spark.sql("SELECT graft_simhash(graft_hash60s(array('a')))").head.getLong(0)
    assert(out(3L).getLong(2) == fpA)
    assert(out(2L).getLong(2) == 0L)                // all-null array -> zero fingerprint

    // interpreted path: direct Expression.eval must match the codegen result
    val hsExpr = graft.functions.Hash60Array(
      Literal.create(Seq("a", null), ArrayType(StringType, containsNull = true)))
    val hs = hsExpr.eval().asInstanceOf[ArrayData]
    assert(hs.isNullAt(1) && !hs.isNullAt(0))
    val fpInterp = graft.functions.SimHash60(
      Literal(hs, ArrayType(LongType, containsNull = true))).eval()
    assert(fpInterp == out(3L).getLong(2))
    // empty array, interpreted
    val fpEmpty = graft.functions.SimHash60(
      Literal(ArrayData.toArrayData(Array.empty[Long]), ArrayType(LongType))).eval()
    assert(fpEmpty == 0L)
  }

  test("duplicateClusters: multi-hop chain collapses to one cluster; disjoint stay apart") {
    import spark.implicits._
    // chain 10-11-12-...-19 (diameter 9) + separate pair (100, 101)
    val pairs = ((10L to 18L).map(i => (i, i + 1)) :+ (100L, 101L)).toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (10L to 19L).foreach(d => assert(out(d) == 10L, s"doc $d"))
    assert(out(100L) == 100L && out(101L) == 100L)
    assert(out.size == 12)
  }

  test("keepBest: each cluster keeps its highest-quality member, ties by doc_id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster")
    val quality = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (10L, 0.5), (11L, 0.5))
      .toDF("doc_id", "quality_score")
    val out = Dedup.keepBest(clusters, quality).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    // cluster 1: docs 2 and 3 tie at 0.9 — lower doc_id 2 wins over doc 3
    assert(out(1L) == ((2L, false)) && out(2L) == ((2L, true)) &&
      out(3L) == ((2L, false)))
    // cluster 10: tie at 0.5 — doc 10 wins
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    assert(out.size == 5)
  }

  test("char entropy: 0 for single-char spam, ln(k) for uniform k-char text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aaaaaaaaaa"),          // single symbol: entropy 0
      (1L, "abababababab"),        // two symbols, uniform: ln 2
      (2L, ""),                    // empty: defined 0
      (3L, "!!!???###")            // nothing in the alphabet: n_alpha 0
    ).toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis.entropy(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L) == ((10L, 0.0)))
    assert(out(1L)._1 == 12L && math.abs(out(1L)._2 - math.log(2)) < 1e-6)
    assert(out(2L) == ((0L, 0.0)))
    assert(out(3L) == ((0L, 0.0)))
  }

  test("random projection: strict-fold dot against the deterministic planes") {
    import spark.implicits._
    val ones = Array.fill(Ann.Dims)(1.0f)
    val out = Ann.project(Seq((7L, ones)).toDF("vec_id", "embedding"), outDim = 2)
      .collect().head
    def expected(j: Int): Double = {
      val raw = (0 until Ann.Dims).foldLeft(0.0)((acc, d) => acc + Ann.planeComponent(256 + j, d))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.getLong(0) == 7L)
    assert(out.getDouble(1) == expected(0))
    assert(out.getDouble(2) == expected(1))
    // linear: scaling the vector scales the projection
    val twos = Array.fill(Ann.Dims)(2.0f)
    val doubled = Ann.project(Seq((8L, twos)).toDF("vec_id", "embedding"), outDim = 1)
      .collect().head.getDouble(1)
    val base = (0 until Ann.Dims).foldLeft(0.0)((acc, d) => acc + 2.0 * Ann.planeComponent(256, d))
    assert(doubled == BigDecimal(base).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("winnowPairs: shared long substring is caught, disjoint docs are not") {
    val planted = Seq(
      (0L, "completely unrelated opening with the shared boilerplate passage here and a tail"),
      (1L, "different front matter but the shared boilerplate passage here survives rewriting"),
      (2L, "nothing in common with either of them at all zzz qqq xxx yyy www vvv")
    ).toDF("doc_id", "text")
    val out = Dedup.winnowPairs(planted, minShared = 2)
      .select("doc_a", "doc_b", "shared", "overlap")
      .as[(Long, Long, Long, Double)].collect()
    // the >= 11-char guarantee: "the shared boilerplate passage here" is
    // common to 0 and 1, so they MUST share fingerprints; 2 shares none
    assert(out.map(r => (r._1, r._2)).toSet == Set((0L, 1L)))
    val (_, _, shared, overlap) = out.head
    assert(shared >= 2 && overlap > 0.0 && overlap <= 1.0)
    // identical docs: full containment (overlap 1.0)
    val twins = Seq((0L, "the exact same text appears twice in this corpus"),
      (1L, "the exact same text appears twice in this corpus")).toDF("doc_id", "text")
    val t = Dedup.winnowPairs(twins, minShared = 1).select("overlap").as[Double].collect()
    assert(t.toSeq == Seq(1.0))
  }

  test("gopherRules: each rule trips on its planted violation, clean doc passes all") {
    // injects two distinct stop types so the default minStop=2 clears
    def stopped(n: Int, w: Int => String) =
      (1 to n).map(i => if (i % 7 == 0) "the" else if (i % 11 == 0) "of" else w(i)).mkString(" ")
    val planted = Seq(
      (0L, stopped(50, i => s"word$i")),                   // clean: passes all
      (1L, "too short the of"),                            // r_words (< 50)
      (2L, (1 to 60).map(_ => "incomprehensibilities").mkString(" ")), // r_mean_len (> 10)
      (3L, (stopped(45, i => s"w$i") + " " + (1 to 15).map(_ => "12345").mkString(" "))), // r_alpha (45/60 = 0.75)
      (4L, (1 to 60).map(i => s"word$i").mkString(" ")),   // r_stop (no stop words)
      (5L, (stopped(50, i => s"w$i") + " " + (1 to 10).map(_ => "#").mkString(" ")))  // r_symbol (10/60 > 0.1)
    ).toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis.gopherRules(planted)
      .select("doc_id", "r_words", "r_mean_len", "r_alpha", "r_stop", "r_symbol", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, true, true, true, true, true, true)))
    assert(!out(1L)._2 && !out(1L)._7)   // word count trips
    assert(!out(2L)._3 && !out(2L)._7)   // mean word length trips
    assert(!out(3L)._4 && !out(3L)._7)   // alpha fraction trips
    assert(out(3L)._2 && out(3L)._3)     // ...and ONLY that rule
    assert(!out(4L)._5 && !out(4L)._7)   // stop words trip
    assert(!out(5L)._6 && !out(5L)._7)   // symbol ratio trips
    assert(out(5L)._5)                   // its stop words still found
  }

  test("hardNegatives: near-dup positives excluded, near-but-not-dup candidates ranked") {
    import graft.llm.Ann
    // v0 = axis 0; v1 = v0 wiggled (cos ~0.99995 -> POSITIVE at tau 0.99,
    // must never surface as a negative); v2 = axis0 + 0.25*axis1
    // (cos ~0.970 -> the hard negative, and near enough that the md5
    // hyperplanes co-bucket it with v0 in some table); v3 orthogonal.
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (d, x) => a(d) = x }; a
    }
    val emb = Seq(
      0L -> v(0 -> 1.0f),
      1L -> v(0 -> 1.0f, 1 -> 0.01f),
      2L -> v(0 -> 1.0f, 1 -> 0.25f),
      3L -> v(7 -> 1.0f)).toDF("vec_id", "embedding")
    val out = Ann.hardNegatives(emb, kNeg = 5, posTau = 0.99).cache()
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.forall(_._3 < 0.99)) // no positive leaks into the negatives
    val anchor0 = rows.filter(_._1 == 0L)
    assert(!anchor0.exists(_._2 == 1L)) // the near-dup twin is excluded
    assert(anchor0.exists(_._2 == 2L))  // the hard negative is found
    // per-anchor ranks are 1..n ordered by cos desc
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length))
      assert(sorted.map(_._3).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true })
    }
    out.unpersist()
  }

  test("hardNegatives: a degenerate bucket over maxBucket is dropped before any pair forms") {
    import graft.llm.Ann
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (d, x) => a(d) = x }; a
    }
    // 40 identical vectors co-bucket in EVERY table (identical hash input
    // -> identical bucket); two distinct near vectors mine normally
    val boiler = (100L until 140L).map(_ -> v(0 -> 1.0f))
    val emb = (boiler ++ Seq(
      200L -> v(5 -> 1.0f, 6 -> 0.3f),
      201L -> v(5 -> 1.0f, 6 -> 0.5f))).toDF("vec_id", "embedding")
    val out = Ann.hardNegatives(emb, kNeg = 5, posTau = 0.999, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // no anchor from the degenerate cluster survives the bucket cap —
    // the O(B²) explode never materializes its ~40²/2 pairs
    assert(!out.exists(p => p._1 >= 100L && p._1 < 140L))
    // the legitimate pair still mines (both directions via symmetrize)
    assert(out.contains((200L, 201L)) && out.contains((201L, 200L)))
  }

  test("perplexityKn: continuation counts score promiscuity, not frequency") {
    // "francisco" occurs 6 times in the reference but ALWAYS after "san"
    // (continuation count 1); "common" occurs 6 times after 6 DIFFERENT
    // words (continuation count 6). A NOVEL bigram "nine francisco" must
    // score worse than "nine common" under KN — under pure frequency
    // (add-α) they'd tie. Docs 10/11 differ only in that bigram.
    val ref = Seq(
      (0L, "san francisco san francisco san francisco"),
      (1L, "san francisco san francisco san francisco"),
      (2L, "one common two common three common"),
      (3L, "four common five common six common"))
    val probes = Seq(
      (10L, "nine francisco"),
      (11L, "nine common"),
      (12L, "zzz"), // no bigrams -> ppl 0 by convention
      (13L, "qqq xyzzy")) // fully OOV bigram -> finite ppl
    val docs = (ref ++ probes).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityKn(docs, col("doc_id") <= 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(10L)._2 > out(11L)._2,
      s"novel 'x francisco' ${out(10L)._2} must be more perplexing than 'x common' ${out(11L)._2}")
    assert(out(12L) == (0L, 0.0))
    assert(out(13L)._1 == 1L && out(13L)._2 > 0.0 && !out(13L)._2.isInfinite)
    // seen-context discounting: a reference doc scores better than any probe
    assert(out(0L)._2 < out(11L)._2)
  }

  test("signCodes: known bit pattern packs into the exact half-codes") {
    // corpus of two mirrored vectors: per-dim mean is 0, so vec 0's
    // positive dims are exactly its set bits. Dims 0, 5, 31 (lo half)
    // and 32, 63 (hi half) positive -> lo = 1 + 32 + 2^31, hi = 1 + 2^31.
    val setBits = Set(0, 5, 31, 32, 63)
    val v = Array.tabulate(Ann.Dims)(d => if (setBits(d)) 1.0f else -1.0f)
    val corpus = Seq(
      (0L, v.toSeq), (1L, v.map(-_).toSeq)).toDF("vec_id", "embedding")
    val out = Ann.signCodes(corpus).orderBy("vec_id").collect()
    val lo0 = 1L + 32L + (1L << 31)
    val hi0 = 1L + (1L << 31)
    assert((out(0).getLong(1), out(0).getLong(2)) == (lo0, hi0))
    // the mirror vector is the complement within each 32-bit half
    assert(out(1).getLong(1) == (~lo0 & 0xffffffffL))
    assert(out(1).getLong(2) == (~hi0 & 0xffffffffL))
  }

  test("signTopK: Hamming ranking matches hand-computed popcounts") {
    // base vector + planted flips: distance in code space = #flipped dims
    // (mean-centering noise avoided by a symmetric corpus: for every
    // vector its mirror is present, so per-dim mean = 0)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(Ann.Dims)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    def flip(n: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => if (d < n) -x else x }
    val vecs = Seq(0 -> base, 1 -> flip(3), 2 -> flip(10), 3 -> flip(40))
    val corpus = (vecs.map { case (id, v) => (id.toLong, v.toSeq) } ++
      vecs.map { case (id, v) => (id + 100L, v.map(-_).toSeq) })
      .toDF("vec_id", "embedding")
    val out = Ann.signTopK(corpus, corpus.filter(col("vec_id") === 0L), k = 7)
      .orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // neighbors by true Hamming: 1@3, 2@10, 3@40, 103@24 (=64-40),
    // 102@54, 101@61, 100@64
    assert(out.toSeq == Seq((1L, 3L), (2L, 10L), (103L, 24L), (3L, 40L),
      (102L, 54L), (101L, 61L), (100L, 64L)))
  }

  test("signMihTopK: pigeonhole — every neighbor within radius nChunks-1 is found") {
    // 8 chunks of 8 bits: any code within Hamming 7 shares a chunk.
    // Plant neighbors at distances 1..7 scattered ACROSS chunks (worst
    // case for chunk equality) and verify MIH ranks them identically to
    // brute Hamming.
    val rnd = new scala.util.Random(11)
    val base = Array.fill(Ann.Dims)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    def flipAt(ds: Seq[Int]): Array[Float] =
      base.zipWithIndex.map { case (x, d) => if (ds.contains(d)) -x else x }
    // distance-d neighbor flips one bit in each of d DIFFERENT chunks
    val planted = (1 to 7).map { d =>
      (d.toLong, flipAt((0 until d).map(c => c * 8 + (c + d) % 8)).toSeq)
    }
    val corpus = ((0L, base.toSeq) +: planted)
    val sym = corpus ++ corpus.map { case (id, v) =>
      (id + 100L, v.map(x => -x)) }
    val df = sym.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
    val mih = Ann.signMihTopK(df, q, k = 7).orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(mih.toSeq == (1 to 7).map(d => (d.toLong, d.toLong)),
      s"got ${mih.toSeq}")
  }

  test("blocklist: word-boundary matching, adjacency overlap, empty docs") {
    val docs = Seq(
      (0L, "the key opens the key store"), // "the key" twice
      (1L, "soothe keyboard"),             // substring 'he key' must NOT fire
      (2L, "x x x"),                       // "x x" counts per adjacency: 2
      (3L, ""), (4L, "single"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklist(docs, Seq("the key", "x x"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) == ((2L, true)))
    assert(out(1L) == ((0L, false)))
    assert(out(2L) == ((2L, true)))
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((0L, false)))
  }

  test("frameSample: chunk law, short tail frame, every-k sampling, empty excluded") {
    // 10-byte frames, sample every 3rd: payload of 25 bytes -> frames
    // 0..2 (sizes 10,10,5), sampled idx {0} only? 0,3,... -> idx 0 of 3
    val docs = Seq(
      (0L, "a" * 25),   // 3 frames, sampled: idx 0
      (1L, "b" * 65),   // 7 frames, sampled: idx 0, 3, 6 (tail 5 bytes)
      (2L, ""))         // excluded
      .toDF("doc_id", "text")
    val out = Multimodal.frameSample(docs, frameBytes = 10, everyK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set((0L, 0L), (1L, 0L), (1L, 3L), (1L, 6L)))
    assert(out((0L, 0L))._1 == 10L)
    assert(out((1L, 6L))._1 == 5L) // tail frame is short, never padded
    assert(out((1L, 0L))._2 == "62" * 10) // 'b' = 0x62
    assert(out((1L, 6L))._2 == "62" * 5)
  }

  test("resizeNearest: gather index arithmetic on a crafted payload") {
    val docs = Seq((0L, "abcdefgh")).toDF("doc_id", "text")
    val row = Multimodal.resizeNearest(docs, outW = 16, outH = 16).collect()(0)
    // fake dims: w = 8*7%640+16 = 72; h = ascii('a')*13%480+16 = 317
    assert(row.getLong(1) == 72L && row.getLong(2) == 317L)
    val hex = row.getString(3)
    assert(hex.length == 512) // 256 pixels, 2 hex chars each
    // pixel (0,0): sy=sx=0 -> flat 0 -> 'a' (0x61)
    assert(hex.substring(0, 2) == "61")
    // pixel (x=1,y=0): sx = floor(1*72/16)=4 -> flat 4 % 8 = 4 -> 'e'
    assert(hex.substring(2, 4) == "65")
    // pixel (x=0,y=1): sy = floor(1*317/16)=19 -> flat 19*72 % 8 = 0 -> 'a'
    assert(hex.substring(32, 34) == "61")
  }

  test("graft_resize_nn: wrong-typed src dims fail at analysis, not at runtime") {
    // interpreted eval casts src_w/src_h to Long — an INT column used to
    // ClassCastException at runtime (while codegen happened to widen, a
    // path-dependent failure); the builder now rejects non-BIGINT dims
    graft.functions.ResizeNearestNN.register(spark)
    val df = Seq((0L, "abc")).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("w32", lit(72))    // INT, not BIGINT
      .withColumn("h64", lit(317L))
    val e = intercept[Exception] {
      df.select(expr("graft_resize_nn(payload, w32, h64, 4, 4)")).collect()
    }
    assert(e.getMessage.contains("src_w must be BIGINT"),
      s"expected analysis-time type error, got: ${e.getMessage}")
    // and the valid call still works
    assert(df.select(expr("graft_resize_nn(payload, cast(w32 as bigint), h64, 4, 4)"))
      .collect()(0).getString(0).length == 32)
  }

  test("resizeNearest: native gather ≡ declarative hex/substr formulation") {
    // multibyte UTF-8 + odd lengths so blen never divides the gather
    // strides — pins the (rowBase + sx) % blen indexing of the native
    // expression against an independent hex(payload)+substr derivation
    val docs = Seq((0L, "héllo wörld ✓ mixed bytes"), (1L, "x"),
        (2L, "Ā" * 37 + "!"), (3L, "ÿ tail"))
      .toDF("doc_id", "text")
    val got = Multimodal.resizeNearest(docs, outW = 5, outH = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val ref = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(length(col("payload")) > 0)
      .withColumn("hexp", hex(col("payload")))
      .withColumn("blen", length(col("payload")).cast("long"))
      .withColumn("src_w", (length(col("payload")) * 7 % 640 + 16).cast("long"))
      .withColumn("src_h",
        ((ascii(col("payload").cast("string")) * 13) % 480 + 16).cast("long"))
      .select(col("doc_id"), expr(
        """array_join(transform(sequence(0, 14), i ->
          |  substring(hexp, cast(((cast(floor(floor(cast(i as double) / 5) * src_h / 3) as bigint) * src_w
          |    + cast(floor(cast(i % 5 as double) * src_w / 5) as bigint)) % blen) * 2 + 1 as int), 2)),
          |'')""".stripMargin).as("out_hex"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == ref, s"native $got\ndeclarative $ref")
  }

  test("allPairsJoin: exact vs brute force, incl. boundary and hot-token-only pairs") {
    // planted: (0,1) share 7 of 9 union (J=0.777778); (2,3) exactly at
    // the 0.5 boundary (2 shared / 4 union); (4,5) share only the
    // corpus's HOTTEST tokens yet meet tau — the pair a df-capped index
    // drops and the prefix filter must still find; 6 overlaps 2/3 but
    // sits below tau; 7 empty.
    val hot = "the of and to" // made hot by appearing everywhere
    val docs = Seq(
      (0L, s"$hot aa bb cc dd"),
      (1L, s"$hot aa bb cc ee"),
      (2L, "pp qq rr"),
      (3L, "pp qq ss"),
      (4L, s"$hot"),
      (5L, s"$hot"),
      (6L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll"),
      (7L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.allPairsJoin(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force over the same token sets
    val ts = docs.select(col("doc_id"),
        array_distinct(Dedup.tokens(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
    val brute = ts.as("a").crossJoin(ts.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        round(size(array_intersect(col("a.ts"), col("b.ts"))).cast("double") /
          (size(col("a.ts")) + size(col("b.ts")) -
            size(array_intersect(col("a.ts"), col("b.ts")))).cast("double"), 6)
          .as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got.contains((2L, 3L)) && got((2L, 3L)) == 0.5) // boundary kept
    assert(got.contains((4L, 5L)) && got((4L, 5L)) == 1.0) // hot-token pair found
    assert(!got.keys.exists(k => k._1 == 7L || k._2 == 7L)) // empty excluded
  }

  test("editDistanceJoin: exact vs brute force, incl. short/gram-less strings") {
    // planted: (0,1) one substitution; (1,2) one insert; (3) two edits
    // from 0 (must NOT appear at k=1); (4,5) short strings (len <= 3, at
    // or below the k·q gram bound) one edit apart; (6) single char, one
    // edit from 7's empty string; (8,9) identical (dist 0); 10 shares
    // grams with 0 but is 4 edits away.
    val rows = Seq(
      (0L, "martha"), (1L, "martka"), (2L, "martka_"),
      (3L, "marthxy"), (4L, "abc"), (5L, "abd"), (6L, "x"), (7L, ""),
      (8L, "same"), (9L, "same"), (10L, "marbled")
    ).map { case (i, s) => (i, s) }.toDF("id", "s")
    val got = Dedup.editDistanceJoin(rows, "id", "s", k = 1, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got((0L, 1L)) == 1 && got((4L, 5L)) == 1 && got((8L, 9L)) == 0)
    assert(got.contains((6L, 7L))) // gram-less pair via the short bucket
    assert(!got.contains((0L, 3L)) && !got.contains((0L, 10L)))
  }

  test("editDistanceJoin: k=2 widens exactly to the brute-force k=2 set") {
    val rows = Seq((0L, "kitten"), (1L, "sitten"), (2L, "sittin"),
      (3L, "sitting"), (4L, "mitten"), (5L, "bitten"), (6L, "fitted"))
      .toDF("id", "s")
    val got = Dedup.editDistanceJoin(rows, "id", "s", k = 2, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got((0L, 2L)) == 2 && got((2L, 3L)) == 1)
  }

  test("editDistanceLookup: probe-vs-reference pairs exact vs brute, k=1 and k=2") {
    val ref = Seq((0L, "martha"), (1L, "marhta"), (2L, "same"), (3L, "x"),
      (4L, "")).toDF("rid", "rs")
    val probe = Seq((10L, "martha"), (11L, "marta"), (12L, "sime"),
      (13L, ""), (14L, "zzzzz")).toDF("pid", "ps")
    for (k <- Seq(1, 2)) {
      val got = Dedup.editDistanceLookup(probe, "pid", "ps", ref, "rid", "rs", k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val brute = probe.crossJoin(ref)
        .select(col("pid"), col("rid"), levenshtein(col("ps"), col("rs")).as("d"))
        .filter(col("d") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got == brute, s"k=$k got $got\nbrute $brute")
    }
    // spot: exact match dist 0, deletion dist 1, empty-empty dist 0
    val g1 = Dedup.editDistanceLookup(probe, "pid", "ps", ref, "rid", "rs", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(g1((10L, 0L)) == 0 && g1((11L, 0L)) == 1 && g1((13L, 4L)) == 0)
    assert(!g1.keys.exists(_._1 == 14L))
  }

  test("editDistanceJoin: k=3 exercises the q-gram prefix path, exact vs brute") {
    val rows = Seq((0L, "kitten"), (1L, "sitting"), (2L, "mittens"),
      (3L, "bitter"), (4L, "kit"), (5L, "written"), (6L, "smitten"),
      (7L, "xyzzy")).toDF("id", "s")
    val got = Dedup.editDistanceJoin(rows, "id", "s", k = 3, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got((0L, 1L)) == 3) // the classic kitten→sitting
    assert(!got.keys.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("edit-distance family fails LOUDLY when a bucket exceeds maxBucket") {
    // 5 identical strings: every deletion variant bucket holds 5 > 4
    val rows = (0L until 5L).map(i => (i, "same")).toDF("id", "s")
    val e = intercept[IllegalStateException] {
      Dedup.editDistanceJoin(rows, "id", "s", k = 1, maxBucket = 4).collect()
    }
    assert(e.getMessage.contains("maxBucket"))
    val e2 = intercept[IllegalStateException] {
      Dedup.editDistanceLookup(Seq((0L, "same")).toDF("pid", "ps"),
        "pid", "ps", rows, "id", "s", k = 1, maxBucket = 4).collect()
    }
    assert(e2.getMessage.contains("no-false-negatives"))
    // q-gram path (k=3): same corpus, every (gram, occ) bucket holds 5
    val e3 = intercept[IllegalStateException] {
      Dedup.editDistanceJoin(rows, "id", "s", k = 3, maxBucket = 4).collect()
    }
    assert(e3.getMessage.contains("editDistanceJoin"))
    // and a roomy brake stays silent: the same corpora succeed
    assert(Dedup.editDistanceJoin(rows, "id", "s", k = 1).count() == 10)
  }

  test("normalizeUnicode: NFC composes, NFKC also folds compatibility forms, both idempotent") {
    val df = Seq((0L, "Cafe\u0301 ＡＢＣ ﬁne")).toDF("doc_id", "text")
    def one(mode: String): String = df.select(
      TextAnalysis.normalizeUnicode(col("text"), mode)).head().getString(0)
    val nfc = one("NFC")
    assert(nfc == "Caf\u00e9 ＡＢＣ ﬁne") // composes é, keeps fullwidth/ligature
    val nfkc = one("NFKC")
    assert(nfkc == "Caf\u00e9 ABC fine") // + fullwidth→ASCII, ﬁ→fi
    // idempotence: a second pass is the identity
    val twice = Seq((0L, nfkc)).toDF("doc_id", "text").select(
      TextAnalysis.normalizeUnicode(col("text"), "NFKC")).head().getString(0)
    assert(twice == nfkc)
    // null passes through as null
    val n = Seq((0L, null: String)).toDF("doc_id", "text").select(
      TextAnalysis.normalizeUnicode(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("collocations: PMI ranks the planted pair above independent words") {
    // "neural nets" always adjacent (high PMI); "the" appears with
    // everything (low PMI for any "the x" pair); pairs under minCount
    // are excluded.
    val doc = "neural nets the cat the dog the fish neural nets"
    val docs = (0L to 9L).map(i => (i, doc)).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 5, topK = 10)
      .collect()
    val byPair = got.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(5)).toMap
    assert(byPair.contains(("neural", "nets")))
    // rare-but-always-together outranks the hub word's pairs
    val thePairs = byPair.keys.filter(_._1 == "the")
    assert(thePairs.forall(p => byPair(p) < byPair(("neural", "nets"))))
    // counts are exact: "neural nets" occurs twice per doc × 10 docs
    val row = got.find(r => r.getString(0) == "neural").get
    assert(row.getLong(2) == 20L)
  }

  test("budget operators accept the byte-fallback tokenizer (unigram_raw)") {
    val docs = Seq(
      (0L, "Mixed CASE text!", "a", 10L),
      (1L, "plain lower words", "a", 10L),
      (2L, "Ünïçødé costs bytes ☃", "b", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    // the budget math must run off encodeRaw counts: full budget keeps
    // every doc and kept_tok == the raw piece count, which prices case
    // and multi-byte chars instead of dropping them
    val rawCounts = Unigram.encodeRaw(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Curation.mixByBudget(docs, budget = 1000000L,
        tokenizer = "unigram_raw")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("tok"))).toMap
    assert(out == rawCounts)
    // raw counts strictly exceed whitespace counts on the unicode doc
    val ws = Curation.mixByBudget(docs, budget = 1000000L)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("tok"))).toMap
    assert(rawCounts(2L) > ws(2L))
  }

  test("blocklist: mixed-length phrases (1/2/3 words), normalization, loud reject") {
    val docs = Seq(
      (0L, "spam spam wonderful spam"),     // "spam" x3 (unigram)
      (1L, "click here to win big prizes"), // "click here to" (trigram) + "win" (unigram)
      (2L, "a b a b a"),                    // "a b a" counts per adjacency: 2
      (3L, "nothing flagged at all"),
      (4L, "win win"))                      // "win" x2
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklist(docs,
      Seq("spam", "win", "Click HERE, to!", "a b a")) // normalization law
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) == ((3L, true)))
    assert(out(1L) == ((2L, true)))  // trigram + unigram both fire
    assert(out(2L) == ((2L, true)))  // overlapping trigram: per adjacency
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((2L, true)))
    // length law: an L-word phrase never matches an (L±1)-gram
    val sub = TextAnalysis.blocklist(docs, Seq("click here"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sub(1L) == 1L) // bigram fires inside the trigram span
    // duplicate phrases (post-normalization) count once
    val dup = TextAnalysis.blocklist(docs, Seq("win", "WIN!"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup(4L) == 2L)
    // a phrase with no alphanumeric words is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.blocklist(docs, Seq("win", "!!!"))
    }
    assert(ex.getMessage.contains("never match"))
  }
}
