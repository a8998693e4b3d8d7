package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Sketches}

/** Mergeable-sketch operators: Bloom decontamination, HLL distinct
  * estimates, count-min frequencies — including the merge laws that make
  * them shardable at scale. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    // contains bench 5-gram "alpha beta gamma delta epsilon"
    (0L, "prefix words alpha beta gamma delta epsilon suffix words here"),
    (1L, "totally unrelated text about distributed query engines and shuffles"),
    (2L, "short") // < 5 tokens: no grams at all
  ).toDF("doc_id", "text")

  test("bloom decontamination flags every exact hit (no false negatives)") {
    val bloom = Sketches.decontaminateBloom(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val exact = Curation.decontaminateAgainst(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(bloom.keySet == Set(0L, 1L, 2L))
    // every exact-contaminated doc must be bloom-contaminated
    exact.foreach { case (id, c) => if (c) assert(bloom(id)) }
    assert(bloom(0L) && !bloom(2L))
    // at the default 2^18 bits this corpus has no false positives either
    assert(bloom == exact)
  }

  test("tiny bloom filter produces false positives but still no false negatives") {
    val tiny = Sketches.decontaminateBloom(corpus, bench, mBits = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // 4 slots saturate: everything with grams collides into "contaminated"
    assert(tiny(0L), "true hit must survive any filter size")
    assert(tiny(1L), "saturated filter must over-flag, never under-flag")
    assert(!tiny(2L), "gram-less docs can never be flagged")
  }

  test("HLL estimate is within the published error band of the true cardinality") {
    val n = 3000
    // 100 docs x 30 unique tokens each, all distinct corpus-wide
    val docs = (0 until 100).map { d =>
      (d.toLong, (0 until 30).map(i => s"tok${d * 30 + i}").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val row = Sketches.hllEstimate(docs).collect().head
    val est = row.getAs[Double]("est")
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact == n)
    // 1.04/sqrt(1024) ~ 3.3% std error; 15% is ~4.5 sigma
    assert(math.abs(est - n) / n < 0.15, s"est $est vs $n")
  }

  test("HLL registers merge by element-wise max: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val a = Seq((0L, "apple banana cherry date", "en")).toDF("doc_id", "text", "lang")
    val b = Seq((1L, "cherry date elderberry fig grape", "en")).toDF("doc_id", "text", "lang")
    val whole = Sketches.hllRegisters(a.unionByName(b))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = Sketches.hllMerge(Sketches.hllRegisters(a), Sketches.hllRegisters(b))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(whole == merged)
  }

  test("CMS estimates dominate true counts, and a wide grid is collision-free on a small vocab") {
    val docs = Seq(
      (0L, "a a a b b c word word word word"),
      (1L, "a b c d e word")
    ).toDF("doc_id", "text")
    val out = Sketches.cmsTopK(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (tok, t, e) => assert(e >= t, s"$tok: est $e < true $t") }
    // 4x8192 cells vs 6 tokens: no collisions, estimates exact
    val wide = Sketches.cmsTopK(docs, topK = 10, w = 8192).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    wide.foreach { case (tok, t, e) => assert(e == t, s"$tok: est $e != true $t") }
    assert(wide.map { case (tok, t, _) => tok -> t }.toMap.apply("word") == 5L)
  }

  test("quantile sketch: 2-digit binning, est <= exact < est * 1.1, bins merge by sum") {
    // 1000 values 1..1000 in one group: exact p50=500, p90=900, p99=990
    val vals = (1 to 1000).map(v => ("s", v.toLong)).toDF("source", "n_chars")
    val row = Sketches.quantileSketch(vals, "n_chars", "source").collect().head
    assert(row.getAs[Long]("n") == 1000L)
    val exact = Map("p50" -> 500L, "p90" -> 900L, "p99" -> 990L)
    exact.foreach { case (c, e) =>
      val est = row.getAs[Long](c)
      assert(est <= e && e < est + est / 10 + 10, s"$c: est $est exact $e")
    }
    // merge law: bins(A union B) == sum-merge(bins(A), bins(B))
    val a = vals.filter(col("n_chars") <= 400)
    val b = vals.filter(col("n_chars") > 400)
    val whole = Sketches.quantileBins(vals, "n_chars", "source")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.quantileBins(a, "n_chars", "source")
      .unionByName(Sketches.quantileBins(b, "n_chars", "source"))
      .groupBy("source", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
    // and estimates off the merged bins equal the whole-corpus estimates
    val fromMerged = Sketches.quantileEstimates(
      Sketches.quantileBins(a, "n_chars", "source")
        .unionByName(Sketches.quantileBins(b, "n_chars", "source"))
        .groupBy("source", "bin").agg(sum("cnt").as("cnt")),
      "source").collect().head
    Seq("n", "p50", "p90", "p99").foreach { c =>
      assert(fromMerged.getAs[Long](c) == row.getAs[Long](c))
    }
  }

  test("sketch builders are streaming-transparent: same code, complete mode, batch-identical state") {
    // The sketch IS the streaming state: register/cell/bin key spaces are
    // bounded, so hllRegisters and cmsCounters run UNCHANGED on a stream.
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_stream")
    val half1 = Seq((0L, "apple banana cherry", "en"), (1L, "banana date", "en"))
      .toDF("doc_id", "text", "lang")
    val half2 = Seq((2L, "cherry elderberry fig apple", "en"), (3L, "grape", "de"))
      .toDF("doc_id", "text", "lang")
    half1.coalesce(1).write.parquet(s"$dir/b1")
    half2.coalesce(1).write.parquet(s"$dir/b2")
    val all = half1.unionByName(half2)
    val schema = all.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force >= 2 micro-batches
      .parquet(s"$dir/*")
    val q1 = Sketches.hllRegisters(stream)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val q2 = Sketches.cmsCounters(stream)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q2.awaitTermination(120000)
    val hllStreamed = spark.sql("SELECT * FROM hll_stream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val hllBatch = Sketches.hllRegisters(all)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(hllStreamed == hllBatch && hllBatch.nonEmpty)
    val cmsStreamed = spark.sql("SELECT * FROM cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cmsBatch = Sketches.cmsCounters(all)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cmsStreamed == cmsBatch && cmsBatch.nonEmpty)
  }

  test("sketch store: build-half + append-rest equals one-pass build, and freq lookup dominates truth") {
    val docsAll = Seq(
      (0L, "alpha beta gamma alpha", "en", 22L),
      (1L, "beta delta epsilon", "en", 18L),
      (2L, "zeta eta theta iota kappa", "de", 25L),
      (3L, "alpha zeta mu nu", "de", 16L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val storeInc = java.nio.file.Files.createTempDirectory("sk_inc").toString
    val storeOne = java.nio.file.Files.createTempDirectory("sk_one").toString
    graft.llm.SketchStore.build(docsAll.filter(col("doc_id") <= 1), storeInc)
    graft.llm.SketchStore.append(docsAll.filter(col("doc_id") > 1), storeInc)
    graft.llm.SketchStore.build(docsAll, storeOne)
    // tables hold merge-on-read PARTIALS (one per build/append) — the
    // invariant is the FOLDED tables being identical, and compact()
    // collapsing the incremental store back to the one-pass bytes
    def folded(store: String, t: String) = {
      val df = spark.read.parquet(s"$store/$t.parquet")
      val f = t match {
        case "hll" => df.groupBy("lang", "idx").agg(max("mreg").as("mreg"))
        case "cms" => df.groupBy("j", "c").agg(sum("cnt").as("cnt"))
        case "kmv" => df.distinct() // fold = distinct + truncate (< k here)
        case _ => df.groupBy("lang", "bin").agg(sum("cnt").as("cnt"))
      }
      f.collect().map(_.toSeq).toSet
    }
    for (t <- Seq("hll", "cms", "qbins", "kmv")) {
      val inc = folded(storeInc, t)
      assert(inc == folded(storeOne, t),
        s"store table $t diverged between incremental and one-pass")
      assert(inc.nonEmpty)
    }
    graft.llm.SketchStore.compact(storeInc)
    for (t <- Seq("hll", "cms", "qbins", "kmv"))
      assert(spark.read.parquet(s"$storeInc/$t.parquet").collect()
        .map(_.toSeq).toSet ==
        spark.read.parquet(s"$storeOne/$t.parquet").collect()
          .map(_.toSeq).toSet,
        s"compacted table $t != one-pass build")
    // estimates read back from the incremental store
    val est = graft.llm.SketchStore.hllEstimates(spark, storeInc)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(est.keySet == Set("en", "de"))
    // small-range correction regime: estimates should be near the true 5/7
    assert(math.abs(est("en") - 5.0) < 2.0 && math.abs(est("de") - 7.0) < 2.5)
    // KMV estimates: sets far below k=256 fall back to EXACT counts
    val kmv = graft.llm.SketchStore.kmvEstimates(spark, storeInc)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // true distinct: en {alpha,beta,gamma,delta,epsilon} = 5,
    // de {zeta,eta,theta,iota,kappa,alpha,mu,nu} = 8
    assert(kmv("en") == ((5L, 5.0)) && kmv("de") == ((8L, 8.0)))
    val probe = Seq("alpha", "beta", "nosuchtoken").toDF("token")
    val freq = graft.llm.SketchStore.freqLookup(spark, storeInc, probe)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("alpha") >= 3L && freq("beta") >= 2L)
    assert(freq.contains("nosuchtoken")) // absent tokens still answer (possibly > 0: FP mass)
  }

  test("CMS grids merge by cell-wise sum") {
    val a = Seq((0L, "x y z x")).toDF("doc_id", "text")
    val b = Seq((1L, "y z w")).toDF("doc_id", "text")
    val whole = Sketches.cmsCounters(a.unionByName(b))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.cmsCounters(a).unionByName(Sketches.cmsCounters(b))
      .groupBy("j", "c").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  /** Planted overlap: even docs carry tokens t0..t2999, odd docs
    * t2000..t4999 → union 5000, intersection 1000, Jaccard 0.2. */
  private def overlapDocs = (0 until 100).map { d =>
    val base = if (d % 2 == 0) (d / 2) * 60 else 2000 + (d / 2) * 60
    (d.toLong, (0 until 60).map(i => s"t${base + i}").mkString(" "))
  }.toDF("doc_id", "text")

  test("KMV: set-op estimates within the k=256 error band; audits exact") {
    val row = Sketches.kmvOverlap(overlapDocs).collect().head
    assert(row.getAs[Long]("exact_union") == 5000L)
    assert(row.getAs[Long]("exact_inter") == 1000L)
    // rel std ~ 1/sqrt(k-2) ~ 6.3%; 20% is > 3 sigma
    assert(math.abs(row.getAs[Double]("d_even") - 3000.0) / 3000.0 < 0.20)
    assert(math.abs(row.getAs[Double]("d_odd") - 3000.0) / 3000.0 < 0.20)
    assert(math.abs(row.getAs[Double]("union_est") - 5000.0) / 5000.0 < 0.20)
    // rho std ~ sqrt(0.2*0.8/256) ~ 0.025; 0.08 is > 3 sigma
    assert(math.abs(row.getAs[Double]("jaccard_est") - 0.2) < 0.08)
    assert(math.abs(row.getAs[Double]("inter_est") - 1000.0) / 1000.0 < 0.35)
  }

  test("KMV merge law: sketch(A union B) == k-smallest of K(A) ++ K(B)") {
    val tok = overlapDocs.select(
      when(col("doc_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
        .as("half"),
      explode(graft.llm.Dedup.tokens(col("text"))).as("token"))
    val halves = Sketches.kmvSketch(tok, "half", "token", k = 64)
      .collect().map(_.getAs[scala.collection.Seq[Long]]("hs"))
    val merged = halves.flatten.distinct.sorted.take(64).toSeq
    val whole = Sketches
      .kmvSketch(tok.withColumn("half", lit("all")), "half", "token", k = 64)
      .collect().head.getAs[scala.collection.Seq[Long]]("hs").toSeq
    assert(merged == whole)
  }

  test("KMV small sets fall back to exact counts") {
    val docs = Seq((0L, "a b c"), (1L, "b c d e")).toDF("doc_id", "text")
    val row = Sketches.kmvOverlap(docs).collect().head
    assert(row.getAs[Double]("d_even") == 3.0)
    assert(row.getAs[Double]("d_odd") == 4.0)
    assert(row.getAs[Double]("union_est") == 5.0)
    assert(row.getAs[Double]("jaccard_est") == 0.4)
    assert(row.getAs[Double]("inter_est") == 2.0)
    assert(row.getAs[Long]("exact_union") == 5L)
    assert(row.getAs[Long]("exact_inter") == 2L)
  }
}
