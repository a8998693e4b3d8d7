package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Curation

/** Behavior of the corpus-curation ops ([[graft.llm.Curation]]) on planted
  * inputs, including the banded two-phase budget cut's exact equivalence to
  * the naive global window it replaces. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, src: String, words: Int, word: String = "w"): (Long, String, String) =
    (id, (1 to words).map(i => s"$word$i").mkString(" "), src)

  test("decontaminate flags exactly the docs sharing a benchmark n-gram") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),          // bench (isBench below)
      (1L, "alpha beta gamma delta epsilon zeta eta"),      // superset: contaminated
      (2L, "one two three four five six seven"),            // disjoint: clean
      (3L, "zz alpha beta gamma delta epsilon yy"),         // inner 5-gram overlap
      (4L, "too short")                                     // < n tokens: 0 grams
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, col("doc_id") === 0L, n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(!out.contains(0L))                       // bench doc not in output
    assert(out(1L)._3 && out(1L)._2 == 2)           // both bench 5-grams present
    assert(out(2L) == ((3L, 0L, false)))
    assert(out(3L)._3 && out(3L)._2 == 1)           // "alpha..epsilon" only
    assert(out(4L) == ((0L, 0L, false)))            // short doc kept with 0 grams
  }

  test("stratified sampling: rate 100 keeps all, rate 0 keeps none, default applies") {
    val docs = (0L until 60L).map(i =>
      (i, s"text body number $i", if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.sampleStratified(docs, col("lang"),
      Map("a" -> 100, "b" -> 0), defaultRate = 50)
    val byStratum = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum("a") == 20)
    assert(!byStratum.contains("b"))
    assert(byStratum.getOrElse("c", 0L) > 0 && byStratum("c") < 20)
    // deterministic: same rows on a second run
    val again = Curation.sampleStratified(docs, col("lang"),
      Map("a" -> 100, "b" -> 0), defaultRate = 50)
    assert(out.collect().toSet == again.collect().toSet)
  }

  test("span dedup: shared boilerplate chunk kept only at its first occurrence") {
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ") // one 5-token chunk
    val docs = Seq(
      (0L, boiler + " " + (1 to 5).map(i => s"x$i").mkString(" ")),  // chunks: boiler, x
      (1L, boiler + " " + (1 to 5).map(i => s"y$i").mkString(" ")),  // boiler dup + unique y
      (2L, (1 to 10).map(i => s"z$i").mkString(" ")),                // fully unique
      (3L, "")                                                       // empty: 0 spans
    ).toDF("doc_id", "text")
    val out = Curation.dedupSpans(docs, span = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((2L, 2L, 1.0)))        // first occurrence keeps everything
    assert(out(1L) == ((2L, 1L, 0.5)))        // boiler chunk deduped away
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((0L, 0L, 1.0)))        // empty doc: vacuously kept
  }

  test("substring dedup catches the 1-token-shifted passage dedup_spans misses") {
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ") // 5-token passage
    val docs = Seq(
      (0L, boiler + " " + (1 to 5).map(i => s"x$i").mkString(" ")),
      // the same passage shifted ONE token off the 5-chunk boundary:
      // chunks are (pad b1 b2 b3 b4) and (b5 y1 y2 y3 y4) — neither
      // equals doc 0's (b1..b5) chunk, so dedupSpans sees nothing
      (1L, "pad " + boiler + " " + (1 to 4).map(i => s"y$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Curation.dedupSpans(docs, span = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(spans(1L) == 1.0) // the shifted duplicate ESCAPES span dedup
    val substr = Curation.dedupSubstr(docs, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(substr(0L) == ((10L, 0L, 1.0)))     // first occurrence untouched
    assert(substr(1L)._2 == 5L)                // ... substring dedup catches all 5 tokens
    assert(substr(1L)._3 == 0.5)
    assert(substr(2L) == ((10L, 0L, 1.0)))     // unique doc untouched
  }

  test("substring dedup: overlapping in-doc repeats merge to exact coverage") {
    // doc 0: "w1..w6 w1..w6 tail" — the repeated 6-token run at positions
    // 7..12 (1-based) yields hits at 0-based p∈{6} for k=6 → coverage 6
    val six = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, six + " " + six + " t1 t2"),
      // doc 1 repeats doc 0's run once more: every sliding 6-gram of it is
      // already claimed by doc 0 → hits at p=0..? doc1 = six + " u1" (7 toks):
      // grams p∈{0,1}; p=0 (w1..w6) dups doc0's p=0 → coverage 6
      (1L, six + " u1"),
      (2L, "")
    ).toDF("doc_id", "text")
    val out = Curation.dedupSubstr(docs, k = 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 0 has 14 tokens, grams at p=0..8; the self-repeat means gram
    // p=6 (w1..w6 again) collides with p=0 → one hit, coverage 6
    assert(out(0L) == ((14L, 6L, round4(1.0 - 6.0 / 14))))
    assert(out(1L)._2 == 6L)
    assert(out(2L) == ((0L, 0L, 1.0)))
  }

  test("substring dedup: a hot gram shared by most of the corpus (de-skewed path)") {
    // The r11 verdict's scale-killer scenario in miniature: ONE gram
    // ("h1..h5", a boilerplate header) opens 50%+ of all docs. The
    // de-skewed implementation resolves its first occurrence through a
    // map-side-combinable groupBy min — no per-key window sort — and the
    // result must be: the lowest (doc_id, p) occurrence keeps, every
    // other doc pays exactly k tokens of coverage at p=0.
    val hot = (1 to 5).map(i => s"h$i").mkString(" ")
    val docs = (0L until 20L).map(i => (i, s"$hot x${i}a x${i}b")).toDF("doc_id", "text")
    val out = Curation.dedupSubstr(docs, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((7L, 0L, 1.0)))          // first occurrence keeps
    (1L until 20L).foreach { i =>
      assert(out(i) == ((7L, 5L, round4(1.0 - 5.0 / 7))), s"doc $i")
    }
  }

  private def round4(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("sequence packing: bucketed prefix sum == global window; spans are contiguous") {
    val docs = (0L until 57L).map(i =>
      (i, if (i % 7 == 3) "" else (1 to (3 + (i % 11)).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    // tiny bucketWidth forces many buckets → the two-phase path is exercised
    val out = Curation.packSequences(docs, blockSize = 16L, bucketWidth = 5L)
      .orderBy("doc_id")
      .select("doc_id", "tok", "off", "first_block", "last_block", "block_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // naive single-pass check
    var off = 0L
    out.foreach { case (id, tok, o, fb, lb, bo) =>
      assert(o == off, s"doc $id offset")
      assert(fb == o / 16 && bo == o % 16)
      assert(lb == math.max((o + tok - 1) / 16, o / 16), s"doc $id last_block")
      off += tok
    }
    // consecutive docs tile the token stream with no gaps or overlaps
    assert(out.sliding(2).forall { case Array(a, b) => a._3 + a._2 == b._3; case _ => true })
    // output is bucketWidth-invariant: single-bucket (default 1e6) == many-bucket
    val oneBucket = Curation.packSequences(docs, blockSize = 16L)
      .orderBy("doc_id")
      .select("doc_id", "tok", "off", "first_block", "last_block", "block_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(oneBucket.toSeq == out.toSeq)
    // tokenizer: tab/CR/LF are separators, runs collapse, empty → 0 tokens
    val weird = Seq((0L, "a\tb\r\nc  d "), (1L, ""), (2L, " \t\r\n"), (3L, "x"))
      .toDF("doc_id", "text")
    val toks = Curation.packSequences(weird, blockSize = 4L).orderBy("doc_id")
      .select("tok").as[Long].collect().toSeq
    assert(toks == Seq(4L, 0L, 0L, 1L))
  }

  /** The naive definition the two-phase cut must reproduce row-for-row. */
  private def naiveMix(docs: DataFrame, budget: Long): Set[(String, Long, Long)] = {
    val scored = graft.llm.TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score").as("p"))
      .join(docs.select(col("doc_id"), col("source"),
        size(expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)"))
          .cast("long").as("tok")), "doc_id")
    val w = Window.partitionBy("source").orderBy(col("p").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    scored.withColumn("cum", sum("tok").over(w))
      .filter(col("cum") <= budget)
      .select("source", "doc_id", "tok")
      .as[(String, Long, Long)].collect().toSet
  }

  test("mixByBudget two-phase cut == global window, including boundary bands") {
    // Two sources; varied word counts so quality scores (and bands) spread;
    // several docs share a band so the boundary band holds >1 doc.
    val docs = (
      (0 until 30).map(i => doc(i.toLong, "web", words = 5 + 7 * (i % 9))) ++
      (0 until 20).map(i => doc(100L + i, "books", words = 10 + 11 * (i % 5)))
    ).toDF("doc_id", "text", "source")
    for (budget <- Seq(0L, 37L, 120L, 350L, 100000L)) {
      val fast = Curation.mixByBudget(docs, budget)
        .as[(String, Long, Long)].collect().toSet
      assert(fast == naiveMix(docs, budget), s"budget=$budget")
    }
  }

  test("mixByBudget: zero-token docs ride on the budget edge consistently") {
    val docs = Seq(
      (0L, "a b c d e f g h i j", "s"),   // 10 tokens
      (1L, "", "s"),                      // 0 tokens — cum stays where it is
      (2L, "k l m n o", "s")              // 5 tokens
    ).toDF("doc_id", "text", "source")
    for (budget <- 0L to 16L) {
      val fast = Curation.mixByBudget(docs, budget)
        .as[(String, Long, Long)].collect().toSet
      assert(fast == naiveMix(docs, budget), s"budget=$budget")
    }
  }

  test("temperature mixing: alpha < 1 lifts the low-resource source's share") {
    // big: 90 docs × 10 tokens = 900; small: 10 docs × 10 = 100.
    // Distinct word stems per doc: the draw hashes the TEXT, so identical
    // texts would share one draw and keep/drop whole sources atomically.
    val docs = ((0L until 90L).map(i => doc(i, "big", 10, s"b$i")) ++
      (100L until 110L).map(i => doc(i, "small", 10, s"s$i")))
      .toDF("doc_id", "text", "source")
    def rates(alpha: Double): Map[String, Double] =
      Curation.mixByTemperature(docs, alpha, budget = 500L)
        .select("source", "rate9").distinct()
        .as[(String, Double)].collect().toMap
    val natural = rates(1.0)
    val flat = rates(0.1)
    // natural (alpha=1): q_s = m_s/total, so both rates equal budget/total
    assert(math.abs(natural("big") - natural("small")) < 1e-9)
    // flattened: the small source's keep-rate rises, the big one's falls
    assert(flat("small") > natural("small") && flat("big") < natural("big"))
    // rates respect the cap: a fully-kept source never exceeds rate 1
    assert(rates(0.0001).values.forall(r => r > 0.0 && r <= 1.0))
    // deterministic: same call twice, same kept set
    val a = Curation.mixByTemperature(docs, 0.5, 500L).select("doc_id")
      .as[Long].collect().toSet
    val b = Curation.mixByTemperature(docs, 0.5, 500L).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("mixByCluster: discovered clusters replace source labels, mass flattens across them") {
    // seeds = first 2 embeddings; docs 0,2,3,4 land in cluster 0 (heavy),
    // docs 1,5 in cluster 1 (light)
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f)),
      (4L, Array(0.95f, 0.05f)), (5L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val docs = (0L to 5L).map(i =>
        (i, (s"w$i " * 20).trim, "irrelevant")).toSeq
      .toDF("doc_id", "text", "source")
    val out = Curation.mixByCluster(docs, emb, alpha = 0.1, budget = 100L,
        nCentroids = 2)
      .select("source", "doc_id", "rate9")
      .as[(String, Long, Double)].collect()
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySrc.keySet.subsetOf(Set("cluster_0", "cluster_1")))
    // cluster membership drove the grouping, not the (constant) source col
    assert(bySrc.values.flatten.toSet.subsetOf(Set(0L, 2L, 3L, 4L, 1L, 5L)))
    val rates = out.map(r => r._1 -> r._3).toMap
    // flattening: the light cluster keeps a higher rate than the heavy one
    assert(rates("cluster_1") > rates("cluster_0"))
  }

  test("span corruption: sentinels line up and inputs+targets reconstruct the doc") {
    // doc 0: chunk c masked iff c % 7 == 0 → chunks 0, 7 of 10 chunks
    val docs = Seq(doc(0L, "s", 30), doc(6L, "s", 10), doc(3L, "s", 0))
      .toDF("doc_id", "text", "source")
    val out = Curation.spanCorrupt(docs, span = 3, period = 7)
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains(3L)) // empty doc emits nothing
    val (_, nc0, nm0, in0, tgt0) = out(0L)
    assert(nc0 == 10 && nm0 == 2)
    assert(in0.startsWith("<X_0>") && in0.contains("<X_1>"))
    assert(tgt0 == "<X_0> w1 w2 w3 <X_1> w22 w23 w24")
    // doc 6: (c + 6) % 7 == 0 → chunk 1 of 4 (10 tokens → 4 chunks)
    val (_, nc6, nm6, in6, tgt6) = out(6L)
    assert(nc6 == 4 && nm6 == 1)
    assert(in6 == "w1 w2 w3 <X_0> w7 w8 w9 w10" && tgt6 == "<X_0> w4 w5 w6")
    // reconstruction: substituting each sentinel's target span back into
    // the input recovers the original token stream
    def reconstruct(inp: String, tgt: String): String = {
      val spans = "<X_\\d+> ((?:(?!<X_)\\S+ ?)+)".r.findAllMatchIn(tgt)
        .map(_.group(1).trim).toSeq
      spans.zipWithIndex.foldLeft(inp) { case (s, (sp, k)) => s.replace(s"<X_$k>", sp) }
    }
    assert(reconstruct(in0, tgt0) == (1 to 30).map("w" + _).mkString(" "))
    assert(reconstruct(in6, tgt6) == (1 to 10).map("w" + _).mkString(" "))
  }

  test("chunk overlap: full coverage, stride geometry, short tail, empty doc") {
    // 25 tokens, size 10, stride 6 → starts 0,6,12 then 18 (18+10 ≥ 25): 4 chunks
    val docs = Seq(doc(0L, "s", 25), doc(1L, "s", 3), doc(2L, "s", 0),
      doc(3L, "s", 10)).toDF("doc_id", "text", "source")
    val out = Curation.chunkOverlap(docs, chunkSize = 10, stride = 6)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    assert(!out.contains(2L))                       // empty doc emits nothing
    assert(out(1L).map(c => (c._2, c._3)).toSeq == Seq((0L, 3L)))
    assert(out(3L).map(c => (c._2, c._3)).toSeq == Seq((0L, 10L))) // exact fit: 1 chunk
    val c0 = out(0L)
    assert(c0.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(c0.map(_._3).toSeq == Seq(10L, 10L, 10L, 7L))           // short tail
    assert(c0(1)._4 == (7 to 16).map("w" + _).mkString(" "))       // start = stride
    // consecutive chunks overlap by chunkSize - stride = 4 tokens
    assert(c0(0)._4.split(" ").takeRight(4).toSeq == c0(1)._4.split(" ").take(4).toSeq)
    // coverage: union of chunk tokens = the whole doc
    assert(c0.flatMap(_._4.split(" ")).toSet == (1 to 25).map("w" + _).toSet)
  }

  test("DSIR weights: target-like docs score above off-target docs") {
    // target exemplars (tgt vocab), on-target candidate, off-target candidate
    val docs = Seq(
      (0L, "cats purr and cats nap on warm mats", "en"),
      (1L, "cats chase mice and nap on mats", "en"),
      (2L, "cats nap on warm mats near mice", "fr"),        // target-like text
      (3L, "stocks fell sharply as yields rose today", "fr") // off-target text
    ).toDF("doc_id", "text", "lang")
    val w = Curation.dsirWeights(docs, col("lang") === "en", buckets = 512)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(w.size == 4)                              // target rows scored too
    assert(w(2L)._3 > w(3L)._3)                      // domain ranking
    // pinned against an independent md5/ln replication (python hashlib):
    // absolute signs are smoothing-dominated at B >> corpus grams; the
    // RANKING (target-like above off-target) is the operator's contract
    assert(w(0L)._3 == -2.947366 && w(3L)._3 == -8.217268)
    assert(w(0L)._2 == 15L)                          // 8 unigrams + 7 bigrams
    // deterministic bit-for-bit across runs
    val again = Curation.dsirWeights(docs, col("lang") === "en", buckets = 512)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == w)
  }

  test("classifierScore: mean-pooled logit, bias shift, trained-table drop-in") {
    val docs = Seq(
      (0L, "good text"),          // 2 unigrams + 1 bigram = 3 grams
      (1L, "good text good text") // 4 + 3 = 7 grams, same gram SET
    ).toDF("doc_id", "text")
    // constant +1 weights: mean pooling makes the logit length-invariant
    val ones = spark.range(64).select(col("id").as("b"), lit(1.0).as("w"))
    val s1 = Curation.classifierScore(docs, Some(ones), buckets = 64)
      .select("doc_id", "n_grams", "logit6", "keep")
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(s1(0L)._2 == 3L && s1(1L)._2 == 7L)
    assert(s1(0L)._3 == 1.0 && s1(1L)._3 == 1.0) // Σcnt·1/Σcnt
    assert(s1(0L)._4 && s1(1L)._4)
    // bias shifts the decision: logit = 1 + (-1.5) < 0 → drop
    val s2 = Curation.classifierScore(docs, Some(ones), buckets = 64,
        bias = -1.5)
      .select("doc_id", "logit6", "keep")
      .as[(Long, Double, Boolean)].collect()
    assert(s2.forall(r => r._2 == -0.5 && !r._3))
    // default fixture is deterministic across calls; empty docs emit nothing
    val withEmpty = docs.union(Seq((2L, "   ")).toDF("doc_id", "text"))
    val f1 = Curation.classifierScore(withEmpty).collect().sortBy(_.getLong(0))
    val f2 = Curation.classifierScore(withEmpty).collect().sortBy(_.getLong(0))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("trainClassifier: learned weights separate the classes and drop into classifierScore") {
    // two linearly separable vocabularies: positives speak "alpha beta",
    // negatives speak "gamma delta" — a logistic regression over hashed
    // unigram+bigram features must push their bucket weights apart
    val docs = (0L until 8L).map { i =>
      if (i < 4) (i, "alpha beta alpha beta alpha", true)
      else (i, "gamma delta gamma delta gamma", false)
    }.toDF("doc_id", "text", "y")
    val learned = Curation.trainClassifier(docs, col("y"),
      buckets = 64, iters = 20, lr = 2.0)
    val wMap = learned.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wMap.contains(-1L)) // bias row rides as bucket -1
    // drop the learned table into the scorer: classes separate at 0
    val bias = wMap(-1L)
    val scored = Curation.classifierScore(docs,
        Some(learned.filter(col("b") >= 0)), buckets = 64, bias = bias)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    (0L until 4L).foreach(i => assert(scored(i), s"positive doc $i kept"))
    (4L until 8L).foreach(i => assert(!scored(i), s"negative doc $i dropped"))
    // deterministic: a re-run learns the bit-identical table
    val again = Curation.trainClassifier(docs, col("y"),
      buckets = 64, iters = 20, lr = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == wMap)
    // zero-gram docs don't poison training (no NaN features, same result
    // on the labeled subset that has grams)
    val withEmpty = docs.union(Seq((8L, "   ", true)).toDF("doc_id", "text", "y"))
    val w3 = Curation.trainClassifier(withEmpty, col("y"),
      buckets = 64, iters = 5, lr = 2.0).collect()
    assert(w3.forall(r => !r.getDouble(1).isNaN))
  }

  test("shardAssign: exact permutation, dense per-shard positions, crawl-order broken, reproducible") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Curation.shardAssign(docs, nShards = 8)
      .as[(Long, Long, Int)].collect()
    // a permutation: every doc exactly once, shards in range
    assert(out.map(_._1).sorted.toSeq == (0L until 200L).toSeq)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // positions are dense 1..|shard| within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // the deal actually shuffles: some shard's order is not id order
    // (adjacent crawl ids land apart — the anti-correlation the export
    // step exists for)
    val ordered = out.groupBy(_._2).values.map(rows =>
      rows.sortBy(_._3).map(_._1).toSeq)
    assert(ordered.exists(ids => ids != ids.sorted))
    // reproducible: the same corpus deals identically on a re-run
    val again = Curation.shardAssign(docs, nShards = 8)
      .as[(Long, Long, Int)].collect()
    assert(out.toSet == again.toSet)
  }

  test("mixByPerplexity: per-lang terciles partition the corpus, head is most reference-like") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val out = Curation.mixByPerplexity(docs, col("lang") === "en")
      .select("doc_id", "lang", "ppl", "bucket", "keep")
      .as[(Long, String, Double, String, Boolean)].collect()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    assert(out.forall(r => r._5 == (r._4 != "tail"))) // keep ⇔ head|middle
    out.groupBy(_._2).foreach { case (_, rows) =>
      val byB = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      def bucketPpls(b: String): Array[Double] = byB.getOrElse(b, Array.empty[Double])
      // the head threshold is the first bin whose cumulative count reaches
      // a third, so head holds at least a third of the language's docs
      assert(bucketPpls("head").length * 3 >= rows.length)
      // buckets are ordered by perplexity: every head doc bins at or below
      // every middle doc, every middle at or below every tail
      def maxB(b: String) = bucketPpls(b).map(p => math.round(p * 100)).maxOption
      def minB(b: String) = bucketPpls(b).map(p => math.round(p * 100)).minOption
      for (hi <- maxB("head"); lo <- minB("middle")) assert(hi < lo)
      for (hi <- maxB("middle"); lo <- minB("tail")) assert(hi < lo)
    }
    // the en reference makes en docs most reference-like: en's median-ish
    // head share is full, and en heads sit below non-en heads on average
    val enPpl = out.filter(_._2 == "en").map(_._3)
    val dePpl = out.filter(_._2 == "de").map(_._3)
    assert(enPpl.sum / enPpl.length < dePpl.sum / dePpl.length)
  }

  test("leakageSafeSplit: cluster members share a split, fractions honored, deterministic") {
    // 300 clusters of 1-3 members each
    val rnd = new scala.util.Random(3)
    val rows = (0 until 300).flatMap { c =>
      (0 to rnd.nextInt(3)).map(i => (c * 10L + i, c.toLong * 7L))
    }
    val clusters = rows.toDF("doc_id", "cluster")
    val out = Curation.leakageSafeSplit(clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == rows.length)
    // invariant THE OPERATOR EXISTS FOR: one split per cluster
    out.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $c straddles splits")
    }
    // fractions hold at cluster granularity, loosely (hash deal, 300 draws)
    val byCluster = out.groupBy(_._2).map(_._2.head._3).toSeq
    val trainFrac = byCluster.count(_ == "train").toDouble / byCluster.length
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train frac $trainFrac")
    assert(byCluster.contains("val") || byCluster.contains("test"))
    // deterministic across runs and partitionings
    val again = Curation.leakageSafeSplit(clusters.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(again.toSeq == out.sortBy(_._1).toSeq)
    // custom fractions: all-in-one bucket degenerates sanely
    val one = Curation.leakageSafeSplit(clusters, Seq(("all", 1.0))).collect()
    assert(one.forall(_.getString(2) == "all"))
  }

  test("shardBalanced: token mass within one max-doc of the mean; rank is the exact global sort") {
    // heavily skewed sizes (Zipf-ish): doc i has ~1000/(i+1) tokens, many
    // ties at the small end — the regime where a hash deal's token
    // imbalance is worst and the two-phase rank must handle BIG tie groups
    val docs = (0L until 200L).map { i =>
      val n = math.max(1, (1000 / (i + 1)).toInt)
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val nShards = 8
    val out = Curation.shardBalanced(docs, nShards)
      .as[(Long, Long, Long, Long)].collect()
    // a permutation with dense per-shard positions
    assert(out.map(_._1).sorted.toSeq == (0L until 200L).toSeq)
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the decomposed rank equals the single global sort
    val expected = out.map(r => (r._1, r._2)).sortBy(r => (-r._2, r._1))
      .zipWithIndex.map { case ((id, _), rk) =>
        id -> (rk.toLong % nShards, rk.toLong / nShards + 1) }.toMap
    out.foreach { case (id, _, shard, pos) =>
      assert((shard, pos) == expected(id), s"doc $id") }
    // balance law: every shard's token sum within one max-doc of the mean
    val sums = out.groupBy(_._3).values.map(_.map(_._2).sum).toSeq
    val maxDoc = out.map(_._2).max
    val mean = sums.sum.toDouble / nShards
    assert(sums.forall(s => math.abs(s - mean) <= maxDoc),
      s"sums $sums mean $mean maxDoc $maxDoc")
  }

  test("sampleWeighted: exact top-n of the A-ES keys; heavy weights dominate; zero weight excluded") {
    // 200 weight-1 docs, 5 weight-1000 docs, 1 weight-0 doc
    val docs = ((1L to 200L).map(i => (i, 1L)) ++
      (201L to 205L).map(i => (i, 1000L)) ++ Seq((206L, 0L)))
      .toDF("doc_id", "w")
    val out = Curation.sampleWeighted(docs, col("w"), n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 50)
    // output is EXACTLY the 50 largest keys (ties by doc_id) of the full frame
    val all = Curation.sampleWeighted(docs, col("w"), n = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val expected = all.sortBy { case (id, k) => (-k, id) }.take(50).map(_._1).toSeq
    assert(out.map(_._1).toSeq.sorted == expected.sorted)
    // key = u^(1/1000) ≥ u^(1/30) for any u: all five heavy docs sampled
    (201L to 205L).foreach(id => assert(out.exists(_._1 == id), s"heavy $id missing"))
    // weight 0 draws key u^∞ = 0 — never beats a positive key
    assert(!out.exists(_._1 == 206L))
  }

  test("CDC chunking: contiguous full coverage, short/empty docs, content hash") {
    val rnd = new scala.util.Random(42)
    val t = (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((0L, t), (1L, "tiny"), (2L, "")).toDF("doc_id", "text")
    val out = Curation.chunkCdc(docs).collect()
    val c0 = out.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
    assert(c0.length > 10, s"expected ~2000/64 chunks, got ${c0.length}")
    assert(c0.head.getLong(2) == 1L)
    c0.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(2) == a.getLong(2) + a.getLong(3))
      case _           =>
    }
    assert(c0.last.getLong(2) + c0.last.getLong(3) - 1 == 2000L)
    val one = c0(1)
    val span = t.substring(one.getLong(2).toInt - 1,
      (one.getLong(2) + one.getLong(3)).toInt - 1)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(span.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one.getString(4) == md)
    // < window chars → one whole-doc chunk; empty doc → nothing
    val c1 = out.filter(_.getLong(0) == 1L)
    assert(c1.length == 1 && c1.head.getLong(3) == 4L)
    assert(!out.exists(_.getLong(0) == 2L))
  }

  test("CDC resync law: a prefix edit leaves every chunk after the first boundary intact") {
    val rnd = new scala.util.Random(7)
    val t = (0 until 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((0L, t), (1L, "XYZ" + t)).toDF("doc_id", "text")
    val out = Curation.chunkCdc(docs).collect()
    val h0 = out.filter(_.getLong(0) == 0L).sortBy(_.getLong(1)).map(_.getString(4))
    val h1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1)).map(_.getString(4))
    assert(h0.length > 20)
    // a boundary depends only on its trailing 16-char window, so every
    // boundary of t persists (shifted by the 3 inserted chars) and the
    // chunk streams re-converge after t's FIRST boundary: the last n-1
    // chunk hashes are identical — this is what makes chunk-hash dedup
    // survive edits where fixed-size blocking loses everything
    val shared = h0.drop(1)
    assert(h1.takeRight(shared.length).sameElements(shared))
  }

  test("removeBoilerplate: repeated lines drop, blanks and unique lines survive, scopes isolate") {
    // src A: 3 docs share "NAV" (>= minDocs 3); "rare" appears in 2 (kept);
    // src B: 1 doc with the SAME "NAV" line — different scope, kept there
    val docs = Seq(
      (0L, "A", "NAV\nalpha one\n\nrare\nend0"),
      (1L, "A", "NAV\nbeta two\nrare\nend1"),
      (2L, "A", "nav   \ngamma three\nend2"), // case/trim-normalized match
      (3L, "B", "NAV\ndelta four"))
      .toDF("doc_id", "source", "text")
    val got = Curation.removeBoilerplate(docs, minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == (("alpha one\n\nrare\nend0", 1L, 4L))) // NAV gone, blank kept
    assert(got(1L) == (("beta two\nrare\nend1", 1L, 3L)))
    assert(got(2L) == (("gamma three\nend2", 1L, 2L)))       // normalized form matched
    assert(got(3L) == (("NAV\ndelta four", 0L, 2L)))         // scope B: not boilerplate
    // corpus-wide scope: all four NAVs count together
    val global = Curation.removeBoilerplate(docs, minDocs = 4, bySource = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(global(3L) == "delta four")
  }

  test("domainDedup: URL variants collapse, min-id keeps, cap binds, salted ≡ plain window") {
    val rows = Seq(
      (10L, "https://www.Example.com/a#sec"),   // same key as 11, 12
      (11L, "http://example.com:80/a"),
      (12L, "https://example.com/a/"),
      (13L, "https://example.com/b"),
      (14L, "https://news.example.com/c"),      // subdomain, same domain
      (15L, "https://example.com/d"),
      (16L, "https://other.org/x"),
      (17L, "https://other.org/x?q=1"),         // query kept: distinct key
      (18L, "no-scheme.net/p"))
      .toDF("doc_id", "url")
    val got = Curation.domainDedup(rows, "url", maxPerDomain = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    // example.com keys: /a (keeper 10), /b (13), news…/c (14), /d (15) →
    // cap 3 by doc_id keeps 10, 13, 14; other.org keeps both (distinct
    // queries); schemeless URL canonicalizes too
    assert(got == Seq(
      (10L, "example.com/a", "example.com"),
      (13L, "example.com/b", "example.com"),
      (14L, "news.example.com/c", "example.com"),
      (16L, "other.org/x", "other.org"),
      (17L, "other.org/x?q=1", "other.org"),
      (18L, "no-scheme.net/p", "no-scheme.net")), s"got $got")
    // tracker-param stripping: utm_*/gclid collapse, real params survive,
    // a query of only trackers loses its '?'
    val tracked = Seq(
      (30L, "https://t.com/a?utm_source=x&id=7&utm_medium=y"),
      (31L, "https://t.com/a?id=7&gclid=zz"),
      (32L, "https://t.com/a?utm_source=q"),
      (33L, "https://t.com/a"))
      .toDF("doc_id", "url")
    val keys = tracked.select(Curation.urlKey(col("url"),
        Seq("utm_", "gclid")).as("k")).as[String].collect().toSeq
    assert(keys == Seq("t.com/a?id=7", "t.com/a?id=7", "t.com/a", "t.com/a"))
    val strippedKeep = Curation.domainDedup(tracked, "url", maxPerDomain = 9,
        stripParamPrefixes = Seq("utm_", "gclid"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(strippedKeep == Seq(30L, 32L)) // two canonical resources remain

    // salted two-phase ≡ plain per-domain window on a hot domain
    val hot = (0L until 300L).map(i =>
      (i, s"https://hot.com/p$i")).toDF("doc_id", "url")
    val salted = Curation.domainDedup(hot, "url", maxPerDomain = 5, nSalts = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(salted == (0L until 5L).toSeq,
      "global top-cap must survive the salted two-phase exactly")
  }

  test("PublicSuffixes: registrable domains across all three rule classes, both impls agree") {
    import graft.llm.PublicSuffixes
    val psl = PublicSuffixes.Common
    // plain second-level ccTLD + private hosted suffix + wildcard +
    // exception + implicit-default + malformed — the verdict's cases
    val expect = Seq(
      "news.bbc.co.uk" -> "bbc.co.uk", // co.uk no longer ONE domain
      "bbc.co.uk" -> "bbc.co.uk",
      "shop.example.com.au" -> "example.com.au",
      "user.github.io" -> "user.github.io",
      "pages.user.github.io" -> "user.github.io",
      "news.example.com" -> "example.com", // no rule → implicit `*`
      "src.kobe.jp" -> "src.kobe.jp",      // *.kobe.jp: site IS a suffix
      "sub.src.kobe.jp" -> "sub.src.kobe.jp",
      "p1.city.kobe.jp" -> "city.kobe.jp", // !city.kobe.jp exception
      "a.b.ck" -> "a.b.ck",                // *.ck
      "foo.www.ck" -> "www.ck",            // !www.ck
      "co.uk" -> "co.uk",                  // bare public suffix: itself
      "localhost" -> "localhost",
      "a..b" -> "a..b",                    // malformed: stays whole
      "x.y." -> "x.y.")
    for ((host, dom) <- expect)
      assert(psl.registrable(host) == dom, s"registrable($host)")
    // frame path (broadcast rule joins) ≡ the per-row Scala path, on the
    // same fixture plus path/query tails the host extraction must strip
    val fx = expect.map(_._1).zipWithIndex
      .map { case (h, i) => (i.toLong, s"$h/p/$i?q=${i % 3}") }
      .toDF("doc_id", "url_key")
    val got = PublicSuffixes.withRegistrableDomain(fx, psl)
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    for (((host, dom), i) <- expect.zipWithIndex)
      assert(got(i.toLong) == dom, s"frame path on $host")
    // streaming twin shares the table
    for ((host, dom) <- expect)
      assert(graft.streaming.StreamDedup.domainOf(s"$host/p/1", Some(psl)) == dom,
        s"streaming twin on $host")
  }

  test("domainDedup with a PSL: ccTLD families cap per SITE; streaming fallback parity on malformed hosts") {
    import graft.llm.PublicSuffixes
    val rows = Seq(
      (1L, "https://alpha.co.uk/a"), (2L, "https://alpha.co.uk/b"),
      (3L, "https://beta.co.uk/a"), (4L, "https://beta.co.uk/b"),
      (5L, "https://news.alpha.co.uk/c"))
      .toDF("doc_id", "url")
    // last-two-labels fallback: EVERYTHING is 'co.uk', cap 2 keeps 2 docs
    val flat = Curation.domainDedup(rows, "url", maxPerDomain = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(flat == Seq(1L, 2L))
    // PSL: alpha.co.uk (3 keys) capped to 2, beta.co.uk keeps both
    val got = Curation.domainDedup(rows, "url", maxPerDomain = 2,
        psl = Some(PublicSuffixes.Common))
      .select("doc_id", "domain").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "alpha.co.uk"), (2L, "alpha.co.uk"),
      (3L, "beta.co.uk"), (4L, "beta.co.uk")), s"got $got")
    // no-table twins: the streaming domainOf must equal the batch
    // urlDomain column on malformed hosts too (empty labels, trailing
    // dot — the r17 advice divergence)
    val hosts = Seq("a..b", "x.y.", ".b", "a.b", "a.b.c", "a.b..c", "h",
      "trail.", "..x")
    val batch = hosts.toDF("k")
      .select(Curation.urlDomain(col("k")).as("d")).as[String].collect().toSeq
    val stream = hosts.map(h => graft.streaming.StreamDedup.domainOf(h))
    assert(batch == stream, s"batch $batch vs streaming $stream")
  }

  test("packBinsFFD: hand-derived walk, oversize dedicated bin, no splits, capacity law") {
    // tokens: d0=6, d1=6, d2=4, d3=3, d4=3, d5=2, d6=13(oversize), binSize=10
    // FFD order (tok desc, id asc): d6, d0, d1, d2, d3, d4, d5
    //   d6: no fit -> new bin1 (load 13, oversize)
    //   d0=6: bin1 full -> new bin2 (0); d1=6: -> new bin3 (0)
    //   d2=4: bin2 has 4 free -> bin2 off 6; d3=3: bin3 off 6
    //   d4=3: no bin fits (13,10,9) -> new bin4 off 0; d5=2: bin3? 9+2>10,
    //         bin4 3+2<=10 -> bin4 off 3
    val docs = Seq(
      (0L, "a a a a a a"), (1L, "b b b b b b"), (2L, "c c c c"),
      (3L, "d d d"), (4L, "e e e"), (5L, "f f"),
      (6L, "g g g g g g g g g g g g g")).toDF("doc_id", "text")
    val got = Curation.packBinsFFD(docs, binSize = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      6L -> ((0L, 0L)), 0L -> ((1L, 0L)), 1L -> ((2L, 0L)),
      2L -> ((1L, 6L)), 3L -> ((2L, 6L)), 4L -> ((3L, 0L)), 5L -> ((3L, 3L))),
      s"got $got")
    // every doc placed exactly once (no splits) is implied by the map
    // cardinality; capacity law: non-oversize bins never exceed binSize
    val loads = Curation.packBinsFFD(docs, binSize = 10L)
      .groupBy("bin_id").agg(sum("tok").as("load"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    loads.foreach { case (load, n) =>
      assert(load <= 10L || n == 1L, s"overfull shared bin: load $load, n $n")
    }
  }

  test("packBinsFFD: deterministic across partitionings; buckets compose independently") {
    val docs = (0L until 200L)
      .map(i => (i, ("w " * (1 + (i * 7 % 23)).toInt).trim)).toDF("doc_id", "text")
    val a = Curation.packBinsFFD(docs, 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val b = Curation.packBinsFFD(docs.repartition(13), 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(a == b, "FFD must be partitioning-independent")
    // bucketing law (FFD is bucket-LOCAL by design, so bucketWidth is a
    // semantic knob, not a neutral one): a bucketed run equals running
    // FFD independently per bucket with bin ids offset by the preceding
    // buckets' bin counts
    val bucketed = Curation.packBinsFFD(docs, 64L, bucketWidth = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val manual = (0L until 4L).flatMap { bkt =>
      val part = docs.filter(col("doc_id") >= bkt * 50 && col("doc_id") < (bkt + 1) * 50)
      Curation.packBinsFFD(part, 64L)
        .collect().map(r => (bkt, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    val bases = manual.groupBy(_._1).view.mapValues(_.map(_._4).max + 1).toMap
    val offsets = (0L until 4L).scanLeft(0L)((acc, b) => acc + bases(b)).init
    val composed = manual.map { case (bkt, id, tok, bin, off) =>
      (id, tok, offsets(bkt.toInt) + bin, off)
    }.sorted.toSeq
    assert(bucketed == composed)
  }
}
