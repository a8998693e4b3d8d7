package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Search, SearchIndex}

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a quick brown cat sleeps all day long today",
    3L -> "stock market prices rose sharply in early trading",
    4L -> "the fox and the hound ran through the forest",
    5L -> "completely unrelated text about gardening and tulips")

  private def queries(rows: (Long, String)*): DataFrame =
    rows.toDF("query_id", "qtext")

  test("bm25TopK ranks term-matching docs first, ties break by doc_id") {
    val out = Search.bm25TopK(corpus, queries(10L -> "quick brown fox"), topK = 3)
      .orderBy("rk").collect()
    assert(out.length == 3)
    // doc 1 matches all three terms (fox twice-weighted by idf), doc 2 two,
    // doc 4 one — the ranking every hand computation of BM25 gives here
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    // n_hit counts matched DISTINCT query terms
    assert(out(0).getLong(2) == 3L && out(1).getLong(2) == 2L)
    // scores strictly ordered (round-6)
    val scores = out.map(_.getDouble(3))
    assert(scores.sliding(2).forall(p => p(0) > p(1)))
  }

  test("bm25f: single-field ≡ bm25 ranks (scores scale by 1/(k1+1)); title weight lifts the title hit") {
    val k1 = 1.2
    val qs = queries(10L -> "quick brown fox", 11L -> "stock market")
    // single text field at weight 1: EXACTLY bm25's ranking —
    // wtf/(k1+wtf) = tf/(k1·B+tf) = bm25-contrib/(k1+1), per term
    val single = Search.bm25fTopK(corpus, qs,
      fields = Seq(("text", 1.0, 0.75)), topK = 5, k1 = k1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    val plain = Search.bm25TopK(corpus, qs, topK = 5, k1 = k1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(single.map(t => (t._1, t._2, t._3, t._5)).toSet ==
      plain.map(t => (t._1, t._2, t._3, t._5)).toSet)
    val bm = plain.map(t => (t._1, t._2) -> t._4).toMap
    assert(single.forall { t =>
      math.abs(t._4 * (k1 + 1.0) - bm((t._1, t._2))) < 2e-5 })
    // two fields: docs 3 and 5 both mention 'tulips' once in the BODY,
    // but doc 5 also carries it in the TITLE — the weighted field must
    // put doc 5 first; with the title weight at 0 the title stops
    // mattering and the shorter-body doc wins on length normalization
    val fielded = docs(
      3L -> "short tulips note",
      5L -> "gardening and tulips all about them today friends")
      .withColumn("title",
        when(col("doc_id") === 5L, lit("tulips guide")).otherwise(lit("news")))
    val q = queries(1L -> "tulips")
    val withT = Search.bm25fTopK(fielded, q,
      Seq(("title", 2.0, 0.75), ("text", 1.0, 0.75)), topK = 2)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(withT == Seq(5L, 3L), s"title weight must lift doc 5: $withT")
    val noT = Search.bm25fTopK(fielded, q,
      Seq(("title", 0.0, 0.75), ("text", 1.0, 0.75)), topK = 2)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(noT == Seq(3L, 5L), s"zero title weight must fall back: $noT")
  }

  test("repeated query terms score once (distinct-term query set)") {
    val once = Search.bm25TopK(corpus, queries(1L -> "fox"), topK = 5).collect()
    val thrice = Search.bm25TopK(corpus, queries(1L -> "fox fox fox"), topK = 5)
      .collect()
    assert(once.map(r => (r.getLong(1), r.getDouble(3))).toSet ==
      thrice.map(r => (r.getLong(1), r.getDouble(3))).toSet)
  }

  test("longer docs are length-normalized below shorter ones at equal tf") {
    val d = docs(
      1L -> "fox den",
      2L -> ("fox " + Seq.fill(40)("filler").mkString(" ")))
    val out = Search.bm25TopK(d, queries(1L -> "fox"), topK = 2)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // short doc wins
  }

  test("Dirichlet QL: more matched terms win; equal tf prefers the shorter doc") {
    val out = Search.qlTopK(corpus, queries(10L -> "quick brown fox"), topK = 3)
      .orderBy("rk").collect()
    // same qualitative order as BM25 on this fixture: doc 1 matches all
    // three terms, doc 2 two, doc 4 one
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L)) // n_hit
    // dl penalty: equal tf, the 40-filler doc scores strictly below
    val d = docs(
      1L -> "fox den",
      2L -> ("fox " + Seq.fill(40)("filler").mkString(" ")))
    val pen = Search.qlTopK(d, queries(1L -> "fox"), topK = 2)
      .orderBy("rk").collect()
    assert(pen.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(pen(0).getDouble(3) > pen(1).getDouble(3))
  }

  test("SDM: the phrase doc outranks equal unigram stats; single-term query degenerates to BM25") {
    val d = docs(
      1L -> "new york subway map",  // the phrase
      2L -> "new maps of york",     // both words, apart
      3L -> "gardening tulips soil")
    val out = Search.sdmTopK(d, queries(10L -> "new york"), topK = 3)
      .orderBy("rk").collect()
    // identical unigram tf/dl, so only the bigram feature separates them
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(2) == out(1).getDouble(2)) // s_uni equal
    assert(out(0).getDouble(3) > 0.0 && out(1).getDouble(3) == 0.0) // s_bi
    // a one-token query has no bigrams: pure BM25 ranking, s_bi = 0
    val solo = Search.sdmTopK(corpus, queries(1L -> "fox"), topK = 5)
      .orderBy("rk").collect()
    val bm = Search.bm25TopK(corpus, queries(1L -> "fox"), topK = 5)
      .orderBy("rk").collect()
    assert(solo.map(_.getLong(1)).toSeq == bm.map(_.getLong(1)).toSeq)
    assert(solo.forall(_.getDouble(3) == 0.0))
  }

  test("RM3 expansion recovers a doc sharing only feedback vocabulary") {
    val d = docs(
      1L -> "fox and hound hunting",   // the only "fox" match → feedback doc
      2L -> "hound kennel training",   // no "fox", reachable via expansion
      3L -> "gardening tulips soil")
    val plain = Search.bm25TopK(d, queries(10L -> "fox"), topK = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L)) // lexical-gap: doc 2 unreachable without RM3
    val rm3 = Search.rm3TopK(d, queries(10L -> "fox"), topK = 3,
      fbDocs = 1, fbTerms = 10, alpha = 0.5).orderBy("rk")
      .select("doc_id").as[Long].collect().toSeq
    // the original term dominates (α·P(fox|q) = .5 vs expansion masses
    // ≤ .125), so doc 1 stays first; doc 2 arrives through "hound"
    assert(rm3.take(2) == Seq(1L, 2L))
    assert(!rm3.contains(3L)) // no shared vocabulary, still unreachable
  }

  test("RM3 at α = 1 preserves the BM25 ranking (uniform query weights)") {
    val qs = queries(10L -> "quick brown fox")
    val plain = Search.bm25TopK(corpus, qs, topK = 3).orderBy("rk")
      .select("doc_id").as[Long].collect().toSeq
    val rm3 = Search.rm3TopK(corpus, qs, topK = 5, fbDocs = 2, alpha = 1.0)
      .filter($"score" > 0).orderBy("rk")
      .select("doc_id").as[Long].collect().toSeq
    // every original term carries the same weight 1/|q|, scaling all
    // scores by a constant; expansion terms weigh exactly 0 and can only
    // add score-0 tail rows, filtered above
    assert(rm3 == plain)
  }

  test("store lifecycle: build + append ≡ whole-corpus batch, bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchspec").toString
    SearchIndex.build(corpus.filter($"doc_id" <= 2), dir)
    SearchIndex.append(dir, corpus.filter($"doc_id" > 2))
    val qs = queries(10L -> "quick brown fox", 11L -> "stock market",
      12L -> "forest hound")
    val fromStore = SearchIndex.search(spark, dir, qs, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val batch = Search.bm25TopK(corpus, qs, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(fromStore == batch)
  }

  test("store stats merge exactly across appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchstat").toString
    SearchIndex.build(corpus.filter($"doc_id" === 1), dir)
    SearchIndex.append(dir, corpus.filter($"doc_id" === 2))
    SearchIndex.append(dir, corpus.filter($"doc_id" > 2))
    // stats are merge-on-read partials (one row per build/append): the
    // folded totals must equal the whole-corpus stats exactly
    val st = spark.read.parquet(s"$dir/stats.parquet")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")).head()
    assert(st.getAs[Long]("n_docs") == 5L)
    val dl = corpus.select(sum(size(expr(
      "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))).head().getLong(0)
    assert(st.getAs[Long]("sum_dl") == dl)
  }

  test("searchRm3 from the store ≡ transient rm3TopK on the accumulated corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rm3store").toString
    SearchIndex.build(corpus.filter(col("doc_id") <= 3), dir)
    SearchIndex.append(dir, corpus.filter(col("doc_id") > 3))
    val qs = queries(1L -> "quick fox", 2L -> "market prices")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toSet
    val store = rows(SearchIndex.searchRm3(spark, dir, qs, topK = 3,
      fbDocs = 2, fbTerms = 4, alpha = 0.5))
    val transient = rows(Search.rm3TopK(corpus, qs, topK = 3,
      fbDocs = 2, fbTerms = 4, alpha = 0.5))
    assert(store == transient, s"store $store\ntransient $transient")
    // expansion actually happened through the store: doc 4 shares no
    // term with "quick fox" beyond fox, but feedback vocabulary from
    // docs 1/2 must be able to surface it — sanity: ≥3 results for q1
    assert(store.count(_._1 == 1L) == 3)
  }

  test("searchRm3: remove ≡ build-without through the whole expansion chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rm3ret").toString
    SearchIndex.build(corpus, dir)
    SearchIndex.remove(dir, Seq(2L).toDF("doc_id"))
    val qs = queries(1L -> "quick fox")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toSet
    val got = rows(SearchIndex.searchRm3(spark, dir, qs, topK = 3,
      fbDocs = 2, fbTerms = 4, alpha = 0.5))
    val want = rows(Search.rm3TopK(corpus.filter(col("doc_id") =!= 2), qs,
      topK = 3, fbDocs = 2, fbTerms = 4, alpha = 0.5))
    assert(got == want, s"got $got\nwant $want")
    // vacuum changes nothing observable on the rm3 path either
    SearchIndex.vacuum(dir)
    assert(rows(SearchIndex.searchRm3(spark, dir, qs, topK = 3,
      fbDocs = 2, fbTerms = 4, alpha = 0.5)) == want)
  }

  test("searchQl / searchSdm from the store ≡ transient rankers; retention exact; sdm needs bigrams") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qlsdm").toString
    SearchIndex.build(corpus.filter(col("doc_id") <= 3), dir, bigrams = true)
    SearchIndex.append(dir, corpus.filter(col("doc_id") > 3))
    val qs = queries(1L -> "quick brown fox", 2L -> "stock market")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toSet
    assert(rows(SearchIndex.searchQl(spark, dir, qs, topK = 3)) ==
      rows(Search.qlTopK(corpus, qs, topK = 3)))
    def sdmRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5))).toSet
    assert(sdmRows(SearchIndex.searchSdm(spark, dir, qs, topK = 3)) ==
      sdmRows(Search.sdmTopK(corpus, qs, topK = 3)))
    // retention flows through both rankers (ctf/bigram stats included)
    SearchIndex.remove(dir, Seq(2L).toDF("doc_id"))
    val rest = corpus.filter(col("doc_id") =!= 2)
    assert(rows(SearchIndex.searchQl(spark, dir, qs, topK = 3)) ==
      rows(Search.qlTopK(rest, qs, topK = 3)))
    assert(sdmRows(SearchIndex.searchSdm(spark, dir, qs, topK = 3)) ==
      sdmRows(Search.sdmTopK(rest, qs, topK = 3)))
    // vacuum maintains the bigram family and changes nothing observable
    SearchIndex.vacuum(dir)
    assert(sdmRows(SearchIndex.searchSdm(spark, dir, qs, topK = 3)) ==
      sdmRows(Search.sdmTopK(rest, qs, topK = 3)))
    // a store built WITHOUT bigrams refuses SDM loudly, serves QL fine
    val plain = java.nio.file.Files.createTempDirectory("graft-qlonly").toString
    SearchIndex.build(corpus, plain)
    val e = intercept[IllegalArgumentException] {
      SearchIndex.searchSdm(spark, plain, qs)
    }
    assert(e.getMessage.contains("bigram"))
    assert(SearchIndex.searchQl(spark, plain, qs, topK = 3).count() > 0)
  }

  test("searchRm3 fails fast on a store that predates the docvecs twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rm3old").toString
    SearchIndex.build(corpus, dir)
    // simulate a legacy store: drop the twin
    val p = new org.apache.hadoop.fs.Path(s"$dir/docvecs.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val e = intercept[IllegalArgumentException] {
      SearchIndex.searchRm3(spark, dir, queries(1L -> "fox"))
    }
    assert(e.getMessage.contains("docvecs"))
    // plain search still serves the legacy layout
    assert(SearchIndex.search(spark, dir, queries(1L -> "fox")).count() >= 1)
  }

  test("store search prunes to the query terms' prefix partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchprune").toString
    SearchIndex.build(corpus, dir)
    val plan = SearchIndex.search(spark, dir, queries(1L -> "fox"), topK = 3)
      .queryExecution.executedPlan.toString
    // static isin pruning on the pfx partition column reaches the scan as
    // a non-empty PartitionFilters entry (the MetricStoreSpec assertion —
    // a mere mention of `pfx` in the plan would not prove pruning)
    val pf = plan.split("\\n").map(_.trim).find(_.startsWith("PartitionFilters"))
      .orElse(plan.split(", ").find(_.contains("PartitionFilters"))).getOrElse("")
    assert(pf.contains("pfx") && !pf.contains("PartitionFilters: []"), pf)
    val pruned = SearchIndex.search(spark, dir, queries(1L -> "fox"), topK = 3)
    assert(pruned.count() >= 1)
  }

  test("maxDfFrac drops stopword-grade terms; rare-term ranking survives") {
    // "the" is in 4 of 5 docs (df/N = 0.8), "fox" in 1 (0.2) — a 0.5 cap
    // must remove "the"'s contribution entirely, so a the-laden query
    // scores exactly like the rare-term-only query; cap off keeps it.
    val c2 = docs(
      1L -> "the fox den",
      2L -> "the cat sat",
      3L -> "the dog ran",
      4L -> "the bird flew",
      5L -> "owl hooted")
    val qCapped = Search.bm25TopK(c2,
      queries(1L -> "the the the fox"), topK = 5, maxDfFrac = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val qRare = Search.bm25TopK(c2, queries(1L -> "fox"), topK = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(qCapped == qRare && qRare.nonEmpty)
    val qOff = Search.bm25TopK(c2, queries(1L -> "the fox"), topK = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // cap off: "the"-only docs (no fox) enter the candidate set
    assert(qOff.size > qRare.size)
    // store path takes the same cap
    val dir = java.nio.file.Files.createTempDirectory("graft-searchcap").toString
    SearchIndex.build(c2, dir)
    val sCapped = SearchIndex.search(spark, dir,
      queries(1L -> "the the the fox"), topK = 5, maxDfFrac = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sCapped == qRare)
  }

  test("queries with no indexed terms return no rows; empty query drops out") {
    val out = Search.bm25TopK(corpus,
      queries(1L -> "zzzqqq xyzzy", 2L -> ""), topK = 3)
    assert(out.count() == 0)
  }

  test("hybridRrf: doc ranked by both systems beats single-system docs; rrf math exact") {
    // embeddings: doc 1 is the dense twin of the query; doc 3 is dense-only
    // relevant; docs 2/4/5 dense-orthogonal. Sparse side ranks 1, 2, 4
    // (the bm25 case above). So doc 1 is in BOTH top lists -> must fuse
    // to rank 1; its rrf must be exactly 1/(60+rk_lex) + 1/(60+rk_sem).
    def axis(a: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == a) 1.0f else 0.0f)
    val emb = Seq(
      1L -> axis(0), 2L -> axis(7), 3L -> axis(1), 4L -> axis(9),
      5L -> axis(11)).toDF("vec_id", "embedding")
    // query vector leans on axis 0 (doc 1) with a touch of axis 1 (doc 3)
    val qv = Seq(10L -> Array.tabulate(64)(d =>
      if (d == 0) 1.0f else if (d == 1) 0.5f else 0.0f))
      .toDF("query_id", "embedding")
    val out = Search.hybridRrf(corpus, emb,
      queries(10L -> "quick brown fox"), qv, topK = 5, kRetrieve = 3)
      .orderBy("rk").collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getLong(1) == 1L) // both-system doc wins the fusion
    val rkLex = top.getInt(2); val rkSem = top.getInt(3)
    val expect = BigDecimal(1.0 / (60 + rkLex) + 1.0 / (60 + rkSem))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.getDouble(4) - expect) < 1e-9, s"rrf ${top.getDouble(4)} vs $expect")
    // single-system docs carry exactly one rank (the other is null)
    val single = out.filter(r => r.isNullAt(2) || r.isNullAt(3))
    assert(single.nonEmpty)
    assert(single.forall(r => !(r.isNullAt(2) && r.isNullAt(3))))
    // ranks are 1..n with no gaps
    assert(out.map(_.getInt(5)).toSeq == (1 to out.length))
  }

  test("hybridFromStores: fusion of the two store probes, recomputed exactly") {
    import graft.llm.AnnIndex
    def axis(a: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == a) 1.0f else 0.0f)
    // doc 1 is the dense twin of the query axis; docs 2-5 orthogonal-ish;
    // vec 0 is filler so the first-K codebook covers a DENSE 0..3 code
    // range (the ADC table indexes positionally — the gate's % 101 == 97
    // split exists for the same reason)
    val emb = Seq(0L -> axis(20), 1L -> axis(0), 2L -> axis(3),
      3L -> axis(5), 4L -> axis(9), 5L -> axis(11)).toDF("vec_id", "embedding")
    val qv = Seq(10L -> axis(0)).toDF("query_id", "embedding")
    val qs = queries(10L -> "quick brown fox")

    val sDir = java.nio.file.Files.createTempDirectory("graft_hfs_s").toString
    SearchIndex.build(corpus.filter($"doc_id" <= 3), sDir)
    SearchIndex.append(sDir, corpus.filter($"doc_id" > 3))
    val aDir = java.nio.file.Files.createTempDirectory("graft_hfs_a").toString
    AnnIndex.build(emb, aDir, AnnIndex.Params(nCentroids = 4, multiAssign = 1,
      m = 8, codebookSize = 4, codebookIters = 0))

    val got = SearchIndex.hybridFromStores(spark, sDir, aDir, qs, qv,
      topK = 10, kRetrieve = 10, nprobe = 2).collect()
      .map(r => (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
        r.getDouble(4), r.getInt(5)))

    // recompute the fusion from the two constituent store probes
    val lex = SearchIndex.search(spark, sDir, qs, topK = 10).collect()
      .map(r => r.getLong(1) -> r.getInt(4)).toMap
    val sem = AnnIndex.query(spark, aDir, qv.select($"query_id".as("vec_id"),
        $"embedding"), k = 10, nprobe = 2).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (lex.keySet ++ sem.keySet).toSeq.map { d =>
      val rrf = r6(lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sem.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      (d, lex.get(d), sem.get(d), rrf)
    }.sortBy { case (d, _, _, rrf) => (-rrf, d) }
      .zipWithIndex.map { case ((d, l, s, rrf), i) => (d, l, s, rrf, i + 1) }
    assert(got.sortBy(_._5).toSeq == expect)
    // and the dense twin is in the fused list via the sem side
    assert(got.exists(g => g._1 == 1L && g._3.nonEmpty))
  }
}
