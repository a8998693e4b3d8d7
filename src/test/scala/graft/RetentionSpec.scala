package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Ann, AnnIndex, CentroidStore, DedupIndex, Search,
  SearchIndex, SubstrIndex}
import graft.sources.StoreOps

/** Pins the retention / maintenance contracts the store Scaladoc claims:
  * remove ≡ build-without-the-docs (scores, df, N, avgdl all as if never
  * indexed), vacuum ≡ observational identity (+ physical reclaim),
  * compact ≡ identity with the file count collapsed, filtered search ≡
  * filtered-corpus rebuild, and the pre-tombstone store-layout migration
  * fallback. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a quick brown cat sleeps all day long today",
    3L -> "stock market prices rose sharply in early trading",
    4L -> "the fox and the hound ran through the forest",
    5L -> "completely unrelated text about gardening and tulips")
    .toDF("doc_id", "text")

  private val qs = Seq(10L -> "quick brown fox", 11L -> "stock market",
    12L -> "forest hound").toDF("query_id", "qtext")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getInt(4))).toSet

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("SearchIndex.remove ≡ build-without: search equals BM25 over the surviving corpus") {
    val dir = tmp("ret-remove")
    SearchIndex.build(corpus, dir)
    SearchIndex.remove(dir, Seq(1L, 4L).toDF("doc_id"))
    val got = rows(SearchIndex.search(spark, dir, qs, topK = 5))
    val want = rows(Search.bm25TopK(
      corpus.filter(!$"doc_id".isin(1L, 4L)), qs, topK = 5))
    assert(got == want && got.nonEmpty)
    // df/N/avgdl really shifted: doc 2's "quick brown" score differs from
    // the full-corpus one (doc 1 left the df counts)
    val full = rows(Search.bm25TopK(corpus, qs, topK = 5))
    assert(got != full)
    // removing an id twice / a never-indexed id is a no-op
    SearchIndex.remove(dir, Seq(1L, 999L).toDF("doc_id"))
    assert(rows(SearchIndex.search(spark, dir, qs, topK = 5)) == got)
  }

  test("SearchIndex.vacuum is observationally identity and reclaims tombstones") {
    val dir = tmp("ret-vac")
    SearchIndex.build(corpus, dir)
    // vacuum with NO tombstones: pure no-op on results
    val before = rows(SearchIndex.search(spark, dir, qs, topK = 5))
    SearchIndex.vacuum(dir)
    assert(rows(SearchIndex.search(spark, dir, qs, topK = 5)) == before)
    SearchIndex.remove(dir, Seq(4L).toDF("doc_id"))
    val removed = rows(SearchIndex.search(spark, dir, qs, topK = 5))
    SearchIndex.vacuum(dir)
    assert(rows(SearchIndex.search(spark, dir, qs, topK = 5)) == removed)
    // physically gone: tombstones empty, postings/doclens lack doc 4
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)
    assert(spark.read.parquet(s"$dir/doclens.parquet")
      .filter($"doc_id" === 4L).count() == 0)
    assert(spark.read.parquet(s"$dir/postings.parquet")
      .filter($"doc_id" === 4L).count() == 0)
    // stats re-derived exactly
    assert(spark.read.parquet(s"$dir/stats.parquet").head()
      .getAs[Long]("n_docs") == 4L)
  }

  test("SearchIndex.compact: results identical, per-prefix file count collapses") {
    val dir = tmp("ret-compact")
    SearchIndex.build(corpus.filter($"doc_id" <= 2), dir)
    SearchIndex.append(dir, corpus.filter($"doc_id" === 3))
    SearchIndex.append(dir, corpus.filter($"doc_id" === 4))
    SearchIndex.append(dir, corpus.filter($"doc_id" === 5))
    val before = rows(SearchIndex.search(spark, dir, qs, topK = 5))
    val filesBefore = StoreOps.parquetFileCount(spark, s"$dir/postings.parquet")
    SearchIndex.compact(dir)
    assert(rows(SearchIndex.search(spark, dir, qs, topK = 5)) == before)
    val filesAfter = StoreOps.parquetFileCount(spark, s"$dir/postings.parquet")
    val nPfx = spark.read.parquet(s"$dir/postings.parquet")
      .select("pfx").distinct().count()
    assert(filesAfter < filesBefore, s"$filesAfter vs $filesBefore")
    assert(filesAfter == nPfx) // exactly one file per live prefix dir
  }

  test("SearchIndex.search(allowed) ≡ BM25 over the allowed sub-corpus (df/N/avgdl included)") {
    val dir = tmp("ret-allowed")
    SearchIndex.build(corpus, dir)
    val allow = Seq(2L, 3L, 4L, 5L).toDF("doc_id")
    val got = rows(SearchIndex.search(spark, dir, qs, topK = 5,
      allowed = Some(allow)))
    val want = rows(Search.bm25TopK(
      corpus.filter($"doc_id" =!= 1L), qs, topK = 5))
    assert(got == want && got.nonEmpty)
    // allowed composes with tombstones: remove 4, allow {2,3,4,5} ≡
    // rebuild on {2,3,5}
    SearchIndex.remove(dir, Seq(4L).toDF("doc_id"))
    val got2 = rows(SearchIndex.search(spark, dir, qs, topK = 5,
      allowed = Some(allow)))
    val want2 = rows(Search.bm25TopK(
      corpus.filter($"doc_id".isin(2L, 3L, 5L)), qs, topK = 5))
    assert(got2 == want2)
  }

  test("stores from before the tombstone layout still serve queries (migration fallback)") {
    val sDir = tmp("ret-migrate-s")
    SearchIndex.build(corpus, sDir)
    fs.delete(new Path(s"$sDir/tombstones.parquet"), true)
    assert(rows(SearchIndex.search(spark, sDir, qs, topK = 5)) ==
      rows(Search.bm25TopK(corpus, qs, topK = 5)))
    // vacuum on such a store is a compaction no-op, and heals the layout
    SearchIndex.vacuum(sDir)
    assert(fs.exists(new Path(s"$sDir/tombstones.parquet")))

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val aDir = tmp("ret-migrate-a")
    AnnIndex.build(emb, aDir,
      AnnIndex.Params(nCentroids = 8, multiAssign = 1, codebookIters = 0))
    val full = AnnIndex.query(spark, aDir, q, 5, nprobe = 2).count()
    fs.delete(new Path(s"$aDir/tombstones.parquet"), true)
    assert(AnnIndex.query(spark, aDir, q, 5, nprobe = 2).count() == full)
  }

  test("AnnIndex remove ≡ appends-never-contained; vacuum identity + row-identical codes") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .cache()
    val q = emb.filter($"vec_id" < 3)
    val half = emb.agg(max("vec_id")).head().getLong(0) / 2
    val doomed = Seq(half + 1, half + 2)
    val p = AnnIndex.Params(nCentroids = 8, multiAssign = 1, codebookIters = 0)

    val dir = tmp("ret-ann")
    AnnIndex.build(emb.filter($"vec_id" <= half), dir, p)
    AnnIndex.append(dir, emb.filter($"vec_id" > half))
    AnnIndex.remove(dir, doomed.toDF("vec_id"))

    // reference: same build, appends never contained the removed ids
    val ref = tmp("ret-ann-ref")
    AnnIndex.build(emb.filter($"vec_id" <= half), ref, p)
    AnnIndex.append(ref,
      emb.filter($"vec_id" > half && !$"vec_id".isin(doomed: _*)))

    def res(d: String) = AnnIndex.query(spark, d, q, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = res(ref)
    assert(res(dir) == want && want.nonEmpty)
    assert(!want.exists(r => doomed.contains(r._2)))

    AnnIndex.vacuum(dir)
    assert(res(dir) == want) // nothing observable changed
    def codeRows(d: String) = spark.read.parquet(s"$d/codes.parquet")
      .select($"vec_id", $"codes".cast("string"), $"cent_id")
      .as[(Long, String, Int)].collect().toSet
    assert(codeRows(dir) == codeRows(ref)) // the Scaladoc's row-identity claim
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)

    // compact: one file per list, results unchanged
    AnnIndex.append(dir, emb.filter($"vec_id" > half && $"vec_id" <= half + 5
      && !$"vec_id".isin(doomed: _*))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
    val preCompact = AnnIndex.query(spark, dir, q, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    val filesBefore = StoreOps.parquetFileCount(spark, s"$dir/codes.parquet")
    AnnIndex.compact(dir)
    val filesAfter = StoreOps.parquetFileCount(spark, s"$dir/codes.parquet")
    val nLists = spark.read.parquet(s"$dir/codes.parquet")
      .select("cent_id").distinct().count()
    assert(AnnIndex.query(spark, dir, q, 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet == preCompact)
    assert(filesAfter < filesBefore && filesAfter == nLists)
    emb.unpersist()
  }

  test("DedupIndex remove ≡ appends-never-contained; vacuum identity + physical reclaim") {
    // near-dup texts so LSH collides: docs 1/2/3 mutual near-dups, 4 unique
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val idx = Seq(1L -> base, 2L -> (base + " phi"),
      4L -> ("totally different words about sailing ships and ocean tides " +
        "under crimson evening skies far away from everything else entirely"))
      .toDF("doc_id", "text")
    val probe = Seq(10L -> (base + " chi")).toDF("doc_id", "text")

    val dir = tmp("ret-dedupidx")
    DedupIndex.build(idx, dir)
    DedupIndex.append(dir, Seq(3L -> (base + " psi")).toDF("doc_id", "text"))
    DedupIndex.remove(dir, Seq(2L).toDF("doc_id"))
    def hits(d: String) = DedupIndex.dedupAgainst(spark, d, probe)
      .as[(Long, Long, Double)].collect().toSet
    // reference: the appends/build never contained doc 2
    val ref = tmp("ret-dedupidx-ref")
    DedupIndex.build(idx.filter($"doc_id" =!= 2L), ref)
    DedupIndex.append(ref, Seq(3L -> (base + " psi")).toDF("doc_id", "text"))
    val want = hits(ref)
    assert(hits(dir) == want && want.map(_._2) == Set(1L, 3L))
    // removing twice / a never-indexed id is a no-op
    DedupIndex.remove(dir, Seq(2L, 999L).toDF("doc_id"))
    assert(hits(dir) == want)
    DedupIndex.vacuum(dir)
    assert(hits(dir) == want) // nothing observable changed
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)
    assert(spark.read.parquet(s"$dir/postings.parquet")
      .filter($"doc_id" === 2L).count() == 0)
    assert(spark.read.parquet(s"$dir/grams.parquet")
      .filter($"doc_id" === 2L).count() == 0)
    // compact: identity, file count collapses to one per (band, bpfx) dir
    val filesBefore = StoreOps.parquetFileCount(spark, s"$dir/postings.parquet")
    DedupIndex.compact(dir)
    assert(hits(dir) == want)
    val filesAfter = StoreOps.parquetFileCount(spark, s"$dir/postings.parquet")
    val nDirs = spark.read.parquet(s"$dir/postings.parquet")
      .select("band", "bpfx").distinct().count()
    assert(filesAfter <= filesBefore && filesAfter == nDirs)
  }

  test("DedupIndex probe prunes both store scans dynamically (bpfx + gpfx)") {
    // parquet-backed corpus + filtered probe, the serving shape: a
    // LocalRelation probe would be folded by ConvertToLocalRelation and
    // lose the selective Filter node DPP's trigger heuristic looks for
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = tmp("dpp-dedupidx")
    DedupIndex.build(docs.filter($"doc_id" % 10 =!= 9), dir)
    val probe = docs.filter($"doc_id" % 10 === 9)
    val plan = DedupIndex.dedupAgainst(spark, dir, probe)
      .queryExecution.executedPlan.toString
    // both the postings scan (bpfx) and the heavy grams scan (gpfx) must
    // carry dynamic-pruning subqueries — without them a serving-sized
    // probe reads 100% of a store that grows without bound
    val n = "dynamicpruning".r.findAllIn(plan.toLowerCase).size
    assert(n >= 2, s"expected >=2 dynamicpruning subqueries, got $n:\n" +
      plan.take(3000))
  }

  test("DedupIndex legacy (band-only) layout: probes work, maintenance fails fast") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val idx = Seq(1L -> base, 2L -> (base + " phi"))
      .toDF("doc_id", "text")
    val dir = tmp("legacy-dedupidx")
    DedupIndex.build(idx, dir)
    // strip the store down to the pre-pfx layout
    StoreOps.swapWrite(
      spark.read.parquet(s"$dir/postings.parquet")
        .select("doc_id", "bkey", "band").repartition(col("band")),
      s"$dir/postings.parquet", Seq("band"))
    StoreOps.swapWrite(
      spark.read.parquet(s"$dir/grams.parquet").select("doc_id", "gs"),
      s"$dir/grams.parquet")

    // probe still serves the old store (unpruned fallback joins)
    val probe = Seq(10L -> (base + " chi")).toDF("doc_id", "text")
    val hits = DedupIndex.dedupAgainst(spark, dir, probe)
      .select("dup_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))

    // maintenance refuses rather than mixing partition layouts
    for ((name, op) <- Seq[(String, () => Unit)](
        "append" -> (() => DedupIndex.append(dir,
          Seq(9L -> "new doc").toDF("doc_id", "text"))),
        "vacuum" -> (() => DedupIndex.vacuum(dir)),
        "compact" -> (() => DedupIndex.compact(dir)))) {
      val e = intercept[IllegalArgumentException] { op() }
      assert(e.getMessage.contains("legacy band-only layout"), s"$name: $e")
    }
    // and the refusals left the store untouched
    assert(DedupIndex.dedupAgainst(spark, dir, probe)
      .select("dup_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("SubstrIndex counted removal is exact: shared grams survive partial removal") {
    val run = (1 to 15).map(i => s"w$i").mkString(" ")   // shared by 1 and 2
    val solo = (1 to 15).map(i => s"v$i").mkString(" ")  // only doc 3
    val dir = tmp("ret-substr")
    SubstrIndex.build(Seq(1L -> run, 2L -> (run + " extra"), 3L -> solo)
      .toDF("doc_id", "text"), dir, k = 15)
    def dupTok(d: String, text: String): Long =
      SubstrIndex.dedupAgainst(spark, d,
        Seq(9L -> text).toDF("doc_id", "text"))
        .select("dup_tok").as[Long].head()
    assert(dupTok(dir, run) == 15L && dupTok(dir, solo) == 15L)
    // remove doc 2: run's gram still live via doc 1 — a SET would not know
    SubstrIndex.remove(dir, Seq(2L -> (run + " extra")).toDF("doc_id", "text"))
    assert(dupTok(dir, run) == 15L)
    // remove doc 1 too: now the gram is dead
    SubstrIndex.remove(dir, Seq(1L -> run).toDF("doc_id", "text"))
    assert(dupTok(dir, run) == 0L && dupTok(dir, solo) == 15L)
    // idempotent: re-removing and never-indexed ids change nothing
    SubstrIndex.remove(dir, Seq(1L -> run, 99L -> run).toDF("doc_id", "text"))
    assert(dupTok(dir, run) == 0L)
    // vacuum: identity + negative partials folded away + ledger shrunk
    SubstrIndex.vacuum(dir)
    assert(dupTok(dir, run) == 0L && dupTok(dir, solo) == 15L)
    assert(spark.read.parquet(s"$dir/postings.parquet")
      .filter($"cnt" <= 0).count() == 0)
    assert(spark.read.parquet(s"$dir/docids.parquet")
      .as[Long].collect().toSet == Set(3L))
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)
    // remove-then-vacuum ≡ an index that never held docs 1 and 2
    val ref = tmp("ret-substr-ref")
    SubstrIndex.build(Seq(3L -> solo).toDF("doc_id", "text"), ref, k = 15)
    def posting(d: String) = spark.read.parquet(s"$d/postings.parquet")
      .select("h", "cnt").as[(Long, Long)].collect().toSet
    assert(posting(dir) == posting(ref))
  }

  test("CentroidStore remove ≡ appends-never-contained; vacuum identity + reclaim") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val half = emb.agg(max("vec_id")).head().getLong(0) / 2
    val doomed = Seq(half + 1, half + 2)
    // probe with copies of the doomed vectors: before removal they are
    // exact dups (cos 1.0); after removal the store must score them as if
    // the doomed ids were never appended
    val probe = emb.filter($"vec_id".isin(doomed.map(Long.box): _*))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")

    val dir = tmp("ret-cent")
    CentroidStore.build(emb.filter($"vec_id" <= half), dir, nCentroids = 8)
    CentroidStore.append(dir, emb.filter($"vec_id" > half))
    def res(d: String) = CentroidStore.semDedupAgainst(spark, d, probe, 0.99)
      .as[(Long, Long, Boolean, Option[Long], Long)].collect().toSet
    assert(res(dir).exists(r => !r._3)) // doomed copies flagged pre-removal
    CentroidStore.remove(dir, doomed.toDF("vec_id"))

    val ref = tmp("ret-cent-ref")
    CentroidStore.build(emb.filter($"vec_id" <= half), ref, nCentroids = 8)
    CentroidStore.append(ref,
      emb.filter($"vec_id" > half && !$"vec_id".isin(doomed.map(Long.box): _*)))
    val want = res(ref)
    assert(res(dir) == want && want.nonEmpty)

    CentroidStore.vacuum(dir)
    assert(res(dir) == want)
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)
    assert(spark.read.parquet(s"$dir/members.parquet")
      .filter($"vec_id".isin(doomed.map(Long.box): _*)).count() == 0)
    // compact: identity + one file per cluster dir
    CentroidStore.compact(dir)
    assert(res(dir) == want)
    val files = StoreOps.parquetFileCount(spark, s"$dir/members.parquet")
    val nClusters = spark.read.parquet(s"$dir/members.parquet")
      .select("cent_id").distinct().count()
    assert(files == nClusters)
    emb.unpersist()
  }

  test("AnnIndex tombstone/allow filters keep dynamic partition pruning on the codes scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 2)
    val dir = tmp("ret-dpp")
    AnnIndex.build(emb,
      dir, AnnIndex.Params(nCentroids = 8, multiAssign = 1, codebookIters = 0))
    AnnIndex.remove(dir, Seq(7L).toDF("vec_id"))
    val allow = emb.select($"vec_id").filter($"vec_id" % 2 === 0)
    val plan = AnnIndex.query(spark, dir, q, 5, nprobe = 2,
      allowed = Some(allow)).queryExecution.executedPlan.toString
    // the codes scan must still carry the dynamic-pruning subquery on its
    // cent_id PartitionFilters — the anti/semi joins sit ABOVE the scoring
    // join, so they cannot block it (the r13 regression this pins against)
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(2000))
  }

  test("SubstrIndex legacy (pre-counted) layout: reads work, maintenance fails fast") {
    val run = (1 to 30).map(i => s"legacy$i").mkString(" ")
    val docs = Seq(1L -> run).toDF("doc_id", "text")
    // reproduce the OLD layout (h-only gram-set postings, no docids
    // ledger, no tombstones) by stripping a fresh build down to it —
    // what a pre-counted-layout build left on disk
    val dir = tmp("ret-legacy")
    SubstrIndex.build(docs, dir, k = 15, parts = 4)
    StoreOps.swapWrite(
      spark.read.parquet(s"$dir/postings.parquet")
        .select("h", "hp").distinct().repartition(col("hp")),
      s"$dir/postings.parquet", Seq("hp"))
    fs.delete(new Path(s"$dir/docids.parquet"), true)
    fs.delete(new Path(s"$dir/tombstones.parquet"), true)

    // the READ path still serves the old store: a twin of the indexed doc
    // is fully duplicated, a novel doc is untouched
    val probe = SubstrIndex.dedupAgainst(spark, dir,
      Seq(2L -> run, 3L -> "completely novel words only here forever")
        .toDF("doc_id", "text"))
      .select("doc_id", "kept_frac").as[(Long, Double)].collect().toMap
    assert(probe(2L) == 0.0 && probe(3L) == 1.0, probe.toString)

    // every maintenance op refuses rather than silently corrupting:
    // append would mix schemas, vacuum's Σcnt would null-drop every gram,
    // remove needs the unreconstructable docids ledger
    for ((name, op) <- Seq[(String, () => Unit)](
        "append" -> (() => SubstrIndex.append(dir,
          Seq(9L -> "new doc").toDF("doc_id", "text"))),
        "remove" -> (() => SubstrIndex.remove(dir,
          Seq(1L -> run).toDF("doc_id", "text"))),
        "vacuum" -> (() => SubstrIndex.vacuum(dir)))) {
      val e = intercept[IllegalArgumentException] { op() }
      assert(e.getMessage.contains("counted-partial layout"), s"$name: $e")
    }
    // and the store is untouched by the refusals: same probe answer
    val again = SubstrIndex.dedupAgainst(spark, dir,
      Seq(2L -> run).toDF("doc_id", "text"))
      .select("kept_frac").as[Double].head()
    assert(again == 0.0)
  }
}
