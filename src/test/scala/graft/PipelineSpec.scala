package graft

import org.apache.spark.sql.functions._

/** End-to-end curation pipeline (graft.Pipeline.run) on real testdata. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline composes: dedup -> quality -> redact -> budget mix -> pack") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 400L, minQuality = 0.2,
      chunks = Some((32, 24)))
      .cache()

    val n = corpus.count()
    assert(n > 0 && n < docs.count()) // dedup + budget actually removed rows

    // per-source token spend respects the budget (tokens of the ORIGINAL
    // text, the same measure mixByBudget cuts on)
    val spend = corpus.select("doc_id", "source")
      .join(docs.select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)"))
          .cast("long").as("tok")), "doc_id")
      .groupBy("source").agg(sum("tok").as("spent"))
      .select("spent").as[Long].collect()
    assert(spend.nonEmpty && spend.forall(_ <= 400L))

    // packing tiles the kept docs: block spans are monotone in doc_id
    val packs = corpus.orderBy("doc_id")
      .select("first_block", "last_block").as[(Long, Long)].collect()
    assert(packs.sliding(2).forall {
      case Array(a, b) => a._1 <= b._1 && a._2 <= b._2; case _ => true })

    // exact-dup losers are gone: every normalized text is unique
    val texts = corpus.join(docs.select("doc_id", "text"), "doc_id")
      .select(lower(trim(col("text")))).as[String].collect()
    assert(texts.distinct.length == texts.length)

    // redaction happened: no raw emails survive in the emitted text
    val emails = corpus.filter(col("text_redacted").rlike(
      graft.llm.TextAnalysis.EmailRe)).count()
    assert(emails == 0)

    // the chunked RAG view shipped, covers every corpus doc, and is
    // windowed over the REDACTED text (no resurfaced emails)
    val chunks = spark.read.parquet(s"$out/chunks").cache()
    assert(chunks.select("doc_id").distinct().count() ==
      corpus.filter(length(trim(col("text_redacted"))) > 0).count())
    assert(chunks.agg(max("n_tok")).as[Long].head() <= 32L)
    assert(chunks.filter(col("chunk_text").rlike(
      graft.llm.TextAnalysis.EmailRe)).count() == 0)
    chunks.unpersist()

    // the data card shipped next to the corpus and is well-formed JSON
    val cardPath = java.nio.file.Paths.get(out, "datacard.json")
    assert(java.nio.file.Files.exists(cardPath))
    val card = spark.read.option("multiLine", true).json(cardPath.toString)
    val row = card.head()
    assert(row.getAs[Long]("rows") == n)
    assert(row.getAs[Long]("total_tokens") > 0)
    assert(card.columns.contains("pred_lang_mix") &&
      card.columns.contains("source_mix"))
    corpus.unpersist()
  }

  test("pipeline decontaminates against a file-loaded JSONL benchmark") {
    import graft.llm.Curation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // build an eval set from real corpus text: one doc's first 8 words as a
    // "prompt" (guaranteed 5-gram hit), plus a question no doc contains,
    // exercising the mixed-field coalesce
    val victim = docs.orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].head()
    val prompt = victim._2.split("\\s+").take(8).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_bench")
    val benchFile = dir.resolve("eval.jsonl")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    java.nio.file.Files.writeString(benchFile,
      s"""{"prompt": ${jstr(prompt)}}
         |{"question": "what is the airspeed velocity of an unladen swallow"}
         |""".stripMargin)

    val bench = Curation.loadBenchmark(spark, benchFile.toString)
    assert(bench.count() == 2) // both field spellings loaded

    // direct operator: the victim doc is flagged, and a hit was found
    val dec = Curation.decontaminateAgainst(docs, bench)
    val flagged = dec.filter(col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    assert(flagged.contains(victim._1))

    // end-to-end: the pipeline drops the victim from the corpus
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_dec").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 400L,
      minQuality = 0.0, benchmark = Some(bench))
    assert(!corpus.select("doc_id").as[Long].collect().contains(victim._1))
  }

  test("pipeline --gopher pre-filter drops rule violators before the scored stages") {
    import graft.llm.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_gopher").toString
    // minWords=40 splits this corpus (docs run 10-99 words); minStop=0
    // keeps the stop rule neutral on the synthetic vocabulary
    val corpus = Pipeline.run(spark, docs, out, budget = 400L,
      minQuality = 0.0, gopher = Some((40L, 0)))
    val kept = corpus.select("doc_id").as[Long].collect().toSet
    val violators = TextAnalysis.gopherRules(docs, minWords = 40, minStop = 0)
      .filter(!col("pass")).select("doc_id").as[Long].collect().toSet
    assert(violators.nonEmpty)            // the knob actually bites here
    assert(kept.intersect(violators).isEmpty) // and no violator survives
  }
}
