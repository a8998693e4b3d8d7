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

  test("pipeline --domain-cap: URL variants dedup and the per-domain cap binds first") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      // two URL keys per (source mod), many docs per domain → cap bites;
      // doc_id%2 makes half the URLs www./fragment variants of the other half
      .withColumn("url", expr(
        "concat('https://', CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END, " +
        "source, '.com/p/', CAST(doc_id % 4 AS STRING), " +
        "CASE WHEN doc_id % 2 = 0 THEN '#x' ELSE '' END)"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_dc").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, domainCap = Some(2)).cache()
    // every source (= registrable domain srcN.com) contributes ≤ 2 docs
    val perSrc = corpus.groupBy("source").count().select("count").as[Long].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_ <= 2L), perSrc.toSeq.toString)
    // missing url column fails loudly
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.drop("url"), out + "2", budget = 100L,
        minQuality = 0.0, domainCap = Some(2))
    }
    assert(e.getMessage.contains("url"))
    // NULL urls fail loudly too — they would all collapse onto one
    // canonical key and silently vanish under the cap otherwise
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.run(spark,
        docs.withColumn("url",
          when(col("doc_id") % 7 === 3, lit(null)).otherwise(col("url"))),
        out + "3", budget = 100L, minQuality = 0.0, domainCap = Some(2))
    }
    assert(e2.getMessage.contains("non-null urls"), e2.getMessage)
  }

  test("pipeline --domain-cap --psl: the cap groups by registrable domain, not ccTLD family") {
    // every source lands under .co.uk: without the table ALL docs share
    // the single domain 'co.uk' (cap 2 keeps 2 docs total); with it each
    // source is its own registrable domain and survives separately
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", expr(
        "concat('https://', source, '.co.uk/p/', CAST(doc_id % 4 AS STRING))"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_psl").toString
    val flat = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, domainCap = Some(2), stats = false)
    assert(flat.count() <= 2L, "no table: everything is one co.uk domain")
    val keyed = Pipeline.run(spark, docs, out + "2", budget = 100000L,
      minQuality = 0.0, domainCap = Some(2), stats = false,
      psl = Some(graft.llm.PublicSuffixes.Common)).cache()
    val perSrc = keyed.groupBy("source").count().select("count").as[Long].collect()
    assert(perSrc.length > 1 && perSrc.forall(_ <= 2L), perSrc.toSeq.toString)
    keyed.unpersist()
  }

  test("pipeline --boilerplate: banner lines are stripped from the written corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", expr(
        "concat('NAV ', source, chr(10), text, chr(10), 'Footer ', source)"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_bp").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, boilerplate = Some(3)).cache()
    assert(corpus.count() > 0)
    // the written corpus carries the redacted text of the STRIPPED docs
    val texts = corpus.select("text_redacted").as[String].collect()
    assert(texts.forall(t => !t.contains("NAV ") && !t.contains("Footer ")),
      "per-source banners must be stripped before scoring/dedup")
    assert(texts.forall(_.nonEmpty))

    // a NULL-text doc passes through the stage unchanged (left join +
    // coalesce) instead of silently dropping out of the corpus on the
    // old inner join — it still dies later at quality scoring, but the
    // stage's row count must not shrink
    val withNull = docs.withColumn("text",
      when(col("doc_id") % 11 === 5, lit(null)).otherwise(col("text")))
    val out2 = java.nio.file.Files.createTempDirectory("graft_pipe_bpn").toString
    // capture stage stats: after_boilerplate must equal the input count
    val stream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(stream, true, "UTF-8")) {
      Pipeline.run(spark, withNull, out2, budget = 100000L,
        minQuality = 0.0, boilerplate = Some(3))
    }
    val StatLine = """\{"stage":"([^"]+)","rows":(\d+)\}""".r
    val stats = stream.toString("UTF-8").linesIterator.collect {
      case StatLine(s, n) => s -> n.toLong
    }.toMap
    assert(stats("after_boilerplate") == stats("input"),
      s"NULL-text docs must survive the boilerplate stage: $stats")
  }

  test("pipeline --extract-html: text comes from raw pages; chrome never reaches the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("html", expr(
        "concat('<html><head><script>x()</script></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/a\">More</a></nav><p>', " +
          "text, '</p></body></html>')"))
      .drop("text")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_xh").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, extractHtml = true, stats = false).cache()
    assert(corpus.count() > 0)
    val texts = corpus.select("text_redacted").as[String].collect()
    assert(texts.forall(t => !t.contains("Home") && !t.contains("<p>")),
      "nav chrome and tags must not reach the corpus")
    corpus.unpersist()
    // missing / NULL html fail loudly
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.drop("html"), out + "2", budget = 100L,
        minQuality = 0.0, extractHtml = true, stats = false)
    }
    assert(e.getMessage.contains("html"))
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.withColumn("html",
          when(col("doc_id") % 5 === 1, lit(null)).otherwise(col("html"))),
        out + "3", budget = 100L, minQuality = 0.0, extractHtml = true,
        stats = false)
    }
    assert(e2.getMessage.contains("non-null html"))
  }

  test("pipeline --warc: crawl bytes in, curated corpus out; non-200 bodies never enter") {
    import spark.implicits._
    val CRLF = "\r\n"
    def rec(tpe: String, payload: String, extra: Seq[(String, String)] = Nil) = {
      val hdrs = Seq("WARC-Type" -> tpe) ++ extra ++
        Seq("Content-Length" -> payload.getBytes("UTF-8").length.toString)
      "WARC/1.0" + CRLF +
        hdrs.map { case (k, v) => s"$k: $v" }.mkString(CRLF) + CRLF + CRLF +
        payload
    }
    // one stream per doc: warcinfo + the doc's page as an HTTP 200
    // text/html response + a 404 whose body must never surface
    val streams = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq.map { case (id, src, text) =>
        val page = s"""<html><body><nav><a href="/">Home</a></nav><p>""" +
          text + "</p></body></html>"
        val s = Seq(
          rec("warcinfo", "software: graft-crawler 1.0"),
          rec("response",
            "HTTP/1.1 200 OK" + CRLF +
              "Content-Type: text/html; charset=utf-8" + CRLF + CRLF + page,
            Seq("WARC-Target-URI" -> s"https://$src.com/p/$id")),
          rec("response",
            "HTTP/1.1 404 Not Found" + CRLF +
              "Content-Type: text/html" + CRLF + CRLF + "GONEFOREVER",
            Seq("WARC-Target-URI" -> s"https://$src.com/gone")))
          .mkString("", CRLF + CRLF, CRLF + CRLF).getBytes("UTF-8")
        (id, src, s)
      }
    val docs = streams.toDF("doc_id", "source", "warc")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_warc")
      .toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, warc = true, stats = false).cache()
    assert(corpus.count() > 0)
    // only the 200 text/html record (rec_idx 1) becomes a document:
    // doc_id = stream_id << 20 | 1, stream source rides along
    val ids = corpus.select("doc_id").as[Long].collect()
    assert(ids.forall(id => (id & ((1L << 20) - 1)) == 1L),
      "every corpus doc must come from the stream's single 200 response")
    val texts = corpus.select("text_redacted").as[String].collect()
    assert(texts.forall(t => !t.contains("GONEFOREVER")),
      "404 bodies must never enter the corpus")
    assert(texts.forall(t => !t.contains("Home") && !t.contains("<p>")),
      "--warc forces extraction: chrome and tags must be gone")
    assert(corpus.select("source").as[String].collect().toSet
      .subsetOf(docs.select("source").as[String].collect().toSet))
    corpus.unpersist()
    // missing warc column fails loudly
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.drop("warc"), out + "2", budget = 100L,
        minQuality = 0.0, warc = true, stats = false)
    }
    assert(e.getMessage.contains("warc"))
  }

  test("pipeline --normalize NFC: decomposed duplicates collapse in exact dedup") {
    import spark.implicits._
    // doc 1 is doc 0 with every é DE-composed — bytes differ, text doesn't
    val base = "accent caf\u00e9 paragraph words enough here to pass the floor"
    val docs = Seq(
      (0L, base, "en", "web", base.length.toLong),
      (1L, base.replace("\u00e9", "e\u0301"), "en", "web", base.length + 1L),
      (2L, "a completely different document body with plenty of words",
        "en", "web", 57L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def surviving(normalize: Option[String]): Set[Long] = {
      val out = java.nio.file.Files.createTempDirectory("graft_nfc").toString
      // minJaccard raised past the twins' word-set similarity (caf vs
      // cafe differ by one token) so the NEAR-dup stage cannot mask the
      // exact-dedup behavior under test
      Pipeline.run(spark, docs, out, budget = 10000L, minQuality = 0.0,
          normalize = normalize, minJaccard = 0.95)
        .select("doc_id").as[Long].collect().toSet
    }
    val raw = surviving(None)
    assert(raw.contains(0L) && raw.contains(1L),
      "without normalization the byte-distinct twins both survive")
    val canon = surviving(Some("NFC"))
    assert(canon.contains(0L) && !canon.contains(1L),
      "NFC collapses the decomposed twin into the exact-dedup group")
    assert(canon.contains(2L))
  }

  test("pipeline --tokenizer unigram_raw: budget spends byte-fallback subword tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_tok").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 2000L,
      minQuality = 0.2, tokenizer = "unigram_raw").cache()
    val n = corpus.count()
    assert(n > 0)
    // the per-source spend respects the budget measured in encodeRaw
    // pieces (NOT whitespace words) — the same measure the mixer cut on
    val spend = corpus.select("doc_id", "source")
      .join(graft.llm.Unigram.encodeRaw(docs)
        .select(col("doc_id"), col("n_pieces").as("tok")), "doc_id")
      .groupBy("source").agg(sum("tok").as("spent"))
      .select("spent").as[Long].collect()
    assert(spend.nonEmpty && spend.forall(_ <= 2000L))
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

  test("pipeline --state-dir: second run dedups against the first run's stores") {
    import graft.llm.SketchStore
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch1 = docs.cache()
    val n1Ids = batch1.select("doc_id").as[Long].collect().toSet

    // near-orthogonal deterministic embeddings: doc d points along axis
    // d % 64 (+ tiny id-keyed noise), so distinct docs never cross tau
    // while an exact embedding copy is cosine 1
    def embFor(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map { id =>
        (id, Array.tabulate(64)(d =>
          (if (d == (id % 64).toInt) 1.0f else 0.0f) +
            (id * 64 + d) % 97 * 1e-4f))
      }.toDF("vec_id", "embedding")

    val state = java.nio.file.Files.createTempDirectory("graft_state").toString
    val out1 = java.nio.file.Files.createTempDirectory("graft_inc1").toString
    val corpus1 = Pipeline.run(spark, batch1, out1, budget = 1000000000L,
      minQuality = 0.0, stateDir = Some(state),
      embeddings = Some(embFor(n1Ids.toSeq.sorted)))
    val kept1 = corpus1.select("doc_id").as[Long].collect().toSet
    assert(kept1.size >= 8)
    for (store <- Seq("minhash/meta.parquet", "substr/meta.parquet",
        "centroids/centroids.parquet", "sketches/qbins.parquet"))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(state, store)), s"missing $store")

    // batch 2 (ids strictly above batch 1, the store convention):
    //  - copies: exact text twins of kept batch-1 docs -> minhash store drop
    //  - semdups: unique text but a kept batch-1 doc's EXACT embedding
    //             -> centroid store drop
    //  - novel: unique text + own axis embedding -> survives everything
    val survivors1 = batch1.filter(col("doc_id").isin(kept1.toSeq.sorted.take(8): _*))
      .orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect()
    val base = 100000L
    def uniqueText(tag: Long): String =
      (0 until 24).map(w => s"zq${tag}w$w").mkString(" ")
    val copies = survivors1.take(4).zipWithIndex.map { case ((_, t), i) =>
      (base + i, t, "en", "web", t.length.toLong) }
    val semdups = survivors1.slice(4, 8).zipWithIndex.map { case ((src, _), i) =>
      (base + 10 + i, uniqueText(10 + i), "en", "web", 100L, src) }
    val novel = (0 until 4).map { i =>
      (base + 20 + i, uniqueText(20 + i), "en", "web", 100L) }
    val batch2 = (copies ++ semdups.map(s => (s._1, s._2, s._3, s._4, s._5)) ++
      novel).toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    // novel embeddings span TWO axes: cosine vs any single-axis stored
    // vector is <= ~1/sqrt(2), and novel pairs use disjoint axis pairs —
    // safely under tau whatever axes batch 1 occupied
    def twoAxis(i: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == 40 + 2 * i || d == 41 + 2 * i) 1.0f else 0.0f)
    val emb2 = (semdups.map { s => // twin embedding of its batch-1 source
        (s._1, embFor(Seq(s._6)).select("embedding")
          .as[Array[Float]].head())
      } ++ copies.map(_._1).zipWithIndex.map { case (id, i) =>
        (id, twoAxis(8 + i))
      } ++ novel.map(_._1).zipWithIndex.map { case (id, i) =>
        (id, twoAxis(i))
      }).toSeq.toDF("vec_id", "embedding")

    val out2 = java.nio.file.Files.createTempDirectory("graft_inc2").toString
    val corpus2 = Pipeline.run(spark, batch2, out2, budget = 1000000000L,
      minQuality = 0.0, stateDir = Some(state), embeddings = Some(emb2))
    val kept2 = corpus2.select("doc_id").as[Long].collect().toSet

    // cross-batch near-dup: every exact twin of an already-released doc is
    // gone; every semantic twin is gone; the genuinely novel docs survive
    assert(copies.map(_._1).forall(id => !kept2.contains(id)),
      s"text twin of a released doc survived: $kept2")
    assert(semdups.map(_._1).forall(id => !kept2.contains(id)),
      s"embedding twin of a released doc survived: $kept2")
    assert(novel.map(_._1).forall(kept2.contains),
      s"novel doc dropped: $kept2")

    // sketch-store continuity: the length-distribution bins hold exactly
    // the released docs of BOTH runs (merge law: bin counts sum)
    val binTotal = spark.read.parquet(s"$state/sketches/qbins.parquet")
      .agg(sum("cnt")).as[Long].head()
    assert(binTotal == kept1.size + kept2.size,
      s"qbins holds $binTotal docs, released ${kept1.size + kept2.size}")
    // and the stores grew: batch-2 survivors were appended
    val memberCount = spark.read.parquet(s"$state/centroids/members.parquet")
      .count()
    assert(memberCount >= kept1.size + novel.size)
    batch1.unpersist()
  }

  test("pipeline --serve-dir: two runs build retrieval stores answering hybridFromStores over both batches") {
    import graft.llm.{AnnIndex, SearchIndex}
    // two crawls of distinct docs, each with a unique token and its own
    // embedding axis — the serve stores must accumulate BOTH releases
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    def axisEmb(ids: Seq[Long]) =
      ids.map(id => (id, Array.tabulate(64)(d =>
        if (d == (id % 64).toInt) 1.0f else 0.0f))).toDF("vec_id", "embedding")
    val batch1 = mkDocs(Seq(
      1L -> "alphaword falcon river stone market garden tree house",
      2L -> "bravoword copper kettle winter storm cloud rain snow",
      3L -> "charlieword paper letter stamp envelope post office desk"))
    val batch2 = mkDocs(Seq(
      11L -> "zetaword anchor harbor vessel sail wind tide wave",
      12L -> "etaword circuit diode resistor voltage current wire board"))
    val srv = java.nio.file.Files.createTempDirectory("graft_serve").toString
    val annP = AnnIndex.Params(nCentroids = 3, multiAssign = 1, m = 8,
      codebookSize = 4, codebookIters = 0)
    val out1 = java.nio.file.Files.createTempDirectory("graft_srv1").toString
    Pipeline.run(spark, batch1, out1, budget = 1000000000L, minQuality = 0.0,
      serveDir = Some(srv), embeddings = Some(axisEmb(Seq(1L, 2L, 3L))),
      annParams = annP)
    // run 2 drives the APPEND paths of both stores, with stats off (the
    // at-scale mode must exercise the same serve code path)
    val out2 = java.nio.file.Files.createTempDirectory("graft_srv2").toString
    Pipeline.run(spark, batch2, out2, budget = 1000000000L, minQuality = 0.0,
      serveDir = Some(srv), embeddings = Some(axisEmb(Seq(11L, 12L))),
      annParams = annP, stats = false)

    // both releases are in the lexical store's ledger
    assert(spark.read.parquet(s"$srv/search/doclens.parquet").count() == 5L)
    // and in the dense store's codes
    assert(spark.read.parquet(s"$srv/ann/codes.parquet")
      .select("vec_id").distinct().count() == 5L)

    // hybrid retrieval over the stores: each query pairs a batch's unique
    // token with that same doc's embedding — the doc wins both legs, so
    // it must come back fused rank 1, one doc per batch
    val queries = Seq(100L -> "alphaword falcon", 200L -> "zetaword anchor")
      .toDF("query_id", "qtext")
    val qvecs = axisEmb(Seq(1L, 11L))
      .select(col("vec_id").as("query_id"), col("embedding"))
      .withColumn("query_id",
        when(col("query_id") === 1L, 100L).otherwise(200L))
    val fused = SearchIndex.hybridFromStores(spark, s"$srv/search",
      s"$srv/ann", queries, qvecs, topK = 3, kRetrieve = 5, nprobe = 3)
    val top = fused.filter(col("rk") === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(top(100L) == 1L, s"batch-1 doc not served: $top")
    assert(top(200L) == 11L, s"batch-2 doc not served: $top")
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

  test("pipeline --robots: disallowed URLs never reach the corpus; " +
    "unlisted hosts pass") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", expr(
        "concat('https://', source, '.com/p/', CAST(doc_id % 4 AS STRING))"))
    // src0.com forbids /p/1 and /p/3; other hosts have no robots at all
    val robotsDir =
      java.nio.file.Files.createTempDirectory("graft_pipe_rob").toString
    Seq(("src0.com", "User-agent: *\nDisallow: /p/1\nDisallow: /p/3\n"))
      .toDF("host", "robots_txt").write.mode("overwrite").parquet(robotsDir)
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_rb").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, robots = Some(robotsDir), stats = false).cache()
    val src0 = corpus.filter(col("source") === "src0")
      .select("doc_id").as[Long].collect()
    assert(src0.nonEmpty && src0.forall(_ % 4 % 2 == 0),
      s"src0 odd paths must be robots-blocked: ${src0.toSeq}")
    assert(corpus.filter(col("source") =!= "src0").count() > 0,
      "hosts without robots must pass untouched")
    corpus.unpersist()
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.drop("url"), out + "2", budget = 100L,
        minQuality = 0.0, robots = Some(robotsDir), stats = false)
    }
    assert(e.getMessage.contains("--robots"))
  }

  test("pipeline --link-prior: host_rank columns ride into the corpus; " +
    "linked hosts outrank unlinked, missing crawl columns fail loudly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", expr(
        "concat('https://', source, '.com/p/', CAST(doc_id AS STRING))"))
      // every page links hub.example; pages on even docs also link src0.com
      .withColumn("html", expr(
        "concat('<html><body><p>', text, " +
          "'</p><a href=\"https://hub.example/\">hub</a>', " +
          "CASE WHEN doc_id % 2 = 0 THEN " +
          "'<a href=\"https://src0.com/x\">s</a>' ELSE '' END, " +
          "'</body></html>')"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_lp").toString
    val corpus = Pipeline.run(spark, docs, out, budget = 100000L,
      minQuality = 0.0, linkPrior = Some(3), stats = false).cache()
    assert(corpus.columns.contains("host_rank_fp") &&
      corpus.columns.contains("host_rank"))
    val bySrc = corpus.select(col("source"), col("host_rank_fp"))
      .as[(String, Long)].collect().toMap
    // src0.com has in-links (half the crawl), src1.com only out-links:
    // the prior must order them; and riding through later stages must
    // keep the column single-valued per host
    if (bySrc.contains("src0") && bySrc.size > 1)
      assert(bySrc("src0") > bySrc.values.min,
        s"src0 should outrank an un-linked host: $bySrc")
    corpus.unpersist()
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.drop("html"), out + "2", budget = 100L,
        minQuality = 0.0, linkPrior = Some(3), stats = false)
    }
    assert(e.getMessage.contains("--link-prior"))
  }
}
