package graft

import org.apache.spark.sql.functions._

import graft.llm.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("encode: Viterbi picks the min-cost segmentation") {
    val docs = Seq((0L, "abab"), (1L, "aba")).toDF("doc_id", "text")
    val pieces = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5)
    val out = Unigram.encode(docs, pieces).orderBy("doc_id").collect()
    // "ab ab" costs 3.0; chars cost 4.0; mixed 3.5
    assert((out(0).getLong(1), out(0).getString(2)) == (2L, "ab ab"))
    // "ab a" = 2.5 beats "a b a" = 3.0
    assert((out(1).getLong(1), out(1).getString(2)) == (2L, "ab a"))
  }

  test("encode: equal-cost tie breaks on fewer pieces, then path") {
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    // "ab" as one piece costs 2.0; "a b" also 2.0 — np breaks the tie
    val pieces = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    val out = Unigram.encode(docs, pieces).collect()
    assert(out(0).getString(2) == "ab" && out(0).getLong(1) == 1L)
  }

  test("encode: uncoverable word yields <unk>, one piece") {
    val docs = Seq((0L, "az")).toDF("doc_id", "text")
    val pieces = Map("a" -> 1.0) // no 'z'
    val out = Unigram.encode(docs, pieces).collect()
    assert(out(0).getString(2) == "<unk>" && out(0).getLong(1) == 1L)
  }

  test("encode: multi-word doc concatenates word segmentations in order") {
    val docs = Seq((0L, "ab ba")).toDF("doc_id", "text")
    val pieces = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5)
    val out = Unigram.encode(docs, pieces).collect()
    assert(out(0).getString(2) == "ab b a")
    assert(out(0).getLong(1) == 3L)
  }

  test("native expression == HOF fold, ties and <unk> included") {
    val docs = Seq(
      (0L, "abab aba ab ba"), (1L, "xyz abq"), (2L, ""), (3L, "aaaa"))
      .toDF("doc_id", "text")
    // equal-cost ambiguity ("ab"=2.0 == "a"+"b") so the tie law is
    // exercised, plus uncoverable words (q/x/y/z missing)
    val pieces = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0, "ba" -> 1.5,
      "aa" -> 1.75)
    val native = Unigram.encode(docs, pieces).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val hof = Unigram.encodeHof(docs, pieces).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(native == hof)
    assert(native.exists(_._3.contains("<unk>")))
  }

  test("native == HOF on signed-zero cost ties (-0.0 == 0.0, SQL semantics)") {
    // "a b" sums to -0.0, "ab" costs 0.0: Spark SQL double ordering treats
    // the pair as EQUAL (SPARK-26021), so the tie must fall to np and pick
    // "ab"; java.lang.Double.compare alone would order -0.0 first and the
    // native path would diverge from the HOF struct-min.
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val pieces = Map("a" -> -0.0, "b" -> -0.0, "ab" -> 0.0)
    val native = Unigram.encode(docs, pieces).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    val hof = Unigram.encodeHof(docs, pieces).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(native.toSeq == hof.toSeq)
    assert(native(0) == ((1L, "ab")))
  }

  test("encodeRaw: lossless round-trip on case/punct/UTF-8/astral/whitespace") {
    val texts = Seq(
      "Hello, World!  Two  spaces\tand a\ttab\nnewline",
      "Ünïçødé ☃ «quoted» — em-dash 🙂 astral",
      "",
      "   ",
      "plain ascii lower 123")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val enc = Unigram.encodeRaw(docs)
    val rt = enc.select(col("doc_id"),
        graft.functions.SubwordRaw.decode(col("pieces")).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rt(i.toLong) == t, s"doc $i") }
  }

  test("encodeRaw: uncovered code points become UTF-8 byte pieces, np counts bytes") {
    val docs = Seq((0L, "a☃b")).toDF("doc_id", "text") // ☃ = 3 UTF-8 bytes
    val out = Unigram.encodeRaw(docs).collect()(0)
    val pieces = out.getSeq[String](2)
    assert(out.getLong(1) == 5L) // a + 3 byte pieces + b
    assert(pieces == Seq("a", "<0xE2>", "<0x98>", "<0x83>", "b"))
  }

  test("encodeRaw: vocab pieces beat byte fallback; byte-piece spelling rejected") {
    val docs = Seq((0L, "Hi")).toDF("doc_id", "text")
    // 'H' covered at cost 4.0 < byteCost 16.0 -> vocab piece chosen
    val out = Unigram.encodeRaw(docs,
      pieces = Map("H" -> 4.0, "i" -> 4.0)).collect()(0)
    assert(out.getSeq[String](2) == Seq("H", "i"))
    val ex = intercept[IllegalArgumentException] {
      Unigram.encodeRaw(docs, pieces = Map("<0xAB>" -> 1.0)).collect()
    }
    assert(ex.getMessage.contains("byte-fallback"))
  }

  test("trainRaw: cased/punctuated substrings become pieces; round-trip + compression") {
    val corpus = (0L until 30L)
      .map(i => (i, "Don't C++ rocks! Don't C++ ☃ plain")).toDF("doc_id", "text")
    val trained = Unigram.trainRaw(corpus, vocabSize = 32, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    // pieces unreachable in the [a-z0-9]+ world are learned here
    assert(trained.keys.exists(_.contains("'")), trained.keys.toString)
    assert(trained.keys.exists(_.contains("+")), trained.keys.toString)
    // no byte-piece spellings can enter the vocab
    assert(!trained.keys.exists(graft.functions.SubwordRaw.isBytePiece))
    // costs are -logp: feed them straight to encodeRaw and round-trip
    val costs = trained.map { case (p, lp) => p -> -lp }
    val probe = Seq((0L, "Don't stop — C++! ☃")).toDF("doc_id", "text")
    val enc = Unigram.encodeRaw(probe, costs)
    val rt = enc.select(graft.functions.SubwordRaw.decode(col("pieces")))
      .head().getString(0)
    assert(rt == "Don't stop — C++! ☃")
    // trained vocab compresses vs a chars-only baseline on in-domain text
    val base = Unigram.encodeRaw(corpus,
      ('a' to 'z').map(_.toString -> 4.0).toMap)
      .agg(sum("n_pieces")).head().getLong(0)
    val fit = Unigram.encodeRaw(corpus, costs)
      .agg(sum("n_pieces")).head().getLong(0)
    assert(fit < base, s"$fit !< $base")
  }

  test("train: a repeated substring becomes a piece and compresses encoding") {
    val docs = (0L until 30L).map(i => (i, "zqzq zqzq wxwx"))
      .toDF("doc_id", "text")
    val table = Unigram.train(docs, vocabSize = 40, iters = 3,
      maxPieceLen = 4)
    val pieces = table.as[(String, Long, Double)].collect()
    val multis = pieces.filter(_._1.length > 1).map(_._1).toSet
    assert(multis.exists(p => p == "zqzq" || p == "zq"),
      s"expected a zq piece in $multis")
    // encode with the trained costs: 'zqzq' compresses below char level
    val costs = pieces.map { case (p, _, lp) => p -> -lp }.toMap
    val enc = Unigram.encode(docs.limit(1), costs).collect()(0)
    assert(enc.getLong(1) < 12L, s"expected compression, got ${enc.getLong(1)} pieces: ${enc.getString(2)}")
    // round-trip: stripping spaces reproduces the text's words
    assert(enc.getString(2).replace(" ", "") == "zqzqzqzqwxwx")
    // deterministic across runs
    val again = Unigram.train(docs, vocabSize = 40, iters = 3,
      maxPieceLen = 4).as[(String, Long, Double)].collect()
    assert(pieces.toSeq == again.toSeq)
  }

  test("train: every single character survives pruning (totality)") {
    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    val table = Unigram.train(docs, vocabSize = 36, iters = 2)
    val ps = table.select("piece").as[String].collect().toSet
    assert(Unigram.Chars.forall(ps.contains))
  }
}
