package graft

import graft.llm.WordPiece

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private[graft] def doc(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def seg(text: String, vocab: Map[String, Int]): (Long, String) = {
    val r = WordPiece.encode(doc(text), vocab).collect()(0)
    (r.getLong(1), r.getString(2))
  }

  test("encode: greedy longest-match with ## continuations") {
    val v = Map("un" -> 1, "##able" -> 1, "##a" -> 1, "##b" -> 1,
      "##l" -> 1, "##e" -> 1, "u" -> 1, "##n" -> 1)
    assert(seg("unable", v) == ((2L, "un ##able")))
    // no whole-word piece: longest prefix then char continuations
    assert(seg("unb", v) == ((2L, "un ##b")))
  }

  test("encode: greedy is NOT Viterbi — longest-first can cost a piece") {
    // optimal is "a ##bcd" (2 pieces) but greedy takes "ab" first
    val v = Map("ab" -> 1, "a" -> 1, "##bcd" -> 1, "##b" -> 1,
      "##c" -> 1, "##d" -> 1)
    assert(seg("abcd", v) == ((3L, "ab ##c ##d")))
  }

  test("encode: any unmatched position makes the WHOLE word [UNK]") {
    val v = Map("a" -> 1, "##a" -> 1, "b" -> 1) // no ##b: 'ab' fails at pos 1
    assert(seg("ab", v) == ((1L, "[UNK]")))
    // multi-word doc: only the uncoverable word collapses
    val r = seg("aa ab", v)
    assert(r == ((3L, "a ##a [UNK]")))
  }

  test("encode: word-initial pieces never match mid-word and vice versa") {
    val v = Map("aa" -> 1, "a" -> 1) // no continuation pieces at all
    assert(seg("aaa", v) == ((1L, "[UNK]"))) // 'aa' matches pos 0, then stuck
  }

  test("native expression == HOF fold on a mixed corpus (incl. UNK and empty)") {
    val corpus = doc(
      "the fast key order sort table scan merge part window",
      "batch batch batch stream spark window window dup",
      "unseenword the spark", "", "a")
    // a vocab with partial coverage so UNK paths and multi-piece greedy
    // walks both occur
    val v = (('a' to 'z').map(_.toString) ++
      Seq("##a", "##t", "##h", "##e", "the", "spark", "bat", "##ch", "wind",
        "##ow", "##ast", "##ey")).map(_ -> 1).toMap
    val native = WordPiece.encode(corpus, v).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val hof = WordPiece.encodeHof(corpus, v).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(native == hof)
    assert(native.exists(_._3.contains("[UNK]"))) // the UNK path really ran
  }

  test("train: likelihood argmax beats raw frequency (the francisco effect)") {
    // pair (x,##y) appears 4× but x,y are everywhere (diluted score);
    // (q,##z) appears 3× and q,z appear ONLY together -> higher
    // likelihood: 3/(3·3) = 1/3 > 4/(c(x)·c(##y))
    val corpus = doc(
      (Seq.fill(4)("xy") ++ Seq.fill(9)("x") ++ Seq.fill(9)("ayb") ++
        Seq.fill(3)("qz")).mkString(" "))
    val vocab = WordPiece.train(corpus, nMerges = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.contains("qz"), s"expected merged piece qz in $vocab")
    assert(!vocab.contains("xy"))
  }

  test("train: continuation merges keep the ## mark; encode round-trips") {
    val corpus = doc("with with with width")
    val vocab = WordPiece.train(corpus, nMerges = 6)
      .collect().map(r => r.getString(0) -> 1).toMap
    // some ##-continuation merge must have emerged from inside the words
    assert(vocab.keys.exists(p => p.startsWith("##") && p.length > 3))
    val enc = WordPiece.encode(doc("with width wit"), vocab).collect()(0)
    assert(!enc.getString(2).contains("[UNK]"))
    val rebuilt = enc.getString(2).split(" ")
      .map(_.stripPrefix("##")).mkString("")
    assert(rebuilt == "withwidthwit")
    // chars + ##chars force-included: a fresh word stays encodable
    val fresh = WordPiece.encode(doc("zzz"), vocab).collect()(0)
    assert(!fresh.getString(2).contains("[UNK]"))
  }

  test("encodeRaw: lossless MaxMatch round-trip, greedy prefers longest") {
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "Greedy, Raw!  Mode\twith\nUTF-8: Ünï ☃ 🙂 end",
      "themes the them") // longest-match: "themes" whole if in vocab
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocab = Set("the", "them", "themes", "e", "s", "m") ++
      ('a' to 'z').map(_.toString)
    val enc = WordPiece.encodeRaw(docs, vocab)
    val rows = enc.select(col("doc_id"),
        graft.functions.SubwordRaw.decode(col("pieces")).as("rt"),
        col("pieces"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong)._1 == t, s"doc $i") }
    // greedy longest-match: "themes" one piece, "them" one piece
    // (the space between is uncovered -> byte piece 0x20)
    assert(rows(1L)._2.take(2) == Seq("themes", "<0x20>"))
    assert(rows(1L)._2.contains("them"))
    // uncovered uppercase rides byte fallback (G = 0x47)
    assert(rows(0L)._2.contains("<0x47>"))
  }
}
