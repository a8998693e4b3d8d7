package graft

import org.apache.spark.sql.functions._

import graft.llm.{Bpe, Curation}

/** Pins the merge-table BPE encoder ([[graft.llm.Bpe]]): fixed-order
  * replace-chain semantics on known strings, sentinel edge cases, and the
  * tokenizer option threading through the token-budget operators. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def countOf(text: String): Long =
    Seq(text).toDF("text").select(Bpe.tokenCount(col("text")).as("n"))
      .as[Long].head()

  private def tokensOf(text: String): Seq[String] =
    Seq(text).toDF("text").select(Bpe.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("known strings tokenize to pinned counts and token sequences") {
    // hand-derived under DefaultMerges' fixed order:
    //   the   → th+e → the (1)        table → ta+ble (depth-3 chain, 1)
    //   and   → an+d (1)              fast  → f, a, st (3: (a,t) never
    //   part  → p, ar, t (3)                  adjacent; (s,t) first)
    assert(tokensOf("the table and the fast part") ==
      Seq("the", "table", "and", "the", "f", "a", "st", "p", "ar", "t"))
    assert(countOf("the table and the fast part") == 10L)
    // token-prefix false-match guard: (a, s) must NOT merge `a` with the
    // `st` token's leading s — Sep-wrapping makes the pattern whole-token
    assert(tokensOf("fast") == Seq("f", "a", "st"))
    // merges never cross a word boundary
    assert(tokensOf("pla net") == Seq("p", "l", "a", "n", "e", "t"))
    assert(tokensOf("planet") == Seq("p", "l", "an", "e", "t"))
  }

  test("edge cases: empty, whitespace-only, leading/trailing runs") {
    assert(countOf("") == 0L)
    assert(countOf("  \t\n  ") == 0L)
    assert(countOf("  the  ") == 1L)
    assert(tokensOf("\t the \n table ") == Seq("the", "table"))
  }

  test("decode inverts the encoder: round-trip equals whitespace normalization") {
    def rt(text: String): String =
      Seq(text).toDF("text").select(Bpe.roundTrip(col("text")).as("r"))
        .as[String].head()
    // merges concatenate in place, so every character survives
    assert(rt("the table and the fast part") == "the table and the fast part")
    // the ONE lossy step is deliberate: whitespace runs → single space
    assert(rt("\t the \n\n  table ") == " the table ")
    assert(rt("") == "")
    // characters no merge rule touches pass through untouched
    assert(rt("x9!? planet") == "x9!? planet")
    // corpus-wide: decode∘encode == normalized text on every document
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = d.select(
        Bpe.roundTrip(col("text")).as("rt"),
        regexp_replace(col("text"), "[ \\t\\n\\r]+", " ").as("norm"))
      .filter(col("rt") =!= col("norm")).count()
    assert(diff == 0L)
  }

  test("BPE count is bounded by chars and compresses vs chars on real text") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), Bpe.tokenCount(col("text")).as("bpe"),
        Curation.tokCount(col("text")).as("ws"),
        length(regexp_replace(col("text"), "[ \\t\\n\\r]+", "")).as("chars"))
      .collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val (bpe, ws, chars) = (r.getLong(1), r.getLong(2), r.getInt(3).toLong)
      assert(bpe >= ws, s"doc ${r.getLong(0)}: every word is >= 1 token")
      assert(bpe <= chars, s"doc ${r.getLong(0)}: merges only shrink")
    }
    // the corpus is English-like: the merge table should actually fire
    val totBpe = d.map(_.getLong(1)).sum.toDouble
    val totChar = d.map(_.getInt(3).toLong).sum.toDouble
    assert(totBpe < 0.85 * totChar, "default merges compress < 0.85x chars")
  }

  test("tokenizer option: packSequences/'bpe' uses BPE counts, same packing") {
    val docs = Seq((0L, "the table"), (1L, "fast part"), (2L, ""))
      .toDF("doc_id", "text")
    val packed = Curation.packSequences(docs, blockSize = 4, tokenizer = "bpe")
      .select("doc_id", "tok", "off").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // BPE: doc0 = the(1) + table(1) = 2; doc1 = f,a,st,p,ar,t = 6; doc2 = 0
    assert(packed.map(r => r._1 -> r._2).toSeq == Seq(0L -> 2L, 1L -> 6L, 2L -> 0L))
    assert(packed.map(_._3).toSeq == Seq(0L, 2L, 8L)) // running offsets
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, 4, tokenizer = "nope").collect()
    }
  }

  test("learnMerges: hand-derived trainer run, overlap counting, early stop, round-trip into tokenCount") {
    val docs = Seq((0L, "aa ab"), (1L, "aa aaa")).toDF("doc_id", "text")
    // char pairs: (a,a) in aa, aa, aaa×2 (overlapping positions count) = 4;
    // (a,b) = 1 → merge 1 = (a,a,4). Re-encode: aa→[aa], aaa→[aa,a] (replace
    // is left-to-right non-overlapping), ab→[a,b]: pairs (aa,a)=1, (a,b)=1 →
    // tie broken by (lt, rt) ascending → merge 2 = (a,b,1). Then (aa,a)=1 is
    // merge 3; nothing adjacent remains → early stop before 5.
    val learned = graft.llm.Bpe.learnMerges(docs, "text", 5)
    assert(learned == Seq(("a", "a", 4L), ("a", "b", 1L), ("aa", "a", 1L)))
    // the learned table drops straight into the encoder
    val merges = learned.map(m => (m._1, m._2))
    val counts = docs.select(col("doc_id"),
        graft.llm.Bpe.tokenCount(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 2L, 1L -> 2L)) // [aa][ab] and [aa][aa,a→aaa]
  }

  test("learnMerges batching: B=1 is the exact trainer; disjoint batches reproduce the sequential table") {
    // batch = 1 must be byte-identical to the default path (it IS the
    // default path — pinned so the option can't drift)
    val tiny = Seq((0L, "aa ab"), (1L, "aa aaa")).toDF("doc_id", "text")
    assert(graft.llm.Bpe.learnMerges(tiny, "text", 5, batch = 1) ==
      graft.llm.Bpe.learnMerges(tiny, "text", 5))
    // compound-safety guard: after selecting (a,a) the compound bound is
    // cnt(a,a) itself (rows with rt=a), so (a,b) at cnt 1 can't join the
    // batch — the batched run degrades to sequential and still converges
    // to the identical table
    assert(graft.llm.Bpe.learnMerges(tiny, "text", 5, batch = 8) ==
      graft.llm.Bpe.learnMerges(tiny, "text", 5))
    // the gate corpus: batched output is PROVABLY sequential-equal —
    // here rank 6 of the sequential run is (m, er), a compound of merge
    // 1 (e, r), and the compound bound cuts the first batch before it;
    // the equality must hold bit-for-bit including recorded counts
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val seq8 = graft.llm.Bpe.learnMerges(docs, "text", 8)
    val bat8 = graft.llm.Bpe.learnMerges(docs, "text", 8, batch = 8)
    assert(bat8 == seq8)
  }

  test("tokenizer option: chunkOverlap/'bpe' windows subword tokens") {
    val docs = Seq((0L, "the table and the fast part")).toDF("doc_id", "text")
    val chunks = Curation.chunkOverlap(docs, chunkSize = 4, stride = 3,
        tokenizer = "bpe")
      .select("chunk_id", "n_tok", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // 10 bpe tokens, windows start at 0,3,6: last window (6..9) reaches end
    assert(chunks.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(chunks.map(_._2).toSeq == Seq(4L, 4L, 4L))
    assert(chunks.head._3 == "the table and the")
    assert(chunks.last._3 == "st p ar t")
  }
}
