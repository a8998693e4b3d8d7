package graft

import org.apache.spark.sql.functions._

import graft.llm._

/** [[graft.llm.TokenizerStore]] — the frozen-model contract for trained
  * tokenizers: store-loaded ≡ in-memory encode BIT-FOR-BIT for every
  * family, order preserved for BPE (rank IS the model), and the
  * `dir:<path>` tokenizer option resolves through the store. */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tokstore_$tag").toString

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the rain in spain  falls MAINLY on the plain!"),
    (2L, "don't pack 100% of thé data 🙂"),
    (3L, "late rain late rain late rain"))
    .toDF("doc_id", "text")

  test("trained byte-level BPE round-trips through parquet: order and spelling exact") {
    val learned = Bpe.learnMergesRaw(corpus, "text", 8)
    val merges = learned.map(m => (m._1, m._2))
    val dir = tmp("bpe_raw")
    TokenizerStore.save(spark, dir, BpeModel(merges, raw = true))
    val loaded = TokenizerStore.load(spark, dir)
    assert(loaded == BpeModel(merges, raw = true), s"model drift: $loaded")
    // encode bit-for-bit: the full Sep/Bnd token string, not just counts
    val mem = corpus.select(Bpe.tokenizedRaw(col("text"), merges).as("s"))
      .as[String].collect().toSeq
    val sto = corpus.select(Bpe.tokenizedRaw(col("text"),
        loaded.asInstanceOf[BpeModel].merges).as("s"))
      .as[String].collect().toSeq
    assert(mem == sto)
  }

  test("trained ws-level BPE: duplicate-left ranks survive the store ordering") {
    val learned = Bpe.learnMerges(corpus, "text", 6)
    val merges = learned.map(m => (m._1, m._2))
    val dir = tmp("bpe")
    TokenizerStore.save(spark, dir, BpeModel(merges, raw = false))
    val got = TokenizerStore.load(spark, dir).asInstanceOf[BpeModel]
    assert(got.merges == merges && !got.raw)
    val mem = corpus.select(Bpe.tokenCount(col("text"), merges).as("n"))
      .as[Long].collect().toSeq
    val sto = corpus.select(Bpe.tokenCount(col("text"), got.merges).as("n"))
      .as[Long].collect().toSeq
    assert(mem == sto)
  }

  test("trained Unigram costs round-trip losslessly (doubles bit-exact)") {
    val trained = Unigram.train(corpus, vocabSize = 48, iters = 2)
      .select("piece", "logp").as[(String, Double)].collect()
    val costs = trained.map { case (p, lp) => p -> -lp }.toMap
    val dir = tmp("unigram")
    TokenizerStore.save(spark, dir,
      UnigramModel(costs, raw = false, maxPieceLen = 8))
    val got = TokenizerStore.load(spark, dir).asInstanceOf[UnigramModel]
    assert(got.pieces == costs && got.maxPieceLen == 8) // == on doubles: bit-exact
    val mem = Unigram.encode(corpus, costs, maxPieceLen = 8)
      .select(col("doc_id"), col("n_pieces").cast("long"), col("segmented"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val sto = Unigram.encode(corpus, got.pieces, maxPieceLen = got.maxPieceLen)
      .select(col("doc_id"), col("n_pieces").cast("long"), col("segmented"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(mem == sto)
  }

  test("trained WordPiece vocab round-trips; raw unigram keeps byteCost") {
    val vocab = WordPiece.train(corpus, nMerges = 6)
      .select("piece").as[String].collect().toSeq
    val dir = tmp("wp")
    TokenizerStore.save(spark, dir,
      WordPieceModel(vocab, raw = false, maxPieceLen = 12))
    val got = TokenizerStore.load(spark, dir).asInstanceOf[WordPieceModel]
    assert(got.vocab.sorted == vocab.sorted && got.maxPieceLen == 12)
    val vmap = vocab.zipWithIndex.toMap
    val gmap = got.vocab.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val mem = WordPiece.encode(corpus, vmap, maxPieceLen = 12)
      .select("doc_id", "segmented").as[(Long, String)].collect().sortBy(_._1)
    val sto = WordPiece.encode(corpus, gmap, maxPieceLen = got.maxPieceLen)
      .select("doc_id", "segmented").as[(Long, String)].collect().sortBy(_._1)
    assert(mem.toSeq == sto.toSeq)
    // raw unigram config fields persist
    val dir2 = tmp("uraw")
    TokenizerStore.save(spark, dir2, UnigramModel(
      Unigram.DefaultRawPieces, raw = true, maxPieceLen = 24, byteCost = 16.0))
    val u = TokenizerStore.load(spark, dir2).asInstanceOf[UnigramModel]
    assert(u.raw && u.byteCost == 16.0 && u.pieces == Unigram.DefaultRawPieces)
  }

  test("dir:<path> tokenizer option: budgets and chunks run off the stored model") {
    val dir = tmp("opt")
    TokenizerStore.save(spark, dir,
      BpeModel(Bpe.DefaultRawMerges, raw = true))
    val docs = corpus.withColumn("source", lit("s"))
    // packSequences under dir:<path> ≡ under the equivalent named option
    val viaStore = Curation.packSequences(corpus, blockSize = 16L,
      tokenizer = s"dir:$dir").collect().map(_.toSeq).toSeq
    val viaName = Curation.packSequences(corpus, blockSize = 16L,
      tokenizer = "bpe_raw").collect().map(_.toSeq).toSeq
    assert(viaStore == viaName)
    val chunks = Curation.chunkOverlap(docs, chunkSize = 4, stride = 3,
      tokenizer = s"dir:$dir")
    assert(chunks.count() > 0)
    // non-BPE stored models refuse the token-array path loudly
    val dirU = tmp("optu")
    TokenizerStore.save(spark, dirU,
      UnigramModel(Unigram.DefaultRawPieces, raw = true))
    val e = intercept[IllegalArgumentException] {
      Curation.chunkOverlap(docs, chunkSize = 4, stride = 3,
        tokenizer = s"dir:$dirU")
    }
    assert(e.getMessage.contains("BPE-family"))
  }
}
