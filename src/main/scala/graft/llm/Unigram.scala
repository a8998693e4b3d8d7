package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM (SentencePiece-style) subword tokenizer: Viterbi encoding
  * against a piece table, and a hard-EM trainer (Kudo 2018,
  * arXiv:1804.10959 — the unigram counterpart of [[Bpe]]'s merge-rule
  * tokenizer; reference has no tokenizer at all, this is LLM-pipeline
  * surface).
  *
  * ENCODING is per-word dynamic programming: the best segmentation of
  * `w[0..n)` minimizes the summed piece costs, `best(i) = min over j of
  * best(j) + cost(w[j..i))`. The whole DP is ONE column expression — an
  * `aggregate` fold over positions carrying the growing `best` array, a
  * map-literal lookup per candidate piece — so encoding is a pure map
  * over rows: zero shuffle, zero driver involvement, embarrassingly
  * parallel at any corpus size (the same contract as [[Bpe.encode]]).
  * Ties break on the (cost, n_pieces, path) struct order, so equal-cost
  * segmentations resolve deterministically in any engine that compares
  * structs lexicographically.
  *
  * TRAINING is the hard-EM (Viterbi-EM) variant: the E-step counts
  * pieces along each word's single BEST segmentation (full EM uses
  * forward–backward marginals; hard EM is the standard deterministic
  * simplification and converges to the same fixed points on peaked
  * distributions). Each iteration segments the DISTINCT-WORD frame (not
  * the corpus — word frequency weights the counts), re-estimates piece
  * costs, and prunes to the vocab budget keeping all single characters
  * (so every word stays segmentable — the <unk>-free invariant). The
  * piece table is a MODEL (bounded by `seedSize`/`vocabSize` knobs, like
  * [[Ann.lloydCentroids]]'s centroids), so the driver-side collect per
  * iteration is bounded by a knob, never by corpus size.
  */
object Unigram {

  /** All 36 single characters the token alphabet can produce — always in
    * the vocab, so segmentation is total (no <unk> needed for [[tokens]]
    * output). */
  val Chars: Seq[String] = (('a' to 'z') ++ ('0' to '9')).map(_.toString)

  /** Best-segmentation struct for one word under a piece→cost map:
    * struct(cost, np, path) or null if unreachable. `maxPieceLen` bounds
    * the DP's backward window (candidates per position), and therefore
    * the oracle's generated CTE width. */
  private[llm] def segmentStruct(word: Column, pieces: Map[String, Double],
                                 maxPieceLen: Int): Column = {
    val pmap = typedLit(pieces)
    // probe only piece LENGTHS the table contains: the 1..maxPieceLen
    // backward window is mostly misses, and each miss still pays an
    // O(|pieces|) literal-map probe — the distinct-length list cuts the
    // per-position candidate loop to a handful of entries (same trick as
    // [[WordPiece.segmentGreedy]]; candidate SET unchanged, so the
    // struct-min tie law is untouched)
    val lens = typedLit(pieces.keys.map(_.length)
      .filter(l => l >= 1 && l <= maxPieceLen).toSeq.distinct.sorted)
    val best = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0.0).as("cost"), lit(0).as("np"), lit("").as("path"))),
      (acc, i) => {
        val cands = filter(
          transform(lens, l => {
            val j = i - l
            val piece = word.substr(j + 1, l)
            val c = element_at(pmap, piece)
            // greatest(): j < 0 rows are discarded by the when() below,
            // but element_at must still see a legal (≥1) index
            val prev = element_at(acc, greatest(j + 1, lit(1)))
            when(j >= 0 && c.isNotNull && prev.isNotNull,
              struct((prev("cost") + c).as("cost"),
                (prev("np") + 1).as("np"),
                concat(prev("path"),
                  when(prev("np") === 0, lit("")).otherwise(lit(" ")),
                  piece).as("path")))
              .otherwise(lit(null).cast(
                "struct<cost:double,np:int,path:string>"))
          }), x => x.isNotNull)
        concat(acc, array(array_min(cands)))
      })
    element_at(best, length(word) + 1)
  }

  /** Viterbi-encode every document: (doc_id, n_pieces, segmented) where
    * `segmented` is the space-joined piece stream in word order (words
    * are [[Dedup.tokens]] output; pieces never cross word boundaries —
    * the whitespace-pretokenized SentencePiece mode). A word the piece
    * table cannot cover contributes the `<unk>` piece (impossible when
    * the table holds [[Chars]]). */
  def encode(docs: DataFrame, pieces: Map[String, Double],
             maxPieceLen: Int = 24): DataFrame = {
    // native expression ([[graft.functions.UnigramSeg]]): one compiled
    // Viterbi pass per document with a per-doc distinct-word memo — a
    // zero-shuffle pure map with no interpreted higher-order-function
    // dispatch; identical candidate set and struct-min tie law, pinned
    // by UnigramSpec's native == HOF A/B and the DuckDB gate
    val toks = Dedup.tokens(col("text"))
    val enc = org.apache.spark.sql.GraftExpr.column(
      graft.functions.UnigramSeg(
        org.apache.spark.sql.GraftExpr.expression(toks),
        pieces, maxPieceLen))
    docs
      .withColumn("__enc__", enc)
      .select(col("doc_id"), col("__enc__.n_pieces").as("n_pieces"),
        col("__enc__.segmented").as("segmented"))
  }

  /** Default piece table for the RAW encoder when a caller just wants
    * byte-fallback token counts (budgets, packing): the 36 [[Chars]] plus
    * a few high-frequency English pieces — uncovered characters (case,
    * punctuation, UTF-8) ride the byte fallback, so the table's quality
    * only shifts fertility, never coverage. Costs are the tokenizer-gate
    * dyadic convention (char 4.0, multi-char len·4−2). */
  val DefaultRawPieces: Map[String, Double] =
    (Chars.map(_ -> 4.0) ++ Seq("the", "and", "ing", "ion", "er", "ed",
      "in", "on", "at", "es", "en", "of", "to", "is", "or", "ar")
      .map(w => w -> (w.length * 4.0 - 2.0))).toMap

  /** LOSSLESS byte-fallback encoding over the RAW text — case,
    * punctuation, whitespace runs and non-ASCII all preserved (the
    * SentencePiece `--byte_fallback` recipe; [[encode]] is the word-level
    * corpus-statistics mode). Pre-tokens are alternating `\S+`/`\s+`
    * runs; uncovered code points become UTF-8 byte pieces `<0xAB>`, so
    * every document is coverable with no `<unk>`. Output: (doc_id,
    * n_pieces, pieces array<string>); [[graft.functions.SubwordRaw.decode]]
    * inverts exactly — decode(encodeRaw(text).pieces) == text, the
    * `tokenize_raw_unigram` gate law. Same zero-shuffle pure-map shape as
    * [[encode]] (one compiled pass per document, per-doc run memo). */
  def encodeRaw(docs: DataFrame, pieces: Map[String, Double] = DefaultRawPieces,
                maxPieceLen: Int = 24, byteCost: Double = 16.0): DataFrame = {
    val enc = org.apache.spark.sql.GraftExpr.column(
      graft.functions.UnigramSegRaw(
        org.apache.spark.sql.GraftExpr.expression(col("text")),
        pieces, maxPieceLen, byteCost))
    docs
      .withColumn("__enc__", enc)
      .select(col("doc_id"), col("__enc__.n_pieces").as("n_pieces"),
        col("__enc__.pieces").as("pieces"))
  }

  /** Raw byte-fallback token COUNT as a single column expression — the
    * budget/packing tokenizer option ([[Curation]]'s "unigram_raw"). */
  def rawTokenCount(text: Column,
                    pieces: Map[String, Double] = DefaultRawPieces): Column =
    org.apache.spark.sql.GraftExpr.column(
      graft.functions.UnigramSegRaw(
        org.apache.spark.sql.GraftExpr.expression(text),
        pieces, 24, 16.0)).getField("n_pieces")

  /** The pre-native expression-tree encoder (per-row memoized HOF fold) —
    * kept as the independent formulation the spec A/Bs the native
    * expression against. */
  private[graft] def encodeHof(docs: DataFrame, pieces: Map[String, Double],
                             maxPieceLen: Int = 24): DataFrame =
    docs
      .withColumn("__toks__", Dedup.tokens(col("text")))
      .withColumn("__memo__",
        map_from_entries(transform(array_distinct(col("__toks__")),
          w => struct(w, segmentStruct(w, pieces, maxPieceLen)))))
      .select(col("doc_id"),
        aggregate(col("__toks__"), lit(0L),
          (a, w) => a + coalesce(element_at(col("__memo__"), w)("np"), lit(1))
            .cast(LongType)).as("n_pieces"),
        array_join(transform(col("__toks__"),
          w => coalesce(element_at(col("__memo__"), w)("path"), lit("<unk>"))),
          " ").as("segmented"))

  /** Hard-EM unigram trainer. Returns (piece, count, logp) — `count` the
    * corpus frequency along best segmentations at the final iteration,
    * `logp` the round-6 log-probability. Deterministic: seeds and prunes
    * break ties by (count desc, piece asc); costs are exact driver
    * doubles fed back through the same DP expression each round. */
  def train(docs: DataFrame, vocabSize: Int = 64, iters: Int = 3,
            maxPieceLen: Int = 8, seedSize: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words.cache()
    // seed: every substring of length 1..maxPieceLen, frequency-weighted;
    // the explode fan-out is |word|·maxPieceLen per DISTINCT word — a
    // vocabulary-shaped frame, not the corpus
    val subs = words.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), length(col("w"))), i =>
        transform(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - i + 1)), l =>
          col("w").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val multiSeeds = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
      .as[(String, Long)].collect()
    val charCnt = subs.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toMap
    var table: Seq[(String, Long)] =
      Chars.map(c => c -> charCnt.getOrElse(c, 1L)) ++ multiSeeds
    var counts: Map[String, Long] = Map.empty
    for (_ <- 0 until iters) {
      val total = table.map(_._2).sum.toDouble
      val costs = table.map { case (p, c) => p -> -math.log(c / total) }.toMap
      val segged = words.select(col("freq"),
        segmentStruct(col("w"), costs, maxPieceLen)("path").as("path"))
      counts = segged
        .select(col("freq"), explode(split(col("path"), " ")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .as[(String, Long)].collect().toMap
      // prune to budget: all chars survive (totality), best multis by
      // observed count (pieces the Viterbi never uses drop out)
      val keepMulti = counts.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - Chars.size))
      table = Chars.map(c => c -> counts.getOrElse(c, 0L).max(1L)) ++ keepMulti
    }
    val total = table.map(_._2).sum.toDouble
    table.map { case (p, c) => (p, c, math.floor(math.log(c / total) * 1e6) / 1e6) }
      .toDF("piece", "count", "logp")
      .orderBy(col("count").desc, col("piece").asc)
  }

  /** Hard-EM trainer over the RAW alphabet — [[train]]'s byte-fallback
    * sibling, completing the lossless path: the vocab it fits feeds
    * [[encodeRaw]] directly, so train → encode → decode round-trips the
    * raw corpus byte-for-byte while case/punctuation/UTF-8 substrings can
    * BECOME pieces ("Don't", "C++", "—" are learnable here and
    * unrepresentable in [[train]]'s [a-z0-9]+ world).
    *
    * Differences from [[train]], all forced by the raw alphabet:
    *  - the word frame is the DISTINCT `\S+` runs (case preserved;
    *    whitespace runs are excluded from fitting — they would dominate
    *    every count table — and ride byte fallback at encode time);
    *  - totality comes from the BYTE FALLBACK, not a forced char set:
    *    single characters compete for vocab slots like any piece, and an
    *    unobserved char is simply priced at byteCost per byte;
    *  - E-steps segment with the SAME fallback-aware DP the encoder runs
    *    ([[graft.functions.UnigramSegRaw]]), so training optimizes
    *    exactly the encoding it ships; byte pieces emitted by fallback
    *    are excluded from the vocab counts (they are implicit).
    *
    * Same bounded-model shape as [[train]]: every collect is capped by
    * seedSize/vocabSize knobs; the corpus is never collected. */
  def trainRaw(docs: DataFrame, vocabSize: Int = 64, iters: Int = 3,
               maxPieceLen: Int = 8, seedSize: Int = 256,
               byteCost: Double = 16.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words.cache()
    val subs = words.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), length(col("w"))), i =>
        transform(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - i + 1)), l =>
          col("w").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    var table: Seq[(String, Long)] = subs
      .filter(!col("piece").rlike("^<0x[0-9A-F]{2}>$")) // decode ambiguity guard
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize + vocabSize)
      .as[(String, Long)].collect().toSeq
    for (_ <- 0 until iters) {
      val total = table.map(_._2).sum.toDouble
      val costs = table.map { case (p, c) => p -> -math.log(c / total) }.toMap
      val enc = org.apache.spark.sql.GraftExpr.column(
        graft.functions.UnigramSegRaw(
          org.apache.spark.sql.GraftExpr.expression(col("w")),
          costs, maxPieceLen, byteCost))
      val counts = words
        .select(col("freq"), explode(enc.getField("pieces")).as("piece"))
        .filter(!col("piece").rlike("^<0x[0-9A-F]{2}>$")) // fallback is implicit
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .as[(String, Long)].collect().toMap
      table = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    }
    words.unpersist()
    val total = table.map(_._2).sum.toDouble
    table.map { case (p, c) => (p, c, math.floor(math.log(c / total) * 1e6) / 1e6) }
      .toDF("piece", "count", "logp")
      .orderBy(col("count").desc, col("piece").asc)
  }
}
