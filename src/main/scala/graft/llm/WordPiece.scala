package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece tokenizer: greedy longest-match-first encoding against a
  * `##`-marked piece vocabulary, and the likelihood-scored merge trainer
  * (Schuster & Nakajima 2012; Wu et al. 2016 §4.1 — BERT's tokenizer).
  * Completes the subword trio: [[Bpe]] replays merge RULES, [[Unigram]]
  * Viterbi-minimizes piece COSTS, WordPiece greedily takes the LONGEST
  * vocab match at each position (no backtracking — a greedy segmentation
  * can use more pieces than the optimal one, which is the documented
  * BERT behavior, pinned by WordPieceSpec).
  *
  * ENCODING is a pure map over rows — one `aggregate` fold per word
  * carrying (pos, np, path, failed); each step probes the piece map for
  * the longest match at `pos` (word-initial pieces bare, continuations
  * `##`-prefixed). A word with any unmatched position becomes the single
  * `[UNK]` piece (the whole-word-UNK contract). Zero shuffle, zero
  * driver involvement, embarrassingly parallel at any corpus size — the
  * [[Bpe.encode]]/[[Unigram.encode]] contract. No floating point
  * anywhere in the encoder, so it is exact in any engine.
  *
  * TRAINING differs from BPE in the argmax alone: instead of the most
  * FREQUENT adjacent pair, WordPiece merges the pair maximizing the
  * likelihood gain `count(ab) / (count(a)·count(b))` — a frequent pair
  * of even-more-frequent parts loses to a rarer pair of rare parts (the
  * "francisco" effect, spec-pinned). The corpus encoding is maintained
  * incrementally exactly like [[Bpe.learnMerges]] (one `replace` map per
  * merge); token counts and pair counts are vocab- and vocab²-bounded
  * model frames with map-side combine, and the argmax runs on the driver
  * with EXACT BigInt cross-multiplication (no double division can flip a
  * tie). Continuation marks survive merging: `t + ##h → th`,
  * `##t + ##h → ##th`.
  */
object WordPiece {

  private val Sep = "\u001f"
  private val Bnd = "\u0002"

  /** Greedy longest-match segmentation state for one word:
    * struct(pos, np, path, failed). `vocab` maps piece strings (bare =
    * word-initial, `##`-prefixed = continuation) to any value; only key
    * presence matters. */
  private[llm] def segmentGreedy(word: Column, vocab: Map[String, Int],
                                 maxPieceLen: Int): Column = {
    val vmap = typedLit(vocab)
    // probe only lengths the vocab actually CONTAINS (word-initial and
    // continuation piece lengths differ — `##` is a marker, not text):
    // a 24-long 1..maxPieceLen scan per position is mostly misses, and
    // each miss is an O(|vocab|) literal-map probe — the length lists cut
    // the inner loop to ~5 entries and made the sf0.1 gate 4× faster
    val startLens = typedLit(vocab.keys.filter(!_.startsWith("##"))
      .map(_.length).filter(_ <= maxPieceLen).toSeq.distinct.sorted)
    val contLens = typedLit(vocab.keys.filter(_.startsWith("##"))
      .map(_.length - 2).filter(l => l >= 1 && l <= maxPieceLen)
      .toSeq.distinct.sorted)
    aggregate(
      sequence(lit(1), length(word)),
      struct(lit(0).as("pos"), lit(0).as("np"), lit("").as("path"),
        lit(false).as("failed")),
      (acc, _) => {
        val lens = filter(
          when(acc("pos") === 0, startLens).otherwise(contLens),
          l => l <= length(word) - acc("pos") && element_at(vmap,
            when(acc("pos") === 0, word.substr(acc("pos") + 1, l))
              .otherwise(concat(lit("##"), word.substr(acc("pos") + 1, l))))
            .isNotNull)
        val ml = array_max(lens)
        val sub = word.substr(acc("pos") + 1, ml)
        val piece = when(acc("pos") === 0, sub)
          .otherwise(concat(lit("##"), sub))
        when(acc("failed") || acc("pos") >= length(word), acc)
          .when(ml.isNull,
            struct(length(word).as("pos"), lit(1).as("np"),
              lit("[UNK]").as("path"), lit(true).as("failed")))
          .otherwise(
            struct((acc("pos") + ml).as("pos"), (acc("np") + 1).as("np"),
              concat(acc("path"),
                when(acc("np") === 0, lit("")).otherwise(lit(" ")),
                piece).as("path"),
              lit(false).as("failed")))
      })
  }

  /** Encode every document: (doc_id, n_pieces, segmented) — `segmented`
    * the space-joined piece stream in word order (`##` marks kept, the
    * BERT display form), words from [[Dedup.tokens]].
    *
    * Runs through the NATIVE expression
    * ([[graft.functions.WordPieceSeg]]): one compiled pass per document
    * with a per-doc distinct-word memo — a zero-shuffle pure map whose
    * per-row cost no longer pays interpreted higher-order-function
    * dispatch per probe (sf0.1 gate: 16.7 s HOF → 3.6 s memoized HOF →
    * ~1 s native). [[segmentGreedy]] remains the expression-tree
    * formulation; WordPieceSpec pins native == HOF on the gate fixture. */
  def encode(docs: DataFrame, vocab: Map[String, Int],
             maxPieceLen: Int = 16): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    val enc = org.apache.spark.sql.GraftExpr.column(
      graft.functions.WordPieceSeg(
        org.apache.spark.sql.GraftExpr.expression(toks),
        vocab.keySet, maxPieceLen))
    docs
      .withColumn("__enc__", enc)
      .select(col("doc_id"), col("__enc__.n_pieces").as("n_pieces"),
        col("__enc__.segmented").as("segmented"))
  }

  /** LOSSLESS greedy MaxMatch over the RAW text with byte fallback —
    * the [[Unigram.encodeRaw]] sibling: alternating `\S+`/`\s+` run
    * pre-tokens, longest vocab match per position, uncovered code points
    * as UTF-8 byte pieces `<0xAB>`. No `##` continuation marking (a
    * display convention a byte-exact decode cannot tolerate — raw pieces
    * may themselves start with `##`). decode(encodeRaw(text).pieces) ==
    * text exactly; the `tokenize_raw_wordpiece` gate pins it. */
  def encodeRaw(docs: DataFrame, vocab: Set[String],
                maxPieceLen: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.GraftExpr.column(
      graft.functions.WordPieceSegRaw(
        org.apache.spark.sql.GraftExpr.expression(col("text")),
        vocab, maxPieceLen))
    docs
      .withColumn("__enc__", enc)
      .select(col("doc_id"), col("__enc__.n_pieces").as("n_pieces"),
        col("__enc__.pieces").as("pieces"))
  }

  /** The pre-native expression-tree encoder (per-row memoized HOF fold) —
    * kept as the independent formulation the spec A/Bs the native
    * expression against. */
  private[graft] def encodeHof(docs: DataFrame, vocab: Map[String, Int],
                             maxPieceLen: Int = 16): DataFrame =
    docs
      .withColumn("__toks__", Dedup.tokens(col("text")))
      .withColumn("__memo__",
        map_from_entries(transform(array_distinct(col("__toks__")),
          w => struct(w, segmentGreedy(w, vocab, maxPieceLen)))))
      .select(col("doc_id"),
        aggregate(col("__toks__"), lit(0L),
          (a, w) => a + element_at(col("__memo__"), w)("np").cast(LongType))
          .as("n_pieces"),
        array_join(transform(col("__toks__"),
          w => element_at(col("__memo__"), w)("path")), " ").as("segmented"))

  /** Char-level seed encoding of one word column: first char bare, the
    * rest `##`-prefixed, Sep-joined. */
  private def seedWord(w: Column): Column =
    when(length(w) === 1, w) // sequence(2,1) would DESCEND — guard 1-char words
      .otherwise(aggregate(sequence(lit(2), length(w)), w.substr(1, 1),
        (acc, i) => concat(acc, lit(Sep + "##"), w.substr(i, lit(1)))))

  /** Learn `nMerges` likelihood-scored merges; returns the final VOCAB as
    * (piece, count) rows — observed tokens of the final encoding, with
    * all 36 single chars and their `##` twins force-included at their
    * observed count (0 if unused) so [[encode]] stays total on the token
    * alphabet. Ordered (count desc, piece asc). Sequential only — the
    * likelihood score has no cheap batch-validity certificate (unlike
    * [[Bpe.learnMerges]]'s count-invariance proof), and vocab training
    * is a bounded number of scans by construction. */
  def train(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = transform(Dedup.tokens(col("text")), w => seedWord(w))
    var enc = docs.select(
      concat(lit(Sep),
        array_join(words, Sep + Bnd + Sep),
        lit(Sep)).as("__e__")).persist()
    enc.count()
    def tokenCounts(): Map[String, Long] =
      enc.select(explode(split(col("__e__"), Sep, -1)).as("t"))
        .filter(col("t") =!= "" && col("t") =!= Bnd)
        .groupBy("t").agg(count(lit(1)).as("c"))
        .as[(String, Long)].collect().toMap
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val toks = tokenCounts()
      // observed adjacent pairs: bounded by |vocab|² (both sides are
      // vocab tokens), a model frame — never corpus-sized
      // adjacent pairs via slice + arrays_zip + post-explode Filter —
      // same multiset as the lambda-HOF spelling but codegen'd built-ins
      // (the [[Bpe]] learnLoop r18 fix; HOFs evaluate interpreted)
      val pairs = enc.select(split(col("__e__"), Sep, -1).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(arrays_zip(
          slice(col("ts"), lit(1), size(col("ts")) - 1).as("lt"),
          slice(col("ts"), lit(2), size(col("ts")) - 1).as("rt"))).as("p"))
        .filter(col("p.lt") =!= "" && col("p.rt") =!= "" &&
          col("p.lt") =!= Bnd && col("p.rt") =!= Bnd)
        .groupBy(col("p.lt").as("lt"), col("p.rt").as("rt"))
        .agg(count(lit(1)).as("cnt"))
        .as[(String, String, Long)].collect()
      if (pairs.isEmpty) done = true
      else {
        // exact rational argmax of cnt/(c(lt)·c(rt)): BigInt
        // cross-multiplication, ties by (lt, rt) ascending
        val best = pairs.reduceLeft { (a, b) =>
          val la = BigInt(a._3) * BigInt(toks(b._1)) * BigInt(toks(b._2))
          val lb = BigInt(b._3) * BigInt(toks(a._1)) * BigInt(toks(a._2))
          if (la > lb) a
          else if (lb > la) b
          else if (Ordering[(String, String)].lteq((a._1, a._2), (b._1, b._2))) a
          else b
        }
        val merged = best._1 + best._2.stripPrefix("##")
        val next = enc.select(
          replace(col("__e__"),
            lit(Sep + best._1 + Sep + best._2 + Sep),
            lit(Sep + merged + Sep)).as("__e__")).persist()
        next.count()
        enc.unpersist()
        enc = next
      }
    }
    val fin = tokenCounts()
    enc.unpersist()
    val alphabet = Unigram.Chars ++ Unigram.Chars.map("##" + _)
    val rows = (fin.keySet ++ alphabet).toSeq
      .map(p => (p, fin.getOrElse(p, 0L)))
      .sortBy { case (p, c) => (-c, p) }
    rows.toDF("piece", "count")
  }
}
