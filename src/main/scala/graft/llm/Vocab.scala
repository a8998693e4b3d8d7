package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Corpus vocabulary construction — the counting pass every tokenizer /
  * embedding-table build starts from (word2vec, fastText, and the
  * candidate-alphabet step ahead of BPE training in [[Bpe.learnMerges]]).
  *
  * Scale shape: ONE corpus scan into a map-side-combinable groupBy on the
  * token — the combiner collapses each partition to its distinct tokens
  * before the shuffle, so the exchanged rows are per-partition vocabulary
  * sizes, not corpus token counts. The `minCount` filter then cuts the
  * long Zipf tail (at web scale most distinct tokens are hapax junk).
  *
  * Ranking is the part that must NOT be a global sort: at the default
  * `minCount=2` a web-scale corpus still leaves 10⁸–10⁹ surviving tokens,
  * and a `row_number() OVER (ORDER BY cnt DESC, token)` with no partition
  * is a single-task sort of the whole vocabulary. Instead, the banded
  * two-phase rank (the [[Curation.mixByBudget]] / [[Curation.packSequences]]
  * shape): band each token by `(cnt, prefix)` where prefix = the token's
  * first `prefixLen` characters — lexicographic order on the full token
  * refines order on any prefix, so `(cnt DESC, prefix ASC)` is a prefix of
  * the global `(cnt DESC, token ASC)` order and equal-key tokens always
  * share a band. Phase 1 aggregates band sizes (map-side combinable);
  * phase 2 prefix-sums them over the band-aggregate frame (tiny rows —
  * distinct (cnt, prefix) pairs, not tokens; the one remaining global
  * window, the packSequences precedent); phase 3 ranks WITHIN each band
  * (`partitionBy(cnt, prefix)`) and adds the band base. Result is
  * row-for-row identical to the global rank, with the largest single
  * window partition cut from |vocab| to |one (cnt, prefix) band| —
  * 36^prefixLen-way split of even the hottest cnt=minCount band. */
object Vocab {

  /** (token, cnt, rank): distinct corpus tokens with `cnt >= minCount`,
    * rank 1-based by (cnt desc, token asc) — the id assignment order
    * every frequency-sorted vocab file uses. Tokenization is the
    * [[TextAnalysis]] convention (`[a-z0-9]+` over lowercased text). */
  def buildVocab(docs: DataFrame, minCount: Long = 2,
                 prefixLen: Int = 2): DataFrame = {
    val counts = docs
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .groupBy("token").agg(count(lit(1)).cast(LongType).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("pfx", substring(col("token"), 1, prefixLen))
    // Band bases: tokens in strictly-earlier bands. The window runs over
    // the (cnt, pfx) aggregate — distinct band keys, not tokens.
    val baseW = Window.orderBy(col("cnt").desc, col("pfx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts.groupBy("cnt", "pfx")
      .agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum("n").over(baseW), lit(0L)))
      .select("cnt", "pfx", "base")
    counts.join(bases, Seq("cnt", "pfx"))
      .withColumn("rank", (col("base") + row_number().over(
        Window.partitionBy("cnt", "pfx").orderBy(col("token").asc)))
        .cast(IntegerType))
      .select("token", "cnt", "rank")
  }
}
