package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus vocabulary construction — the counting pass every tokenizer /
  * embedding-table build starts from (word2vec, fastText, and the
  * candidate-alphabet step ahead of BPE training in [[Bpe.learnMerges]]).
  *
  * Scale shape: ONE corpus scan into a map-side-combinable groupBy on the
  * token — the combiner collapses each partition to its distinct tokens
  * before the shuffle, so the exchanged rows are per-partition vocabulary
  * sizes, not corpus token counts. The `minCount` filter then cuts the
  * long Zipf tail (at web scale most distinct tokens are hapax junk), and
  * only the SURVIVING vocabulary — model-sized by construction: it is the
  * thing a trainer will hold in memory as an embedding table — pays for
  * the global rank sort. Ranking model-sized output on one task is the
  * [[Ann.lloydCentroids]] model-parameter rule, not a corpus-sized skew:
  * a corpus 100× larger grows the pre-filter aggregate, which combines
  * and shuffles on bounded token keys, not the ranked frame. */
object Vocab {

  /** (token, cnt, rank): distinct corpus tokens with `cnt >= minCount`,
    * rank 1-based by (cnt desc, token asc) — the id assignment order
    * every frequency-sorted vocab file uses. Tokenization is the
    * [[TextAnalysis]] convention (`[a-z0-9]+` over lowercased text). */
  def buildVocab(docs: DataFrame, minCount: Long = 2): DataFrame = {
    val counts = docs
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .groupBy("token").agg(count(lit(1)).cast(LongType).as("cnt"))
      .filter(col("cnt") >= minCount)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
  }
}
