package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting. Pure column expressions
  * (whole-stage codegen), deterministic, engine-portable (md5 hashing only).
  */
object TextAnalysis {

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "del", "las", "que", "por"))

  private def toks: Column = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

  private def hits(lang: String): Column =
    size(filter(col("tk"), t => array_contains(lit(Stopwords(lang).toArray), t)))

  /** Stopword-hit language ID with a deterministic argmax tie-break
    * (en > de > fr > es). */
  def languageId(docs: DataFrame): DataFrame =
    docs.withColumn("tk", toks)
      .withColumn("en_hits", hits("en")).withColumn("de_hits", hits("de"))
      .withColumn("fr_hits", hits("fr")).withColumn("es_hits", hits("es"))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
          .when(col("fr_hits") >= col("es_hits"), "fr")
          .otherwise("es"))
      .select("doc_id", "pred_lang", "en_hits", "de_hits", "fr_hits", "es_hits")

  /** Length / punctuation / stopword-ratio quality score. */
  def quality(docs: DataFrame): DataFrame = {
    val allStops = Stopwords.values.flatten.toArray.distinct.sorted
    docs.withColumn("tk", toks)
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_words", size(col("tk")).cast(LongType))
      .withColumn("n_punct", size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).cast(LongType))
      .withColumn("n_stop",
        size(filter(col("tk"), t => array_contains(lit(allStops), t))).cast(LongType))
      .withColumn("punct_ratio",
        when(col("n_chars") === 0, 0.0)
          .otherwise(round(col("n_punct").cast(DoubleType) / col("n_chars").cast(DoubleType), 6)))
      .withColumn("stop_ratio",
        when(col("n_words") === 0, 0.0)
          .otherwise(round(col("n_stop").cast(DoubleType) / col("n_words").cast(DoubleType), 6)))
      .withColumn("quality_score",
        round(least(col("n_words").cast(DoubleType) / 100.0, lit(1.0)) * 0.5 +
          col("stop_ratio") * 0.3 + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
      .select("doc_id", "n_chars", "n_words", "n_punct", "n_stop",
        "punct_ratio", "stop_ratio", "quality_score")
  }

  /** Whitespace tokens + BPE-ish segment counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)")).cast(LongType).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]', 0)"))
        .cast(LongType).as("bpe_tokens"))

  /** Winnowing fingerprints: md5-hashed character 8-grams, sliding window of
    * 4, distinct window minima (Schleimer et al., SIGMOD'03 scheme). One row
    * per (doc_id, fingerprint hash). Hashing + windowing run in the native
    * single-pass [[graft.functions.Winnow]] expression (bit-identical to the
    * HOF/DuckDB formulation, without ~2N interpreted lambdas per doc). */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.Winnow.register(docs.sparkSession)
    docs
      .withColumn("fp", explode(expr("graft_winnow(lower(text))")))
      .select("doc_id", "fp")
  }
}
