package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent exact-substring dedup index: build once, store, append new
  * batches, score each incoming batch against everything already indexed —
  * the rolling-crawl lifecycle around [[Curation.dedupSubstr]], which
  * re-scans the whole corpus per call (r11 verdict item 5; [[DedupIndex]]
  * is the MinHash sibling and the template).
  *
  * Layout under `dir` (all parquet — readable by any engine):
  *   - `meta.parquet`     one row: (k, parts) — the frozen gram length and
  *                        hash-prefix partition count. Like the MinHash
  *                        scheme, k never changes after build, so stored
  *                        and incoming gram hashes stay comparable.
  *   - `postings.parquet` DISTINCT 60-bit gram hashes `h`, PARTITIONED BY
  *                        `hp = h mod parts`. The index is a gram SET, not
  *                        an occurrence list: the store is older than any
  *                        probe by construction, so "this gram exists in
  *                        the index" already decides first-occurrence — no
  *                        (doc_id, pos) payload needed, which keeps the
  *                        store at 8 bytes per DISTINCT gram (duplicated
  *                        boilerplate collapses at build).
  *
  * Exactness contract (LlmSpec pins it, the gate oracle replays it): for
  * a corpus split into index + batch by doc_id, [[dedupAgainst]] equals
  * [[Curation.dedupSubstr]] over the WHOLE corpus restricted to the batch
  * docs, row for row — a batch position is duplicated iff its gram occurs
  * in the index (any stored occurrence is older) or earlier within the
  * batch (the same groupBy-min rule, batch-scoped).
  *
  * Scale shape of [[dedupAgainst]]: the batch's distinct gram hashes
  * BROADCAST into one scan of the postings store (the [[DedupIndex]]
  * probe shape — the index is never reshuffled); the surviving hit set is
  * batch-sized. For batches whose distinct-gram set outgrows the
  * broadcast budget (~a few GB of text per probe), flip the probe join to
  * a shuffle join on `h` — the store side then prunes to the `hp`
  * partitions the batch actually touches; the store never needs a rebuild
  * for correctness (the gram set only grows), only an occasional compact
  * of small append files — documented cadence, not per-batch work. */
object SubstrIndex {

  /** Build the gram-set store from `docs` and write meta to `dir`. */
  def build(docs: DataFrame, dir: String, k: Int = 15,
            parts: Int = 64): Unit = {
    val spark = docs.sparkSession
    spark.createDataFrame(Seq((k, parts))).toDF("k", "parts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
    Curation.substrGrams(Curation.substrToked(docs), k)
      .select(col("h")).distinct()
      .withColumn("hp", pmod(col("h"), lit(parts.toLong)))
      .repartition(col("hp")) // one file per prefix partition
      .write.mode("overwrite").partitionBy("hp")
      .parquet(s"$dir/postings.parquet")
  }

  /** Add `newDocs`' grams to the store under the FROZEN k: the batch's
    * distinct hashes probe the store once (broadcast side), and only the
    * genuinely novel ones are appended — the store stays duplicate-free
    * without ever reshuffling itself. */
  def append(dir: String, newDocs: DataFrame): Unit = {
    val spark = newDocs.sparkSession
    val (k, parts) = readParams(spark, dir)
    val postings = spark.read.parquet(s"$dir/postings.parquet")
    val newH = Curation.substrGrams(Curation.substrToked(newDocs), k)
      .select(col("h")).distinct()
    val present = postings.join(broadcast(newH), Seq("h"))
      .select("h").distinct()
    newH.join(broadcast(present), Seq("h"), "left_anti")
      .withColumn("hp", pmod(col("h"), lit(parts.toLong)))
      .repartition(col("hp"))
      .write.mode("append").partitionBy("hp")
      .parquet(s"$dir/postings.parquet")
  }

  /** Score `newDocs` against everything indexed plus the batch itself:
    * the (doc_id, n_tok, dup_tok, kept_frac) contract of
    * [[Curation.dedupSubstr]], with the index playing the role of every
    * earlier document. */
  def dedupAgainst(spark: SparkSession, dir: String,
                   newDocs: DataFrame): DataFrame = {
    val (k, _) = readParams(spark, dir)
    val postings = spark.read.parquet(s"$dir/postings.parquet")
    val toked = Curation.substrToked(newDocs)
    val grams = Curation.substrGrams(toked, k)
    val batchH = grams.select(col("h")).distinct()
    // which batch grams the index already holds — result is batch-sized
    val inStore = postings.join(broadcast(batchH), Seq("h"))
      .select("h").distinct()
    val storeHits = grams.join(broadcast(inStore), Seq("h"))
      .select("doc_id", "p")
    // within-batch first-occurrence rule, batch-scoped (the dedupSubstr
    // map-side-combinable groupBy min)
    val firsts = grams.groupBy("h")
      .agg(min(struct(col("doc_id"), col("p"))).as("__first__"))
    val batchHits = grams.join(firsts, Seq("h"))
      .filter(struct(col("doc_id"), col("p")) =!= col("__first__"))
      .select("doc_id", "p")
    Curation.substrCoverage(toked,
      storeHits.union(batchHits).distinct(), k)
  }

  /** Score one batch against the index and itself, drop the mostly-
    * duplicated docs, append the SURVIVORS' grams, return the survivors
    * with their coverage stats — the single rolling-crawl step
    * ([[streamingDedup]] runs it per micro-batch). Drop rule,
    * deterministic: a doc survives iff `kept_frac >= minKeep` under the
    * [[dedupAgainst]] contract (within-batch positions are marked by the
    * order-based first-occurrence rule whether or not the earlier doc
    * itself survives — the whole-corpus [[Curation.dedupSubstr]]
    * semantics); only surviving docs' grams enter the index, so the
    * store holds exactly the retained text ([[DedupIndex.dedupStep]] is
    * the MinHash sibling).
    *
    * The survivor frame is EAGERLY LOCAL-CHECKPOINTED, not persist()ed,
    * before the append: the gram store carries no doc identity, so a
    * post-append re-evaluation of the probe plan would find the
    * survivors' own just-appended grams and return nothing — and Spark
    * DOES re-resolve it: the append's InsertIntoHadoopFsRelation refresh
    * invalidates any cached plan that reads the postings path
    * (observed: a persist()+count() survivor frame came back empty).
    * [[DedupIndex.dedupStep]] tolerates re-evaluation because its probe
    * join is identity-self-excluding (`s.doc_id =!= q.doc_id`); this
    * store has no identity to exclude, so the checkpoint severs the
    * lineage instead — the returned plan is a LogicalRDD with no file
    * dependency at all. */
  def dedupStep(spark: SparkSession, dir: String, batch: DataFrame,
                minKeep: Double = 0.5): DataFrame = {
    // eager: materialized against the PRE-append index snapshot
    val survivors = dedupAgainst(spark, dir, batch)
      .filter(col("kept_frac") >= minKeep)
      .localCheckpoint(true)
    append(dir, batch.join(survivors.select("doc_id"), Seq("doc_id")))
    survivors
  }

  /** Streaming rolling-crawl substring dedup: document micro-batches →
    * [[dedupStep]] via `foreachBatch` — the [[DedupIndex.streamingDedup]]
    * construct and rationale (the operator's state IS the parquet gram
    * store: bigger than any state-store budget, shared with batch
    * callers, restart-safe — resume probes whatever the index holds).
    * Caller starts the returned writer (`.start()` + await). */
  def streamingDedup(stream: DataFrame, dir: String,
                     minKeep: Double = 0.5)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // the step reads the batch several times (grams, coverage, the
      // append's re-derivation) — pin one snapshot
      batch.persist()
      try {
        val survivors = dedupStep(batch.sparkSession, dir, batch, minKeep)
        try sink(survivors) finally { survivors.unpersist(); () }
      } finally { batch.unpersist(); () }
    }

  private def readParams(spark: SparkSession, dir: String): (Int, Int) = {
    val m = spark.read.parquet(s"$dir/meta.parquet").head()
    (m.getAs[Int]("k"), m.getAs[Int]("parts"))
  }
}
