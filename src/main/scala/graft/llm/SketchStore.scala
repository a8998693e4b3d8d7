package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent corpus-statistics store — the [[Sketches]] quartet as a
  * rolling-crawl lifecycle ([[DedupIndex]] / [[CentroidStore]] are the
  * dedup/model siblings): build once, then fold every new crawl batch into
  * the SAME fixed-size summaries, so corpus-wide cardinality, frequency and
  * length-distribution questions stay answerable without ever rescanning
  * the corpus. Because every sketch merge is exact (register max, cell sum,
  * bin sum — the laws SketchSpec pins), a store maintained incrementally is
  * BIT-IDENTICAL to one built from the whole corpus in one pass: the gate
  * key runs build(half)+append(rest) against the whole-corpus SQL replica.
  *
  * Layout under `dir` (all parquet, one small file each — these are
  * model-sized frames, bounded by register/cell/bin counts, not corpus
  * size):
  *   - `hll.parquet`   (group, idx, mreg)  ≤ 1024·|groups| rows
  *   - `cms.parquet`   (j, c, cnt)         ≤ d·w rows
  *   - `qbins.parquet` (group, bin, cnt)   ≤ ~90·digits·|groups| rows
  *
  * Append is read-merge-overwrite: the merged frame is eagerly
  * local-checkpointed BEFORE the overwrite so the write never depends on
  * the files it replaces (the [[SubstrIndex]] lineage lesson) — legitimate
  * here precisely because the frames are bounded; the corpus-sized side of
  * the merge (the batch) is only ever scanned, never stored.
  *
  * NO removal API, by design — unlike its tombstoning siblings
  * ([[DedupIndex.remove]], [[SubstrIndex.remove]],
  * [[CentroidStore.remove]], [[SearchIndex.remove]], [[AnnIndex.remove]]):
  * HLL registers are a MAX over hashed ranks and max is not invertible —
  * a departed doc's contribution to a register cannot be subtracted
  * because the register does not know whether a surviving doc produced
  * the same rank (CMS cell sums could be subtracted, quantile bins too,
  * but serving a mixed store where one sketch forgets and the others
  * cannot would misreport). Retention for sketches is therefore REBUILD:
  * re-run [[build]] over the surviving corpus — a single pass producing
  * the same bounded frames, scheduled at vacuum cadence. */
object SketchStore {

  /** Sketch `docs` and write a fresh store. `groupCol` keys the HLL and
    * quantile sketches; `valueCol` (non-negative integer) feeds the
    * quantile bins. */
  def build(docs: DataFrame, dir: String, groupCol: String = "lang",
            valueCol: String = "n_chars", d: Int = 4, w: Int = 1024): Unit = {
    write(Sketches.hllRegisters(docs, groupCol), s"$dir/hll.parquet")
    write(Sketches.cmsCounters(docs, d, w), s"$dir/cms.parquet")
    write(Sketches.quantileBins(docs, valueCol, groupCol), s"$dir/qbins.parquet")
  }

  /** Fold a new batch into the store: register max / cell sum / bin sum.
    * Cost is one batch scan per sketch plus three bounded merges — the
    * store is tiny and the batch is never stored. */
  def append(docs: DataFrame, dir: String, groupCol: String = "lang",
             valueCol: String = "n_chars", d: Int = 4, w: Int = 1024): Unit = {
    val spark = docs.sparkSession
    val hllMerged = Sketches.hllMerge(
      spark.read.parquet(s"$dir/hll.parquet"),
      Sketches.hllRegisters(docs, groupCol), groupCol)
    val cmsMerged = spark.read.parquet(s"$dir/cms.parquet")
      .unionByName(Sketches.cmsCounters(docs, d, w))
      .groupBy("j", "c").agg(sum("cnt").as("cnt"))
    val qbinsMerged = spark.read.parquet(s"$dir/qbins.parquet")
      .unionByName(Sketches.quantileBins(docs, valueCol, groupCol))
      .groupBy(col(groupCol), col("bin")).agg(sum("cnt").as("cnt"))
    // sever lineage from the store files before overwriting them
    write(hllMerged.localCheckpoint(true), s"$dir/hll.parquet")
    write(cmsMerged.localCheckpoint(true), s"$dir/cms.parquet")
    write(qbinsMerged.localCheckpoint(true), s"$dir/qbins.parquet")
  }

  /** Per-group distinct-count estimates from the stored registers. */
  def hllEstimates(spark: SparkSession, dir: String,
                   groupCol: String = "lang"): DataFrame =
    Sketches.hllEstimateFromRegisters(
      spark.read.parquet(s"$dir/hll.parquet"), groupCol)

  /** Per-group quantile estimates from the stored bins. */
  def quantiles(spark: SparkSession, dir: String, groupCol: String = "lang",
                qs: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    Sketches.quantileEstimates(
      spark.read.parquet(s"$dir/qbins.parquet"), groupCol, qs)

  /** Count-min estimates for a probe frame with a `token` column: min over
    * the d salted cells — counters broadcast, probe streams. */
  def freqLookup(spark: SparkSession, dir: String, probe: DataFrame,
                 d: Int = 4, w: Int = 1024): DataFrame = {
    val counters = spark.read.parquet(s"$dir/cms.parquet")
    probe.select(col("token")).distinct()
      .select(col("token"), explode(array((0 until d).map(lit): _*)).as("j"))
      .select(col("token"), col("j"),
        Sketches.cmsCell(col("j"), col("token"), w).as("c"))
      .join(broadcast(counters), Seq("j", "c"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  private def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)
}
