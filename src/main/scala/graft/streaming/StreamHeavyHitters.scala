package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a Misra–Gries summary over the token stream,
  * maintained with `flatMapGroupsWithState` — the continuous counterpart
  * of the CMS frequency sketch ([[graft.llm.Sketches]]) when the question
  * is "which tokens are frequent" rather than "how frequent is this
  * token", and the stream is unbounded so exact counting state would grow
  * with the vocabulary.
  *
  * State design for scale: the vocabulary is hash-partitioned into
  * `nShards` substreams (a token lives in exactly ONE shard, so shards
  * never split a token's count), and each shard holds at most `k`
  * (token, count) entries — TOTAL state is nShards·k entries regardless
  * of stream length or vocabulary size, the whole point of the sketch.
  * Each micro-batch is pre-counted exactly (an in-memory map bounded by
  * the batch's shard vocabulary), then folded into the state with the
  * mergeable-summaries rule (Agarwal et al., PODS 2012): add counts by
  * token; while more than `k` survive, subtract the (k+1)-th largest
  * count from every entry and drop the non-positive ones. The classic
  * Misra–Gries guarantee carries through merges: for every token,
  *
  *   true_shard_count − k_summary_count ≤ N_shard / (k + 1)
  *
  * (estimates never exceed truth), so any token with frequency above
  * N_shard/(k+1) is guaranteed present — pinned by StreamingSpec against
  * exact whole-stream counts.
  *
  * Emission: after each micro-batch every updated shard emits its full
  * summary (≤ k rows) tagged with a per-shard update sequence number, so
  * a consumer (or the spec) takes the max-`seq` rows per shard for the
  * current state — the memory/append sinks then never need the state
  * store's internals.
  */
object StreamHeavyHitters {

  // public: Catalyst's generated (de)serializers need member access
  final case class Tok(shard: Int, token: String)
  final case class HeavyRow(shard: Int, seq: Long, token: String, cnt: Long)
  final case class MgState(seq: Long, entries: List[(String, Long)])

  /** Misra–Gries merge: combined counts trimmed back to ≤ k entries. */
  private[streaming] def mgMerge(entries: List[(String, Long)],
                                 batch: Map[String, Long],
                                 k: Int): List[(String, Long)] = {
    val merged = (entries ++ batch.toList)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toList
    if (merged.size <= k) merged
    else {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0 —
      // ties on the boundary value all drop, which can only shrink below k
      val v = merged.map(_._2).sorted(Ordering[Long].reverse)(k)
      merged.map { case (t, c) => (t, c - v) }.filter(_._2 > 0)
    }
  }

  /** `docs` must be a streaming DataFrame with a `text` (string) column.
    * Emits each updated shard's full ≤ k-entry summary per micro-batch,
    * tagged with the shard's update sequence number.
    *
    * THROUGHPUT KNOB: each shard's entire micro-batch token stream funnels
    * through ONE `flatMapGroupsWithState` task (the exact per-batch
    * pre-count is built inside the group iterator), so per-trigger
    * throughput is capped at `nShards` parallel tasks — nShards must
    * scale with stream volume, not stay a constant. The default therefore
    * follows the cluster (`defaultParallelism`), trading state bound
    * (still nShards·k entries, linear in cores) for full-width triggers;
    * callers with tiny streams can pin it lower. The MG guarantee is
    * per-shard and UNAFFECTED by the shard count (a token lives in
    * exactly one shard at any nShards; StreamingSpec pins the laws at
    * both 4 and 16). */
  def streaming(spark: SparkSession, docs: DataFrame, k: Int,
                nShards: Int = -1): Dataset[HeavyRow] = {
    import spark.implicits._
    val shards =
      if (nShards > 0) nShards else spark.sparkContext.defaultParallelism
    docs
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .select(pmod(xxhash64(col("token")), lit(shards)).cast("int")
        .as("shard"), col("token"))
      .as[Tok]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[MgState, HeavyRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[Tok], state: GroupState[MgState]) =>
          // exact per-batch counts: bounded by this batch's shard vocab
          val batch = scala.collection.mutable.Map.empty[String, Long]
          rows.foreach(t => batch.update(t.token, batch.getOrElse(t.token, 0L) + 1L))
          val prev = state.getOption.getOrElse(MgState(0L, Nil))
          val next = MgState(prev.seq + 1L,
            mgMerge(prev.entries, batch.toMap, k))
          state.update(next)
          next.entries.sortBy { case (t, c) => (-c, t) }
            .iterator.map { case (t, c) => HeavyRow(shard, next.seq, t, c) }
      }
  }
}
