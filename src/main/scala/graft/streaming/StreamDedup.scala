package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: first-seen filter on normalized content
  * hash, as a stateful Structured Streaming operator — the continuous-ingest
  * counterpart of [[graft.llm.Dedup.exact]] for a crawl that arrives as a
  * stream rather than a snapshot.
  *
  * State design for scale: the per-key state is a single boolean ("seen"),
  * so the state store grows with DISTINCT content hashes only — the minimum
  * any exact-dedup can hold — and is hash-partitioned across executors by
  * the same key the batch operator shuffles on. For unbounded crawls, pass
  * `ttl` to age out hashes not seen for that long (trades storage for
  * accepting re-crawled content after the window; Prometheus of choices for
  * a real pipeline: bounded state beats unbounded growth).
  *
  * Within one micro-batch the keeper is the smallest doc_id of the group —
  * the same deterministic keep-first rule as the batch operator, so a
  * one-batch stream reproduces `Dedup.exact`'s keeper set exactly (proven
  * by StreamingSpec).
  */
object StreamDedup {

  // public: Catalyst's generated (de)serializers need member access
  final case class DocKey(doc_id: Long, h: String)
  final case class Kept(doc_id: Long, h: String)

  /** `docs` must be a streaming DataFrame with `doc_id` (long) and `text`
    * (string) columns. Emits one row per first-seen normalized text. */
  def streaming(spark: SparkSession, docs: DataFrame,
                ttl: Option[String] = None): Dataset[Kept] = {
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.select(col("doc_id"),
        md5(lower(trim(col("text"))).cast("binary")).as("h"))
      .as[DocKey]
      .groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, Kept](OutputMode.Append(), timeout) {
        (h: String, rows: Iterator[DocKey], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // TTL expiry tick: no rows, drop the key
            state.remove()
            Iterator.empty
          } else {
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(Kept(rows.map(_.doc_id).min, h))
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            out
          }
      }
  }
}
