package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CHUNK-level deduplication: content-defined chunks
  * ([[graft.llm.Curation.chunkCdc]]) filtered to first-seen chunk hashes —
  * the continuous-ingest form of chunk-store dedup: a crawl that re-fetches
  * a page whose prefix changed stores ONLY the chunks before the first
  * boundary; everything after re-synchronizes to already-seen hashes and
  * dedups away (the CDC resync law, here doing its actual production job).
  *
  * Composition, not new machinery: the chunker is a pure map (zero-shuffle
  * in-row explode — streaming-compatible by construction), and the
  * first-seen filter is [[StreamDedup]]'s one-boolean-per-key state design,
  * keyed on chunk hash instead of document hash. State grows with DISTINCT
  * CHUNKS — for a near-duplicate-heavy crawl that is far below one key per
  * document version, the whole point of chunking the store. Same `ttl`
  * trade as [[StreamDedup]] for unbounded crawls.
  *
  * Within one micro-batch the keeper is the smallest (doc_id, chunk_idx)
  * of the hash group — deterministic, so a one-batch stream reproduces the
  * batch chunker's distinct-hash keeper set exactly (StreamingSpec).
  */
object StreamChunkDedup {

  // public: Catalyst's generated (de)serializers need member access
  final case class ChunkRow(doc_id: Long, chunk_idx: Long, chunk_hash: String)

  /** `docs` must be a streaming DataFrame with `doc_id` (long) and `text`
    * (string) columns. Emits one row per first-seen chunk hash. */
  def streaming(spark: SparkSession, docs: DataFrame,
                ttl: Option[String] = None): Dataset[ChunkRow] = {
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.llm.Curation.chunkCdc(docs)
      .select("doc_id", "chunk_idx", "chunk_hash")
      .as[ChunkRow]
      .groupByKey(_.chunk_hash)
      .flatMapGroupsWithState[Boolean, ChunkRow](OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[ChunkRow], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // TTL expiry tick: no rows, drop the key
            state.remove()
            Iterator.empty
          } else {
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(rows.minBy(r => (r.doc_id, r.chunk_idx)))
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            out
          }
      }
  }
}
