package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weekly-cohort retention — the continuous twin of
  * [[graft.operators.Cohort.retention]]: live "day-N retention" tiles
  * without re-scanning the event log per refresh.
  *
  * Semantics equivalence over an in-order per-user stream: the batch
  * matrix counts, per (cohort_week, offset ≤ max), the DISTINCT users
  * with any activity in cohort_week + offset, where a user's cohort is
  * the week of their FIRST `entryType` event. In arrival order that
  * first entry event is the first one seen, and each (user, offset)
  * cell is emitted exactly ONCE — so the streamed emission set equals
  * the batch matrix's user-cell set, and any consumer aggregate of it
  * equals the matrix (StreamingSpec pins the full matrix, sizes and
  * rates included). Same-week activity that precedes the entry event
  * changes nothing: offset 0 is emitted by the entry itself, exactly
  * the batch's offset-0 = cohort-size law.
  *
  * State per user: cohort week + one BIT per emitted offset (a Long
  * mask, maxOffset ≤ 63) + last seen ts — constant-size, the reason
  * this scales to unbounded streams. The [[StreamTransitions]] in-order
  * contract applies: intra-batch disorder is absorbed by a per-group
  * sort, cross-batch late events are dropped.
  */
object StreamRetention {

  // public: Catalyst's generated (de)serializers need member access
  final case class REv(user_id: Long, ts: Double, week: Long,
                       isEntry: Boolean)
  final case class RetState(cohortWeek: Long, mask: Long, lastTs: Double)
  final case class RetRow(user_id: Long, cohort_week: Long, week_offset: Int)

  /** `events` must be a streaming frame with (user_id, ts, event_type).
    * Emits each user's newly-reached (cohort_week, offset) cells. */
  def streaming(spark: SparkSession, events: DataFrame, entryType: String,
                maxOffset: Int = 8): Dataset[RetRow] = {
    require(maxOffset >= 0 && maxOffset <= 63,
      s"maxOffset must be in 0..63 (bitmask state), got $maxOffset")
    import spark.implicits._
    events.select(col("user_id"), col("ts"),
        floor(col("ts") / 604800.0).cast("long").as("week"),
        (col("event_type") === entryType).as("isEntry"))
      .as[REv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[REv], state: GroupState[RetState]) =>
          val prev = state.getOption
            .getOrElse(RetState(-1L, 0L, Double.NegativeInfinity))
          var cohort = prev.cohortWeek
          var mask = prev.mask
          var lastTs = prev.lastTs
          val out = Seq.newBuilder[RetRow]
          // entries first on ts ties, so a same-instant activity row
          // lands after the cohort is set (same cells either way)
          rows.toSeq.sortBy(e => (e.ts, !e.isEntry)).foreach { e =>
            if (e.ts >= lastTs) {
              lastTs = e.ts
              if (cohort < 0L && e.isEntry) cohort = e.week
              if (cohort >= 0L) {
                val off = e.week - cohort
                if (off >= 0L && off <= maxOffset &&
                  (mask & (1L << off)) == 0L) {
                  mask |= 1L << off
                  out += RetRow(user, cohort, off.toInt)
                }
              }
            }
          }
          state.update(RetState(cohort, mask, lastTs))
          out.result().iterator
      }
  }
}
