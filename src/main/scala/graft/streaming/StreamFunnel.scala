package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-touch conversion funnel — the continuous twin of
  * [[graft.operators.Funnel.firstTouch]] for live dashboards ("how many
  * signups reached purchase in the last hour's trigger") without
  * re-scanning the event log per refresh.
  *
  * Semantics equivalence: the batch op computes t1 = min step-1 time,
  * then t_{k+1} = min step-(k+1) time strictly after t_k and within
  * `window` of t1 — chained mins. Over an IN-ORDER per-user stream the
  * greedy state machine computes exactly those mins: the first
  * qualifying event for the next step IS the min of all qualifying
  * events (everything later is larger). StreamingSpec pins final
  * streamed rows ≡ the batch funnel over the same events, row for row.
  *
  * State per user: the matched-timestamp prefix (≤ |steps| doubles) +
  * the last event time seen — BOUNDED by funnel depth, not event count.
  * Like [[StreamTransitions]], events older than the user's last seen
  * time are DROPPED (out-of-order input cannot silently rewrite a
  * first-touch time that earlier triggers already published); within a
  * micro-batch, rows are sorted by ts before folding, so intra-batch
  * disorder is absorbed.
  *
  * Emission: each updated user emits one row per trigger tagged with an
  * update seq — consumers read current funnel rows as max-seq per user
  * (the [[StreamHeavyHitters]] convention).
  */
object StreamFunnel {

  // public: Catalyst's generated (de)serializers need member access
  final case class Ev(user_id: Long, ts: Double, event_type: String)
  final case class FunState(seq: Long, lastTs: Double, matched: List[Double])
  final case class FunRow(user_id: Long, seq: Long, steps_reached: Int,
                          converted: Boolean, matched: Seq[Double])

  /** `events` must be a streaming frame with (user_id, ts, event_type). */
  def streaming(spark: SparkSession, events: DataFrame, steps: Seq[String],
                window: Double): Dataset[FunRow] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import spark.implicits._
    val stepArr = steps.toArray
    val k = stepArr.length
    events.select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type").isin(steps.map(s => s: Any): _*))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunState, FunRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FunState]) =>
          val prev = state.getOption
            .getOrElse(FunState(0L, Double.NegativeInfinity, Nil))
          var lastTs = prev.lastTs
          var matched = prev.matched // reversed-order prefix (head = latest)
          // absorb intra-batch disorder; drop cross-batch late events
          rows.toSeq.sortBy(e => (e.ts, e.event_type)).foreach { e =>
            if (e.ts >= lastTs) {
              lastTs = e.ts
              val n = matched.length
              if (n == 0) {
                if (e.event_type == stepArr(0)) matched = e.ts :: Nil
              } else if (n < k && e.event_type == stepArr(n) &&
                e.ts > matched.head && e.ts <= matched.last + window) {
                matched = e.ts :: matched
              }
            }
          }
          val next = FunState(prev.seq + 1L, lastTs, matched)
          state.update(next)
          if (matched.isEmpty) Iterator.empty
          else Iterator.single(FunRow(user, next.seq, matched.length,
            matched.length == k, matched.reverse))
      }
  }
}
