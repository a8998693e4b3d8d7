package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Cohort.transitions]]: per-user
  * next-event adjacency PAIRS as a stateful stream.
  *
  * State per user = the last seen event (one row — constant state per
  * key, the cheapest stateful shape there is); each micro-batch sorts its
  * slice by ts, emits a (from → to) pair per adjacency INCLUDING the one
  * that crosses the batch boundary (previous batch's last event → this
  * batch's first), and leaves the new last event in state. Counts and
  * probabilities are then an ordinary streaming aggregation (or a batch
  * query over the sink), so this stage stays Append-mode pure.
  *
  * Batch parity (StreamingSpec): the streamed pair counts equal the
  * batch matrix minus its `__end__` rows — the sink row is inherently a
  * batch-view concept (a live stream never knows an event was a user's
  * last; a production job would emit it on an event-time timeout).
  *
  * Late data: an event whose ts is OLDER than the state's last-seen ts
  * (cross-batch out-of-order delivery) is DROPPED, not emitted — stitching
  * it in would emit the adjacency in the wrong direction and silently
  * corrupt the matrix. This matches a watermark-style contract: within a
  * micro-batch order is repaired by the sort; across batches the source
  * must be no-later-than-last-seen per user, or the late event is lost
  * (the batch operator, which sees all data at once, is the ground truth).
  */
object StreamTransitions {

  final case class Pair(user_id: Long, from_type: String, to_type: String)
  // public: Catalyst's generated (de)serializers need member access
  final case class Ev(user_id: Long, ts: Double, event_type: String)
  final case class LastEv(ts: Double, event_type: String)

  def pairs(spark: SparkSession, events: DataFrame): Dataset[Pair] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Pair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[LastEv]) =>
          // within one micro-batch rows may arrive unsorted: sort by ts;
          // events OLDER than the stored state's ts are late cross-batch
          // arrivals — drop them (see scaladoc) instead of emitting a
          // wrong-direction adjacency
          var prev = state.getOption
          val sorted = rows.toSeq.sortBy(_.ts)
            .dropWhile(e => prev.exists(_.ts > e.ts))
          val out = scala.collection.mutable.ListBuffer[Pair]()
          sorted.foreach { e =>
            prev.foreach(p => out += Pair(user, p.event_type, e.event_type))
            prev = Some(LastEv(e.ts, e.event_type))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
