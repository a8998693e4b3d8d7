package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the event stream (session ends after
  * `gapSeconds` of inactivity per user).
  *
  * - [[batch]]: one window pass per user — `lag` marks session starts,
  *   a running sum numbers them, a groupBy aggregates. The standard
  *   distributed shape (shuffle key = user_id).
  * - [[streaming]]: the same semantics as a stateful stream via
  *   `flatMapGroupsWithState` — per-user open-session state, sessions
  *   emitted when the gap closes them. This is the custom-state Structured
  *   Streaming path (KeyValueGroupedDataset) for continuous ingest.
  */
object Sessionize {

  final case class SessionRow(user_id: Long, session_start: Double, n_events: Long, sum_value: Double)
  // public: Catalyst's generated (de)serializers need member access
  final case class Ev(user_id: Long, ts: Double, value: Double)
  final case class OpenSession(start: Double, lastTs: Double, n: Long, sum: Double)

  def batch(events: DataFrame, gapSeconds: Double): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("new_session",
        when(col("ts") - lag("ts", 1).over(byUser) > gapSeconds, 1).otherwise(0))
      .withColumn("session_no", sum("new_session")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select("user_id", "session_start", "n_events", "sum_value")
  }

  def streaming(spark: SparkSession, events: DataFrame, gapSeconds: Double): Dataset[SessionRow] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[List[OpenSession]]) =>
          // within one micro-batch rows may arrive unsorted: sort by ts
          val sorted = rows.toSeq.sortBy(_.ts)
          var open = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ListBuffer[SessionRow]()
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts - s.lastTs <= gapSeconds =>
                open = Some(s.copy(lastTs = e.ts, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                closed += SessionRow(user, s.start, s.n, math.rint(s.sum * 100) / 100)
                open = Some(OpenSession(e.ts, e.ts, 1, e.value))
              case None =>
                open = Some(OpenSession(e.ts, e.ts, 1, e.value))
            }
          }
          // emit the still-open session too when the input is finite
          // (AvailableNow batch-parity); a production stream would hold it
          // in state and use an event-time timeout instead.
          val tail = open.map(s => SessionRow(user, s.start, s.n, math.rint(s.sum * 100) / 100))
          state.update(open.toList)
          (closed ++ tail).iterator
      }
  }
}
