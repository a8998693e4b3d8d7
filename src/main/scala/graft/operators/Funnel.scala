package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequential-conversion FUNNEL (the product-analytics primitive behind
  * Amplitude/Mixpanel funnels; no reference counterpart — events-table
  * analytics surface).
  *
  * First-touch semantics: a user enters the funnel at their EARLIEST
  * step-1 event (t1); step k+1 matches the earliest qualifying event
  * strictly after step k and within `window` seconds of t1. Greedy
  * earliest-match is the standard first-touch contract and is fully
  * deterministic — no backtracking (a later entry that would have
  * converted when the first did not is a different product question,
  * "any-touch", priced as a re-entry analysis).
  *
  * Shape: one `groupBy(user_id).min` per step, chained through
  * broadcast-or-shuffle equi-joins on user_id — k steps = k bounded
  * aggregates keyed by user, never a per-user sort or window over the
  * event log, so skewed users cost one combiner each, not a partition.
  * Scales to any event volume; the funnel frame itself is one row per
  * entered user.
  */
object Funnel {

  /** One row per user who performed `steps.head`:
    * (user_id, t1..tK, steps_reached, converted, duration) with tk the
    * matched timestamps (null once the chain breaks), duration =
    * round-6 (tK − t1) for converted users. `events` needs
    * (user_id, ts: double, event_type). */
  def firstTouch(events: DataFrame, steps: Seq[String],
                 window: Double): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    val entry = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val chained = steps.zipWithIndex.tail.foldLeft(entry) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val nxt = e.filter(col("event_type") === step)
          .select(col("user_id").as("__u__"), col("ts").as("__ts__"))
        acc.join(nxt,
            col("user_id") === col("__u__") &&
              col("__ts__") > col(prev) &&
              col("__ts__") <= col("t1") + lit(window),
            "left")
          .groupBy(acc.columns.map(col).toIndexedSeq: _*)
          .agg(min(col("__ts__")).as(cur))
    }
    val k = steps.size
    val reached = (2 to k).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, 1).otherwise(0)
    }
    chained
      .withColumn("steps_reached", reached)
      .withColumn("converted", col(s"t$k").isNotNull)
      .withColumn("duration",
        when(col("converted"), round(col(s"t$k") - col("t1"), 6)))
  }
}
