package graft

import graft.operators.Cohort

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private val W = 604800.0

  private def ev(rows: (Long, Double, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("retention: first-touch cohorts, offset-0 completeness, rates") {
    val events = ev(
      // cohort week 0: users 1,2 sign up; user 1 active weeks 0,1,3;
      // user 2 active week 0 only
      (1L, 0.0, "signup"), (1L, W + 1.0, "click"), (1L, 3 * W + 1.0, "view"),
      (2L, 10.0, "signup"),
      // cohort week 1: user 3, active weeks 1,2
      (3L, W + 5.0, "signup"), (3L, 2 * W + 5.0, "purchase"),
      // user 4 never signs up -> in no cohort, even though active
      (4L, 0.0, "click"))
    val out = Cohort.retention(events, "signup", maxOffset = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((0L, 0)) == ((2L, 2L, 1.0)))       // both cohort-0 users week 0
    assert(out((0L, 1)) == ((2L, 1L, 0.5)))       // only user 1 in week 1
    assert(out((0L, 3)) == ((2L, 1L, 0.5)))
    assert(!out.contains((0L, 2)))                // nobody active week 2
    assert(out((1L, 0)) == ((1L, 1L, 1.0)))
    assert(out((1L, 1)) == ((1L, 1L, 1.0)))
    assert(out.keys.forall { case (_, off) => off >= 0 && off <= 8 })
  }

  test("retention: signup after earlier activity — cohort is the SIGNUP week") {
    // user clicks in week 0, signs up in week 2: cohort week 2, and the
    // week-0 click is pre-cohort activity (negative offset, excluded)
    val events = ev(
      (1L, 0.0, "click"), (1L, 2 * W + 1.0, "signup"), (1L, 3 * W + 1.0, "view"))
    val out = Cohort.retention(events, "signup")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((2L, 0), (2L, 1)))
  }

  test("transitions: adjacency counts, __end__ sink, probabilities sum to 1") {
    val events = ev(
      (1L, 0.0, "view"), (1L, 1.0, "click"), (1L, 2.0, "purchase"),
      (2L, 0.0, "view"), (2L, 1.0, "click"), (2L, 2.0, "click"))
    val rows = Cohort.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(("view", "click")) == ((2L, 1.0)))
    assert(rows(("click", "purchase")) == ((1L, 0.333333)))
    assert(rows(("click", "click")) == ((1L, 0.333333)))
    assert(rows(("click", "__end__")) == ((1L, 0.333333)))
    assert(rows(("purchase", "__end__")) == ((1L, 1.0)))
    // every from_type's outgoing count equals its event count
    val out = rows.toSeq.groupBy(_._1._1)
      .map { case (f, xs) => f -> xs.map(_._2._1).sum }
    assert(out == Map("view" -> 2L, "click" -> 3L, "purchase" -> 1L))
  }
}
