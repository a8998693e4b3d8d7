package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Backward as-of join (sort-merge formulation) over hand-built frames. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
    (4L, "b", 15.0), (5L, "c", 5.0))
    .toDF("id", "k", "ts")
  private val right = Seq(
    ("a", 10.0, 100.0), ("a", 25.0, 200.0),
    ("b", 1.0, 300.0), ("b", 15.0, 400.0))
    .toDF("k", "ts", "v")

  private def run(strict: Boolean = false, tol: Option[Double] = None)
      : Map[Long, Option[Double]] =
    AsofJoin.backward(left, right, Seq("k"), strict = strict, tolerance = tol)
      .select($"id", $"v")
      .as[(Long, Option[Double])].collect().toMap

  test("inclusive: latest right with ts <= left ts, null when none") {
    assert(run() === Map(
      1L -> Some(100.0),  // equal ts matches
      2L -> Some(100.0),  // 25.0 is in the future
      3L -> Some(200.0),
      4L -> Some(400.0),  // equal ts beats the older 1.0 row
      5L -> None))        // key with no right rows at all
  }

  test("strict: equal-ts right row is hidden") {
    assert(run(strict = true)(1L) === None)
    assert(run(strict = true)(4L) === Some(300.0))
    assert(run(strict = true)(3L) === Some(200.0))
  }

  test("tolerance nulls out stale matches but keeps the row") {
    val m = run(tol = Some(6.0))
    assert(m(2L) === None)        // gap 10 > 6
    assert(m(3L) === Some(200.0)) // gap 5 <= 6
    assert(m.size === 5)          // still left-outer: every left row present
  }

  test("prefix renames right payload; left columns survive untouched") {
    val out = AsofJoin.backward(left, right, Seq("k"), prefix = "r_")
    assert(out.columns.toSeq === Seq("id", "k", "ts", "r_v"))
    assert(out.count() === 5)
  }

  test("plan: one exchange on the key, no range-join explosion") {
    val out = AsofJoin.backward(left, right, Seq("k"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // a single hash-partitioning exchange feeds the window
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size === 1)
  }

  test("forward: earliest right with ts >= left ts; strict hides equal ts") {
    val fwd = AsofJoin.forward(left, right, Seq("k"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(fwd === Map(
      1L -> Some(100.0),  // equal ts matches
      2L -> Some(200.0),  // next ahead
      3L -> None,         // nothing in the future
      4L -> Some(400.0),
      5L -> None))
    val strictFwd = AsofJoin.forward(left, right, Seq("k"), strict = true)
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(strictFwd(1L) === Some(200.0) && strictFwd(4L) === None)
    val tolFwd = AsofJoin.forward(left, right, Seq("k"), tolerance = Some(4.0))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(tolFwd(1L) === Some(100.0) && tolFwd(2L) === None)
  }

  test("nearest: closer side wins, ties go backward, one sort for both frames") {
    val l6 = left.union(Seq((6L, "a", 17.5)).toDF("id", "k", "ts"))
    val out = AsofJoin.nearest(l6, right, Seq("k"))
    val m = out.select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(m === Map(
      1L -> Some(100.0),  // age 0 backward
      2L -> Some(200.0),  // fw age 5 beats bw age 10
      3L -> Some(200.0),  // only backward exists
      4L -> Some(400.0),
      5L -> None,
      6L -> Some(100.0))) // exact tie (7.5 each) → backward
    val tol = AsofJoin.nearest(left, right, Seq("k"), tolerance = Some(5.0))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(tol(2L) === Some(200.0) && tol(3L) === Some(200.0) && tol(1L) === Some(100.0))
    // both direction frames ride ONE sort: a single hash-partitioning
    // exchange, no self-join of the union
    val plan = out.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size === 1)
  }

  test("null right keys/timestamps match nothing instead of acting as -inf") {
    import spark.implicits._
    val nullish = Seq(
      (Some(1L), Some(1.0), 7.0),   // valid: ts 1, v 7
      (Some(1L), None, 666.0),      // null ts: would sort to front unfiltered
      (None, Some(2.0), 667.0))     // null key
      .toDF("k", "ts", "v")
    val l = Seq((10L, 1L, 5.0)).toDF("id", "k", "ts")
    val out = AsofJoin.backward(l, nullish, Seq("k"))
      .select("id", "v").as[(Long, Option[Double])].collect()
    assert(out.toSeq === Seq((10L, Some(7.0))))
  }

  test("null LEFT timestamps match nothing in every direction") {
    import spark.implicits._
    // null left ts sorts nulls-first: unfixed, forward/nearest's look-ahead
    // frame would see all right rows and match the EARLIEST one
    val l = Seq((10L, Some(1L), Option.empty[Double]),
                (11L, Some(1L), Some(20.0))).toDF("id", "k", "ts")
    val r = Seq((1L, 10.0, 100.0), (1L, 25.0, 200.0)).toDF("k", "ts", "v")
    def m(out: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      out.select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(m(AsofJoin.backward(l, r, Seq("k"))) === Map(10L -> None, 11L -> Some(100.0)))
    assert(m(AsofJoin.forward(l, r, Seq("k")))  === Map(10L -> None, 11L -> Some(200.0)))
    assert(m(AsofJoin.nearest(l, r, Seq("k")))  === Map(10L -> None, 11L -> Some(200.0)))
    assert(m(AsofJoin.forward(l, r, Seq("k"), tolerance = Some(100.0)))
      === Map(10L -> None, 11L -> Some(200.0)))
  }

  test("reserved and colliding column names are rejected up front") {
    import spark.implicits._
    val bad = Seq((1L, 1.0, 2.0)).toDF("k", "ts", "__side")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, bad, Seq("k"))
    }
    // right payload 'ts' (under empty prefix) collides with left 'ts'
    val dup = Seq((1L, 1.0, 2.0)).toDF("k", "ts2", "ts")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, dup, Seq("k"), rightTs = "ts2")
    }
  }
}
