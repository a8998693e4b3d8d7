package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Double, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("firstTouch: conversion, window break, chain break, ordering, strictness") {
    val events = ev(
      // A converts: view 0, click 100, purchase 200
      (1L, 0.0, "view"), (1L, 100.0, "click"), (1L, 200.0, "purchase"),
      // B reaches step 2; purchase outside the 1000s window
      (2L, 0.0, "view"), (2L, 100.0, "click"), (2L, 5000.0, "purchase"),
      // C stalls at step 1: click exists but outside window
      (3L, 0.0, "view"), (3L, 2000.0, "click"),
      // D: click BEFORE the view doesn't count; later pair does
      (4L, 50.0, "click"), (4L, 100.0, "view"), (4L, 150.0, "click"),
      (4L, 160.0, "purchase"),
      // E never views -> not in the funnel
      (5L, 10.0, "click"), (5L, 20.0, "purchase"),
      // F: click at EXACTLY t1 is not "after" step 1 (strict >)
      (6L, 0.0, "view"), (6L, 0.0, "click"))
    val out = Funnel.firstTouch(events,
        Seq("view", "click", "purchase"), window = 1000.0)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getBoolean(5),
          Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((3, true, Some(200.0))))
    assert(out(2L) == ((2, false, None)))
    assert(out(3L) == ((1, false, None)))
    assert(out(4L) == ((3, true, Some(60.0))))
    assert(!out.contains(5L))
    assert(out(6L) == ((1, false, None)))
  }

  test("firstTouch: first-touch entry — the EARLIEST view anchors the window") {
    // the user's first view is at 0; a later view at 900 would convert,
    // but first-touch anchors at 0 and the purchase at 1100 misses the
    // 1000s window
    val events = ev(
      (1L, 0.0, "view"), (1L, 900.0, "view"),
      (1L, 950.0, "click"), (1L, 1100.0, "purchase"))
    val out = Funnel.firstTouch(events,
      Seq("view", "click", "purchase"), window = 1000.0).collect()
    assert(out.length == 1)
    assert(out(0).getInt(4) == 2 && !out(0).getBoolean(5))
  }

  test("firstTouch: four-step funnel chains") {
    val events = ev(
      (1L, 0.0, "view"), (1L, 1.0, "click"), (1L, 2.0, "signup"),
      (1L, 3.0, "purchase"))
    val out = Funnel.firstTouch(events,
      Seq("view", "click", "signup", "purchase"), window = 10.0).collect()
    assert(out(0).getInt(5) == 4 && out(0).getBoolean(6))
  }
}
