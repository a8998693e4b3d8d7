package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: every left row picks one right row per join key by
  * temporal proximity — [[backward]] the LATEST right row at-or-before
  * its timestamp (`<` in strict mode), [[forward]] the EARLIEST
  * at-or-after, [[nearest]] whichever of the two is closer. The canonical
  * "enrich an event with the most recent reading" operator family
  * (events ↔ sensor samples, trades ↔ quotes). The reference engine has
  * no join surface at all; this is part of the analytics extension.
  *
  * Implementation is the SORT-MERGE formulation, not a range join: both
  * sides are union-tagged and shuffled ONCE on the join keys, and a single
  * running `last(ignoreNulls)` window over (ts, side) carries the most
  * recent right payload forward onto each left row. Cost = one exchange +
  * one in-partition sort, independent of time-gap width — a
  * `l.ts BETWEEN r.ts AND r.ts + gap` range join explodes as the gap
  * grows, and Spark has no native as-of strategy. WindowExec's running
  * frame is O(rows) and spills, so a hot key degrades gracefully.
  *
  * Right rows must be unique per (keys, rightTs) — pre-aggregate
  * otherwise; with duplicates the winner among equal timestamps is
  * nondeterministic (same contract as DuckDB's ASOF JOIN, the oracle we
  * gate against). Right rows with a null key or null timestamp are
  * dropped (they can match nothing under SQL semantics); left rows are
  * always kept — a null left timestamp simply matches nothing.
  */
object AsofJoin {

  /** Left-outer backward as-of join.
    *
    * @param keys     equi-join key columns (present on both sides)
    * @param leftTs   left ordering column (numeric or castable to double)
    * @param rightTs  right ordering column
    * @param prefix   prepended to right payload column names on output
    * @param strict   require right.ts strictly < left.ts (default: <=)
    * @param tolerance max allowed left.ts - right.ts; matches further in
    *                  the past are nulled out (None = unbounded)
    * @return left columns, then each right non-key non-ts column as
    *         `prefix + name` (null where no right row qualifies)
    */
  private val Reserved = Set("__t", "__side", "__l", "__r", "__m", "__rt", "__mb", "__mf")

  /** The shared union-tag pipeline: validate names, drop unmatchable right
    * rows, tag both sides, union. `lTag`/`rTag` order equal timestamps
    * within the window sort. Returns (unioned frame, payload names, lTag). */
  private def tagUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, prefix: String,
      lTag: Int, rTag: Int): (DataFrame, Seq[String]) = {
    val clash = (left.columns ++ right.columns).filter(Reserved)
    require(clash.isEmpty,
      s"column name(s) reserved by AsofJoin: ${clash.mkString(", ")}")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val outNames = left.columns.toSeq ++ payloadCols.map(prefix + _)
    require(outNames.distinct.length == outNames.length,
      "output column collision: " +
        outNames.diff(outNames.distinct).distinct.mkString(", ") +
        " (set a prefix or rename)")
    // a right row with a null key or null ts matches no left row under the
    // SQL as-of contract (comparisons with NULL are never true) — but
    // unfiltered it would sort to the partition front (nulls-first) and
    // act as ts = -infinity, or equi-group with null left keys
    val rValid = (keys :+ rightTs).foldLeft(right)((df, c) => df.filter(col(c).isNotNull))
    // the right ts rides inside the payload struct for the tolerance test
    val rPayload = struct(
      (col(rightTs).cast("double").as("__rt") +: payloadCols.map(col)): _*)
    val rType = rValid.select(rPayload).schema.head.dataType
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).cast("double").as("__t"),
        lit(lTag).as("__side"), lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = rValid.select(
      keys.map(col) ++ Seq(col(rightTs).cast("double").as("__t"),
        lit(rTag).as("__side"), lit(null).cast(lType).as("__l"),
        rPayload.as("__r")): _*)
    (lTagged.unionByName(rTagged), payloadCols)
  }

  /** The ordered per-key window the match expressions run over. */
  private def keyWindow(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))

  private def finish(matched: DataFrame, leftCols: Seq[String],
      payloadCols: Seq[String], prefix: String, pick: Column): DataFrame = {
    val outRight = payloadCols.map(c => pick(c).as(prefix + c))
    // getField, not the dotted string path: caller names may contain dots
    matched.select(leftCols.map(c => col("__l").getField(c).as(c)) ++ outRight: _*)
  }

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts", prefix: String = "",
      strict: Boolean = false, tolerance: Option[Double] = None): DataFrame = {
    // side tags order equal timestamps: inclusive → right first (visible
    // to a same-ts left row); strict → left first (right hidden)
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val (unioned, payloadCols) =
      tagUnion(left, right, keys, leftTs, rightTs, prefix, lTag, rTag)
    val w = keyWindow(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lTag)
    val inRange: Column = tolerance match {
      case Some(tol) => when(col("__t") - col("__m")("__rt") <= tol, col("__m"))
      case None      => col("__m")
    }
    finish(matched, left.columns.toSeq, payloadCols, prefix, inRange)
  }

  /** Left-outer FORWARD as-of join: the EARLIEST right row with
    * `right.ts >= left.ts` (`>` in strict mode). Identical plan shape to
    * [[backward]] — same single exchange and sort, the running frame just
    * looks ahead (`first` over current→following) instead of behind.
    * `tolerance` bounds `right.ts - left.ts`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts", prefix: String = "",
      strict: Boolean = false, tolerance: Option[Double] = None): DataFrame = {
    // inclusive → right sorts after left (inside the look-ahead frame);
    // strict → right sorts before left (hidden from it)
    val (lTag, rTag) = if (strict) (1, 0) else (0, 1)
    val (unioned, payloadCols) =
      tagUnion(left, right, keys, leftTs, rightTs, prefix, lTag, rTag)
    val w = keyWindow(keys).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lTag)
    val inRange: Column = tolerance match {
      case Some(tol) => when(col("__m")("__rt") - col("__t") <= tol, col("__m"))
      case None      => col("__m")
    }
    // a null left ts sorts nulls-FIRST, so the look-ahead frame would see
    // every right row and "match" the earliest one — gate it to nothing
    // (the contract above; backward is safe only because nothing precedes)
    finish(matched, left.columns.toSeq, payloadCols, prefix,
      when(col("__t").isNotNull, inRange))
  }

  /** Left-outer NEAREST as-of join: whichever of the backward/forward
    * candidates is temporally closer (ties → the earlier, i.e. backward,
    * row — pandas merge_asof semantics). ONE exchange and ONE sort: both
    * direction frames (running `last` behind, running `first` ahead) ride
    * the same Window sort, so nearest costs the same shuffle as either
    * directed join. Equal-ts right rows land in the backward frame only
    * (age 0 — always the winner), which keeps one consistent ordering
    * valid for both frames. `tolerance` bounds |left.ts - right.ts|;
    * out-of-bound candidates are discarded per side BEFORE the pick. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts", prefix: String = "",
      tolerance: Option[Double] = None): DataFrame = {
    val (lTag, rTag) = (1, 0) // right first: equal ts visible backward
    val (unioned, payloadCols) =
      tagUnion(left, right, keys, leftTs, rightTs, prefix, lTag, rTag)
    val wb = keyWindow(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = keyWindow(keys).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wf))
      .filter(col("__side") === lTag)
    def gate(m: Column, age: Column): Column = tolerance match {
      case Some(tol) => when(age <= tol, m)
      case None      => m
    }
    val bw = gate(col("__mb"), col("__t") - col("__mb")("__rt"))
    val fw = gate(col("__mf"), col("__mf")("__rt") - col("__t"))
    val pick = when(fw.isNull, bw).when(bw.isNull, fw)
      .when(col("__t") - bw("__rt") <= fw("__rt") - col("__t"), bw)
      .otherwise(fw)
    // null left ts: the forward frame would otherwise capture the earliest
    // right row (nulls-first sort) — the contract is "matches nothing"
    finish(matched, left.columns.toSeq, payloadCols, prefix,
      when(col("__t").isNotNull, pick))
  }
}
