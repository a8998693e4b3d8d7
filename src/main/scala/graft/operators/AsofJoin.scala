package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: every left row picks the LATEST right row whose
  * timestamp is `<=` (or `<` in strict mode) its own, per join key — the
  * canonical "enrich an event with the most recent reading" operator
  * (events ↔ sensor samples, trades ↔ quotes). The reference engine has no
  * join surface at all; this is part of the analytics extension.
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
  private val Reserved = Set("__t", "__side", "__l", "__r", "__m", "__rt")

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts", prefix: String = "",
      strict: Boolean = false, tolerance: Option[Double] = None): DataFrame = {
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
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType

    // side tags order equal timestamps: inclusive → right first (visible
    // to a same-ts left row); strict → left first (right hidden)
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).cast("double").as("__t"),
        lit(lTag).as("__side"), lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = rValid.select(
      keys.map(col) ++ Seq(col(rightTs).cast("double").as("__t"),
        lit(rTag).as("__side"), lit(null).cast(lType).as("__l"),
        rPayload.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lTag)
    val inRange: Column = tolerance match {
      case Some(tol) => when(col("__t") - col("__m")("__rt") <= tol, col("__m"))
      case None      => col("__m")
    }
    val outRight = payloadCols.map(c => inRange(c).as(prefix + c))
    // getField, not the dotted string path: caller names may contain dots
    matched.select(left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++ outRight: _*)
  }
}
