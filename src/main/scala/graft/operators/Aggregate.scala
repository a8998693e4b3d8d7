package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Model

/** `sum by (...)` and friends (reference query.rs:439-546).
  *
  * The reference groups resampled series on the retained label subset and sums
  * element-wise. Here that is a single `groupBy(groupKey, ts)` with map-side
  * partial aggregation — the natural Spark shape; NaN propagates through the
  * double sum exactly like the reference's `+=` loop (query.rs:525-540).
  *
  * Labels the series does not carry are silently dropped from the group key
  * (reference `LabelValueMap::retaining`, labels.rs:193-203).
  */
object Aggregate {

  private def retainedMap(by: Seq[String]): Column =
    map_filter(col(Model.LabelsCol), (k, _) => array_contains(lit(by.toArray), k))

  def aggBy(df: DataFrame, by: Seq[String], aggFn: Column => Column): DataFrame = {
    val retained = retainedMap(by)
    df.withColumn("__gmap__", retained)
      .withColumn("__gkey__", Model.canonicalKey(col("__gmap__")))
      .groupBy(col("__gkey__"), col(Model.TsCol))
      .agg(first("__gmap__").as(Model.LabelsCol), aggFn(col(Model.ValueCol)).as(Model.ValueCol))
      .select(col("__gkey__").as(Model.SkeyCol), col(Model.LabelsCol), col(Model.TsCol), col(Model.ValueCol))
  }

  /** `sum by (labels...)` — the reference's only implemented aggregation. */
  def sumBy(df: DataFrame, by: Seq[String]): DataFrame = aggBy(df, by, sum)

  /** Natural extensions with identical grouping semantics. */
  def avgBy(df: DataFrame, by: Seq[String]): DataFrame = aggBy(df, by, avg)
  def minBy(df: DataFrame, by: Seq[String]): DataFrame = aggBy(df, by, min)
  def maxBy(df: DataFrame, by: Seq[String]): DataFrame = aggBy(df, by, max)
  def countBy(df: DataFrame, by: Seq[String]): DataFrame = aggBy(df, by, count)

  /** Population variance/stddev via explicit moment sums (identical
    * expression tree in any engine; Welford implementations differ in final
    * ULPs, which the oracle hash would see). */
  def stdvarBy(df: DataFrame, by: Seq[String]): DataFrame =
    aggBy(df, by, v => sum(v * v) / count(lit(1)) - (sum(v) / count(lit(1))) * (sum(v) / count(lit(1))))
  def stddevBy(df: DataFrame, by: Seq[String]): DataFrame =
    aggBy(df, by, v => sqrt(sum(v * v) / count(lit(1)) - (sum(v) / count(lit(1))) * (sum(v) / count(lit(1)))))

  /** `quantile(q, v) by (...)`: exact linear-interpolated percentile per
    * group per instant. Implemented as `sort_array(collect_list)` + index
    * interpolation — the identical `lo + (hi - lo) * frac` formula as
    * Spark's `percentile` aggregate and DuckDB's `quantile_cont`, but ~2×
    * faster here (group sizes are series counts — collecting a small array
    * beats the generic ObjectHashAggregate percentile state).
    *
    * Out-of-range q follows Prometheus: q < 0 → -Inf, q > 1 → +Inf, NaN →
    * NaN for every group (guards Spark's negative-index `element_at`, which
    * would otherwise silently read from the END of the sorted array). */
  def quantileBy(df: DataFrame, q: Double, by: Seq[String]): DataFrame =
    aggBy(df, by, quantileAgg(q))

  /** The shared aggregation column for `quantile(...) by` and
    * `quantile_over_time`: Prometheus out-of-range guards + exact
    * linear-interpolated percentile. */
  def quantileAgg(q: Double): Column => Column =
    if (q.isNaN) _ => min(lit(Double.NaN))
    else if (q < 0) _ => min(lit(Double.NegativeInfinity))
    else if (q > 1) _ => min(lit(Double.PositiveInfinity))
    else v => {
      val arr = sort_array(collect_list(v))
      val n = size(arr)
      val pos = (n - 1).cast(org.apache.spark.sql.types.DoubleType) * lit(q)
      val lo = floor(pos).cast(org.apache.spark.sql.types.IntegerType)
      val frac = pos - lo.cast(org.apache.spark.sql.types.DoubleType)
      val vlo = element_at(arr, lo + 1)
      val vhi = element_at(arr, least(lo + 2, n))
      vlo + (vhi - vlo) * frac
    }

  /** `count_values(label, v)`: per instant, one output series per distinct
    * value carrying that value (formatted like the wire format, integers
    * without ".0") under `label`; output value = occurrence count. */
  def countValues(df: DataFrame, label: String): DataFrame = {
    val vs = when(col(Model.ValueCol) === col(Model.ValueCol).cast("long").cast("double"),
        col(Model.ValueCol).cast("long").cast("string"))
      .otherwise(col(Model.ValueCol).cast("string"))
    df.withColumn("__vs__", vs)
      .groupBy(col("__vs__"), col(Model.TsCol))
      .agg(count(lit(1)).cast(org.apache.spark.sql.types.DoubleType).as(Model.ValueCol))
      .select(
        Model.canonicalKey(map(lit(label), col("__vs__"))).as(Model.SkeyCol),
        map(lit(label), col("__vs__")).as(Model.LabelsCol),
        col(Model.TsCol), col(Model.ValueCol))
  }

  /** `topk(k, v)` / `bottomk(k, v)`: per instant (and per `by` group when
    * given), keep the k series with the largest/smallest value. Unlike the
    * grouping aggregations the survivors keep their own labels. Ties break
    * deterministically on the canonical series key. One window pass,
    * partitioned by (group, ts) — no global sort. */
  def topk(df: DataFrame, k: Int, by: Option[Seq[String]], bottom: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gkey = by match {
      case Some(b) => Model.canonicalKey(retainedMap(b))
      case None => lit("")
    }
    val ord = if (bottom) col(Model.ValueCol).asc else col(Model.ValueCol).desc
    val w = Window.partitionBy(col("__gkey__"), col(Model.TsCol))
      .orderBy(ord, col(Model.SkeyCol).asc)
    df.withColumn("__gkey__", gkey)
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col(Model.SkeyCol), col(Model.LabelsCol), col(Model.TsCol), col(Model.ValueCol))
  }
}
