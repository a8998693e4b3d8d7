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
}
