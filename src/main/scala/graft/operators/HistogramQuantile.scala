package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Model

/** `histogram_quantile(q, buckets)` (reference query.rs:259-356).
  *
  * Groups bucket series by all labels minus `Le`, sorts buckets by their
  * numeric `Le` value, and per grid instant walks the finite buckets:
  * `cutoff = q * count(+Inf)`; the first bucket with `count >= cutoff` yields
  * `le - (le - prev_le) * (count - cutoff) / (count - prev_count)`; if no
  * bucket qualifies the estimate is the last finite bucket bound, 0.0 with no
  * finite buckets at all (query.rs:325-347).
  *
  * Spark shape: one `groupBy(groupKey, ts)` with
  * `sort_array(collect_list(struct(le, value)))` — bucket counts per group are
  * small and bounded (a histogram has tens of buckets), so collect_list is
  * safe at any scale — then the walk runs as an `aggregate()` higher-order
  * function: no UDF, single shuffle.
  *
  * Series lacking a `Le` label are ignored (query.rs:296-301); groups whose
  * top bucket is not `+Inf` yield NaN (the reference fails the whole query,
  * query.rs:318-320; a per-group NaN is the distributed-friendly analogue).
  */
object HistogramQuantile {

  /** Parse a `Le` label value ("0.5", "+Inf", "+inf") to double. */
  private def leNumber(le: Column): Column =
    when(lower(le) === "+inf", lit(Double.PositiveInfinity)).otherwise(le.cast(DoubleType))

  def quantile(df: DataFrame, q: Double): DataFrame = {
    val grouped = df
      .filter(col(Model.LabelsCol).getItem(Model.LeLabel).isNotNull)
      .withColumn("__gmap__", map_filter(col(Model.LabelsCol), (k, _) => k =!= Model.LeLabel))
      .withColumn("__gkey__", Model.canonicalKey(col("__gmap__")))
      .withColumn("__le__", leNumber(col(Model.LabelsCol).getItem(Model.LeLabel)))
      .groupBy(col("__gkey__"), col(Model.TsCol))
      .agg(first("__gmap__").as(Model.LabelsCol),
        sort_array(collect_list(struct(col("__le__").as("le"), col(Model.ValueCol).as("v"))))
          .as("buckets"))

    val buckets = col("buckets")
    val n = size(buckets)
    val infBucket = element_at(buckets, -1)
    val total = infBucket("v")
    val cutoff = lit(q) * total
    val finite = slice(buckets, lit(1), n - 1)

    // Walk state: (found, est, prev_count, prev_le) — query.rs:325-347.
    val init = struct(lit(false).as("found"), lit(0.0).as("est"),
      lit(0.0).as("pc"), lit(0.0).as("pl"))
    val walk = aggregate(finite, init,
      (acc, b) =>
        when(acc("found"), acc)
          .when(b("v") >= cutoff, struct(
            lit(true).as("found"),
            // guard: ANSI mode would throw on /0; IEEE (and the reference's
            // Rust f64) yields NaN for the only reachable case (0-0)/(0-0)
            when(b("v") - acc("pc") === 0.0, lit(Double.NaN))
              .otherwise(b("le") - (b("le") - acc("pl")) * (b("v") - cutoff) / (b("v") - acc("pc")))
              .as("est"),
            acc("pc").as("pc"), acc("pl").as("pl")))
          .otherwise(struct(
            lit(false).as("found"), b("le").as("est"),
            b("v").as("pc"), b("le").as("pl"))),
      acc => acc("est"))

    val value = when(infBucket("le") === lit(Double.PositiveInfinity), walk)
      .otherwise(lit(Double.NaN))

    grouped.select(col("__gkey__").as(Model.SkeyCol), col(Model.LabelsCol),
      col(Model.TsCol), value.as(Model.ValueCol))
  }
}
