package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Model
import graft.operators.NativeHistogram

/** Native-histogram construction over an event STREAM: per (series,
  * tumbling window), the same sparse exponential-bucket rows
  * [[NativeHistogram.fromSamples]] builds in batch — the
  * distribution-metrics-over-streams shape (latency histograms from raw
  * request events, continuously).
  *
  * Streaming plan = two CHAINED windowed aggregations (the Spark 3.4+
  * multiple-stateful-operator shape, append mode):
  *
  *   1. `groupBy(series, window(ets), sign, bucket_idx)` counting samples
  *      and summing values — streaming state is ONE ROW PER POPULATED
  *      BUCKET (tens per series-window), not per sample: the state shape
  *      that survives unbounded streams. This is exactly fromSamples'
  *      first groupBy with the time axis swapped for an event-time window.
  *   2. `groupBy(series, window)` assembling the sorted sparse arrays —
  *      fromSamples' second groupBy, collect_list bounded by the bucket
  *      count.
  *
  * The watermark closes windows, so each histogram row emits exactly once
  * (append mode) and state expires; downstream native operators
  * (quantile/fraction/merge — all map-only or bounded) compose on the
  * emitted frame unchanged. StreamingSpec proves the streamed rows equal
  * the batch twin bit-for-bit, including a quantile walk over both.
  */
object StreamHistogram {

  /** Batch twin: events (ts double seconds, value, one label column) →
    * per (label, tumbling window) native-histogram rows. */
  def batch(events: DataFrame, labelCol: String, sch: Int,
            windowSec: Long): DataFrame = {
    val samples = events.select(
      map(lit(Model.NameLabel), lit("events_native"),
        lit(labelCol), col(labelCol)).as(Model.LabelsCol),
      (floor(col("ts") / windowSec.toDouble) * windowSec.toDouble)
        .as(Model.TsCol),
      col("value").as(Model.ValueCol))
    NativeHistogram.fromSamples(Model.withSkey(samples), sch)
  }

  /** Streaming twin over an event stream carrying an `ets` TIMESTAMP
    * column (plus `labelCol`, `value`). Emits one append-mode row per
    * closed (label, window): the identical schema and values as
    * [[batch]] over the same finite input. */
  def streaming(events: DataFrame, labelCol: String, sch: Int,
                windowDur: String, watermark: String = "1 hour"): DataFrame = {
    val idx = ceil(round(log2(abs(col("value"))) * lit(math.pow(2.0, sch)), 9))
      .cast(IntegerType)
    val bucketed = events
      .withWatermark("ets", watermark)
      .withColumn("__sg__", signum(col("value")).cast(IntegerType))
      .withColumn("__i__", when(col("__sg__") =!= 0, idx))
      .groupBy(col(labelCol), window(col("ets"), windowDur).as("__w__"),
        col("__sg__"), col("__i__"))
      .agg(count(lit(1)).cast(DoubleType).as("cnt"),
        sum(col("value")).as("vsum"))
    bucketed
      .groupBy(col(labelCol), col("__w__"))
      .agg(
        sum(when(col("__sg__") === 0, col("cnt")).otherwise(lit(0.0)))
          .as("nh_zero_count"),
        sum("vsum").as("nh_sum"),
        sum("cnt").as("nh_count"),
        sort_array(collect_list(when(col("__sg__") === 1,
          struct(col("__i__").as("i"), col("cnt").as("c"))))).as("pbs"),
        sort_array(collect_list(when(col("__sg__") === -1,
          struct(col("__i__").as("i"), col("cnt").as("c"))))).as("nbs"))
      .select(
        map(lit(Model.NameLabel), lit("events_native"),
          lit(labelCol), col(labelCol)).as(Model.LabelsCol),
        col("__w__.start").cast(DoubleType).as(Model.TsCol),
        lit(sch).as("nh_schema"), col("nh_zero_count"), col("nh_sum"),
        col("nh_count"),
        transform(col("pbs"), b => b("i")).as("nh_pos_idx"),
        transform(col("pbs"), b => b("c")).as("nh_pos_cnt"),
        transform(col("nbs"), b => b("i")).as("nh_neg_idx"),
        transform(col("nbs"), b => b("c")).as("nh_neg_cnt"),
        array().cast(ArrayType(DoubleType)).as("nh_bounds"))
  }
}
