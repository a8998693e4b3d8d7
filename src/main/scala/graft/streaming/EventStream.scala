package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming ingest of the events table: the same tumbling-window
  * aggregation as the batch `events_window` query, expressed as a stream —
  * `readStream` → event-time watermark → windowed groupBy. At scale this is
  * the continuous-ingest path (new parquet files appear in the directory);
  * the batch/stream parity is asserted by StreamingSpec.
  */
object EventStream {

  /** Streaming DataFrame over a DIRECTORY of event parquet files (the
    * FileStreamSource contract): (event_type, window_start ts, cnt,
    * sum_value). */
  def windowedStream(spark: SparkSession, inputDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(inputDir).schema // driver-side schema pass
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("ets", schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // UTC session tz: NTZ wall time IS the epoch instant
          col("ts").cast(org.apache.spark.sql.types.TimestampType)
        case _ => col("ts")
      })
      .withWatermark("ets", "1 hour")
      .groupBy(col("event_type"), window(col("ets"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("event_type"), col("w.start").cast("double").as("day"),
        col("cnt"), col("sum_value"))
  }

  /** Batch equivalent over the same source (parity target for the spec). */
  def windowedBatch(spark: SparkSession, dir: String): DataFrame =
    graft.queries.AnalyticsQueries.eventsWindow(spark, dir)
}
