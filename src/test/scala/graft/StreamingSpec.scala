package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Batch/stream parity for the windowed event aggregation. */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg matches batch (AvailableNow, complete mode)") {
    val dir = "/root/testdata/sf0.001"
    // FileStreamSource wants a directory; stage the events file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.windowedStream(spark, streamDir.toString)
      .writeStream
      .format("memory")
      .queryName("ev_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT event_type, day, cnt, sum_value FROM ev_stream")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.windowedBatch(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful sessionization (flatMapGroupsWithState) matches the batch window op") {
    val dir = "/root/testdata/sf0.001"
    val raw = queries.TsQueries.rawEvents(spark, dir)

    val batchSessions = streaming.Sessionize.batch(raw, 1800.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSet

    // drive the stateful path on the same finite input via a one-batch stream
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(streamDir.toString).schema
    val streamEvents = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000")
        .cast("double") / org.apache.spark.sql.functions.lit(1000000.0))
    val q = streaming.Sessionize.streaming(spark, streamEvents, 1800.0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM sessions")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchSessions)
  }
}
