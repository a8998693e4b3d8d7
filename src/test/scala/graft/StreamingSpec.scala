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
}
