package graft

import org.apache.spark.sql.SparkSession

import graft.server.PromApi
import graft.sources.TsIngest

/** Server entrypoint (the reference is itself a server binary, main.rs:64-113):
  * ingest the parquet tables in a directory and serve the Prometheus HTTP API.
  *
  * Usage: runMain graft.Serve <dir-with-parquet> [port]
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: Serve <parquet-dir> [port]"))
    val port = args.lift(1).map(_.toInt).getOrElse(3003)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val collection = queries.TsQueries.events(spark, dir).cache()
    val engine = new PromEngine(collection)
    val api = new PromApi(engine, port).start()
    println(s"graft: serving ${collection.count()} samples on port ${api.boundPort}")
    Thread.currentThread().join() // serve until killed
  }
}
