package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR with a
  * noop-sink write (forces full materialization — `.count()` would let parquet
  * scans short-circuit to row-group metadata). Emits ONE JSON line on stdout
  * (unprefixed — build.sbt sets OutputStrategy.StdoutOutput for forked runs)
  * and mirrors it to bench_out.json for file-based pickup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      // best of 2: the first run pays codegen/compile warmup; min is the
      // stable per-query signal
      val a = once()
      val secs = if (a < 0) a else math.min(a, once())
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
