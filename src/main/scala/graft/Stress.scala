package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Grid, Rate}

/** Scale-stress sweep: blow the collection up by replica factors (a `replica`
  * label multiplies the series count; samples per series stay fixed) and run
  * the full unfiltered rate() pipeline over the whole collection at each
  * factor. Wall-clock growing sub-linearly in the factor is the signature of
  * the partition-parallel design (more series = more parallelism; per-series
  * work is bounded by samples-per-series + grid length).
  *
  * Usage: runMain graft.Stress [sfDir] [factors csv, default 1,8,32]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,8,32").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val base = queries.TsQueries.events(spark, sfDir)
    val grid = queries.TsQueries.grid

    val results = factors.map { f =>
      val blown =
        if (f == 1) base
        else base.crossJoin(spark.range(f).select(col("id").cast("string").as("__r__")))
          .withColumn("labels",
            map_concat(col("labels"), map(lit("replica"), col("__r__"))))
          .drop("__r__")
      val samples = Model.withSkey(blown)
      val t0 = System.nanoTime()
      val n = Rate.rate(samples, grid, 3600.0).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val nSeries = samples.select("skey").distinct().count()
      val nSamples = samples.count()
      println(f"STRESS factor=$f%d series=$nSeries%d samples=$nSamples%d rate_full=$secs%.1f s")
      (f, nSeries, nSamples, secs)
    }
    val line = results.map { case (f, se, sa, s) => s"""{"factor":$f,"series":$se,"samples":$sa,"secs":$s}""" }
      .mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("stress_out.json"), line + "\n")
    spark.stop()
  }
}
