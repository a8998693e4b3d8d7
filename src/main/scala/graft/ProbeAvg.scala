package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: interleaved timings + executed plans for avg_by vs sum_by. */
object ProbeAvg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to 3; n <- Seq("sum_by", "avg_by"))
      println(f"round $i $n: ${run(n)}%.2fs")
    for (n <- Seq("sum_by", "avg_by")) {
      println(s"==== $n plan ====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
