package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured comparison of the three hot-key join levers the brief names —
  * `runMain graft.SkewBench <sfDir> [hotPct]`:
  *
  *   A. plain sort-merge join, AQE off        — the straggler baseline
  *   B. plain sort-merge join, AQE skew split — runtime re-plan (needs
  *      SMJ + map-stats-visible skew; thresholds scaled to the corpus)
  *   C. [[graft.operators.SkewJoin.salted]]   — deterministic plan-level
  *      rewrite, strategy-independent
  *
  * The workload: lineitem with `hotPct`% of rows collapsed onto ONE
  * orderkey (the Zipf-head shape of user/URL/session keys), joined to
  * the orders dimension with broadcast disabled (the 100 TB premise: the
  * dim that needs this does not broadcast). Reported per scenario: wall
  * time of a count+sum over the join, and the MAX ROWS any single
  * shuffle partition of the joined frame holds — the quantity that
  * actually melts an executor; wall time on a 32-core local box
  * under-reports the damage a 1000-executor cluster takes from one
  * 30%-of-the-table task. Results land in SURVEY §6.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hotPct = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hotKey = lit(42L)
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("key",
        when(pmod(col("l_orderkey"), lit(100)) < hotPct, hotKey)
          .otherwise(col("l_orderkey")))
    val dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("key"), col("o_orderpriority"))

    def conf(aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      // defaults target 256 MB partitions; scale to this corpus so the
      // skew is as visible to AQE here as a 100 GB key is in production
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    }

    def run(name: String, joined: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = joined.agg(count(lit(1)), sum("l_extendedprice")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val maxPart = joined.groupBy(spark_partition_id())
        .count().agg(max("count")).head().getLong(0)
      println(f"""{"scenario":"$name","sec":$sec%.2f,"rows":${r.getLong(0)},"max_partition_rows":$maxPart}""")
    }

    conf(aqe = false)
    run("smj_plain", fact.hint("merge").join(dim, "key"))
    conf(aqe = true)
    run("smj_aqe_skew", fact.hint("merge").join(dim, "key"))
    conf(aqe = false)
    run("salted_32", graft.operators.SkewJoin.salted(
      fact, dim, "key", saltSrc = col("l_orderkey"), nSalts = 32))
    conf(aqe = true)
    run("salted_32_aqe", graft.operators.SkewJoin.salted(
      fact, dim, "key", saltSrc = col("l_orderkey"), nSalts = 32))
    spark.stop()
  }
}
