package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: interleaves bits exactly (Morton order)") {
    // x = 0b101 (5), y = 0b011 (3) -> z bits: y2 x2 y1 x1 y0 x0
    //  = 0 1 1 0 1 1 = 0b011011 = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
    assert(df.head().getLong(0) == 27L)
    // identity checks: y contributes odd bit positions
    val df2 = Seq((0L, 1L), (1L, 0L), (255L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(df2.toSeq == Seq(2L, 1L, 0x5555L))
  }

  test("z-ordered files skip 2-D box queries that a 1-D sort cannot") {
    // 4096 points uniform in [0,256)^2 (md5-derived, deterministic).
    // A quadrant query [0,64)x[0,64) must touch FEWER candidate files
    // under z-order than under an x-sort — measured from the same
    // per-file min/max statistics parquet skipping consults.
    val pts = (0 until 4096).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pt:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (i.toLong,
        java.lang.Long.parseLong(h.substring(0, 4), 16) % 256,
        java.lang.Long.parseLong(h.substring(4, 8), 16) % 256)
    }.toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-x").toString
    Layout.writeZOrdered(pts, col("x"), col("y"), zDir, nFiles = 16, bits = 8)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    def candidates(dir: String): Long = {
      val boxes = Layout.fileBoxes(
        spark.read.parquet(dir), col("x"), col("y"))
      boxes.filter(col("lo_x") < 64 && col("hi_x") >= 0 &&
        col("lo_y") < 64 && col("hi_y") >= 0).count()
    }
    val zc = candidates(zDir)
    val xc = candidates(xDir)
    // x-sort: every file spans all of y, so ~1/4 of files qualify by x
    // alone; z-order: the quadrant is one contiguous z prefix (~1/16 of
    // the key space), so ~1-2 boxes intersect
    assert(zc < xc, s"z-order candidates $zc !< x-sort candidates $xc")
    assert(zc <= 3, s"quadrant should hit <=3 of 16 z-ordered files, got $zc")
    assert(xc >= 4, s"x-sort lower bound sanity: $xc")
    // and the data round-trips: both layouts hold the same rows
    assert(spark.read.parquet(zDir).count() == 4096)
    assert(
      spark.read.parquet(zDir).agg(sum("x"), sum("y")).head() ==
        spark.read.parquet(xDir).agg(sum("x"), sum("y")).head())
  }

  test("bucketed co-location: the join itself runs with ZERO shuffle exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bktspec").toString
    val left = (0 until 1000).map(i => (i.toLong, i * 2L)).toDF("k", "a")
    val right = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k2", "b")
    Layout.writeBucketed(left, "spec_left_bkt", s"$tmp/l", "k", nBuckets = 4)
    Layout.writeBucketed(right, "spec_right_bkt", s"$tmp/r", "k2", nBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.readBucketed(spark, "spec_left_bkt").hint("merge")
        .join(Layout.readBucketed(spark, "spec_right_bkt"),
          col("k") === col("k2"))
      val rows = joined.collect()
      assert(rows.length == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // the same join over plain parquet reads shuffles BOTH sides
      val plainL = spark.read.parquet(s"$tmp/l")
      val plainR = spark.read.parquet(s"$tmp/r")
      val plain = plainL.hint("merge").join(plainR, col("k") === col("k2"))
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: catalog-less reads of the same files must shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
