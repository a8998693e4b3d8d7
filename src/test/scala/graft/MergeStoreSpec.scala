package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.functions._

import graft.sources.MergeStore

class MergeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mergestore").toString + "/store"

  private def listFiles(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = JPath.of(dir)
    if (!Files.exists(root)) Map.empty
    else {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
      finally s.close()
    }
  }

  test("merge ≡ upsert semantics; delete removes; reads prune to touched buckets") {
    val path = tmp()
    val base = (0L until 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    MergeStore.init(base, path, "id", nBuckets = 8)
    // upsert: 10 updates (existing keys) + 5 inserts (new keys)
    val batch = ((0L until 10L).map(i => (i * 7, s"v2 ${i * 7}")) ++
      (100L until 105L).map(i => (i, s"new $i"))).toDF("id", "text")
    MergeStore.merge(spark, path, batch)
    val got = MergeStore.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = ((0L until 100L).map(i => i -> s"doc $i").toMap
      ++ (0L until 10L).map(i => (i * 7) -> s"v2 ${i * 7}").toMap
      ++ (100L until 105L).map(i => i -> s"new $i").toMap)
    assert(got == want)
    MergeStore.delete(spark, path, Seq(0L, 3L, 999L).toDF("id"))
    val afterDel = MergeStore.read(spark, path)
      .collect().map(_.getLong(0)).toSet
    assert(afterDel == want.keySet - 0L - 3L) // absent key 999 is a no-op
  }

  test("untouched bucket files are byte-identical after a merge") {
    val path = tmp()
    val base = (0L until 200L).map(i => (i, s"doc $i")).toDF("id", "text")
    MergeStore.init(base, path, "id", nBuckets = 16)
    // one single-key batch touches exactly one bucket
    val oneKey = Seq((42L, "v2")).toDF("id", "text")
    val touchedBkt = spark.range(1)
      .select(pmod(crc32(lit(42L).cast("string")), lit(16L)).cast("int"))
      .head().getInt(0)
    val before = listFiles(s"$path/data")
    MergeStore.merge(spark, path, oneKey)
    val after = listFiles(s"$path/data")
    val untouchedBefore = before.filterNot(_._1.contains(s"bkt=$touchedBkt"))
    val untouchedAfter = after.filterNot(_._1.contains(s"bkt=$touchedBkt"))
    assert(untouchedBefore == untouchedAfter,
      "untouched bucket files must be byte-identical (same names, same mtimes)")
    assert(before.keys.count(_.contains(s"bkt=$touchedBkt")) > 0)
  }

  test("merge is idempotent: re-running the same batch changes nothing") {
    val path = tmp()
    MergeStore.init((0L until 50L).map(i => (i, s"d$i")).toDF("id", "text"),
      path, "id", nBuckets = 4)
    val batch = Seq((1L, "x"), (60L, "y")).toDF("id", "text")
    MergeStore.merge(spark, path, batch)
    val once = MergeStore.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    MergeStore.merge(spark, path, batch)
    val twice = MergeStore.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(once == twice)
  }

  test("mid-swap crash state (live dir parked in .bak) is recovered, no rows lost") {
    val path = tmp()
    val base = (0L until 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    MergeStore.init(base, path, "id", nBuckets = 8)
    // simulate a crash between rename-aside and rename-in: bucket 3's
    // live dir is gone, its content parked in the hidden .bak (which
    // Spark reads skip)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/data/bkt=3")
    val bak = new org.apache.hadoop.fs.Path(s"$path/data/.bkt=3.bak")
    assert(fs.exists(live))
    assert(fs.rename(live, bak))
    // a merge touching an unrelated key must FIRST restore bucket 3
    MergeStore.merge(spark, path, Seq((200L, "new")).toDF("id", "text"))
    val got = MergeStore.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0L until 100L).map(i => i -> s"doc $i").toMap + (200L -> "new")
    assert(got == want, "recovery must restore the parked bucket before merging")
    assert(!fs.exists(bak))
    // stale .bak from a COMPLETED swap (live exists) is just cleaned up
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/data/.bkt=5.bak"))
    MergeStore.merge(spark, path, Seq((201L, "more")).toDF("id", "text"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/data/.bkt=5.bak")))
    assert(MergeStore.read(spark, path).count() == 102)
  }

  test("non-unique batch is rejected loudly") {
    val path = tmp()
    MergeStore.init(Seq((1L, "a")).toDF("id", "text"), path, "id", 2)
    val dup = Seq((5L, "x"), (5L, "y")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      MergeStore.merge(spark, path, dup)
    }
    assert(e.getMessage.contains("unique"))
  }
}
