package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sources.{Committer, MergeStore, StoreOps}

/** Pins the [[Committer]] seam: every store mutation's atomicity-
  * sensitive op goes through the installed implementation, the default
  * is byte-for-byte the HDFS rename behavior, and a deployment-specific
  * committer intercepts swapWrite, appendKeyed, the lease, and the
  * MergeStore bucket swap. */
class CommitterSpec extends SparkSpec {
  import spark.implicits._

  /** Delegates to the default but counts calls per primitive. */
  private final class Counting extends Committer {
    val renames = new java.util.concurrent.atomic.AtomicInteger
    val creates = new java.util.concurrent.atomic.AtomicInteger
    override def publishRename(fs: FileSystem, src: Path, dst: Path): Boolean = {
      renames.incrementAndGet(); Committer.Rename.publishRename(fs, src, dst)
    }
    override def createExclusive(fs: FileSystem, p: Path,
                                 content: Array[Byte]): Unit = {
      creates.incrementAndGet(); Committer.Rename.createExclusive(fs, p, content)
    }
  }

  private def tmp(): String =
    Files.createTempDirectory("graft-committer").toString

  test("swapWrite, appendKeyed, lease and MergeStore all route through the installed committer") {
    val c = new Counting
    Committer.install(c)
    try {
      val base = tmp()
      // swapWrite over an existing table: rename-aside + rename-in = 2
      val t = s"$base/table"
      Seq((1L, "a")).toDF("id", "v").write.parquet(t)
      StoreOps.swapWrite(Seq((2L, "b")).toDF("id", "v"), t)
      assert(c.renames.get == 2)
      assert(spark.read.parquet(t).as[(Long, String)].collect().toSeq ==
        Seq((2L, "b")))
      // appendKeyed: one publish per staged parquet file
      val ap = s"$base/append"
      c.renames.set(0)
      StoreOps.appendKeyed(Seq((1L, "x")).toDF("id", "v").coalesce(1), ap, 7L)
      assert(c.renames.get == 1)
      // lease: one exclusive create
      c.creates.set(0)
      StoreOps.Lease.withLease(spark, s"$base/leased") { () }
      assert(c.creates.get == 1)
      // MergeStore: lease create + per-touched-bucket swap renames
      val ms = s"$base/merge"
      MergeStore.init((0L until 20L).map(i => (i, s"d$i")).toDF("id", "text"),
        ms, "id", nBuckets = 4)
      c.renames.set(0); c.creates.set(0)
      MergeStore.merge(spark, ms, Seq((3L, "v2")).toDF("id", "text"))
      assert(c.creates.get == 1, "merge must take its lease through the seam")
      assert(c.renames.get == 2, "one touched bucket = rename-aside + rename-in")
      assert(MergeStore.read(spark, ms).filter($"id" === 3L)
        .select("text").as[String].head() == "v2")
    } finally Committer.reset()
  }

  test("default committer refuses to overwrite an existing exclusive file") {
    val dir = tmp()
    val p = new Path(s"$dir/_x")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Committer.Rename.createExclusive(fs, p, "a".getBytes)
    intercept[java.io.IOException] {
      Committer.Rename.createExclusive(fs, p, "b".getBytes)
    }
  }
}
