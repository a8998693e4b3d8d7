package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Shared maintenance primitives for the persistent parquet stores
  * (SearchIndex / AnnIndex / DedupIndex / CentroidStore / RollupStore).
  *
  * The one primitive everything rests on is [[swapWrite]]: rewrite a store
  * table that the rewrite plan itself READS. A plain
  * `mode("overwrite")` would delete the input files mid-scan, and the
  * in-memory alternative (`localCheckpoint` before the overwrite — the
  * rule the model-sized stats/sketch tables use) materializes the whole
  * frame in executor storage, which is exactly wrong for the corpus-sized
  * tables (postings, codes, members, rollup partials) these maintenance
  * jobs rewrite. Instead the new table is written NEXT TO the old one
  * (`<path>.tmp`), then swapped in with two filesystem metadata ops —
  * the compaction recipe every table format uses under the hood, kept
  * explicit here because the stores are plain parquet directories readable
  * by any engine. The swap is not atomic for concurrent readers (a reader
  * between delete and rename sees a missing table); maintenance runs in
  * the ingest job's write slot, which already owns exclusive write access.
  */
object StoreOps {

  /** Rewrite `path` with `df` via write-aside-and-swap. `partitionCols`
    * must repeat the table's layout (partition pruning contracts survive
    * the rewrite); the caller is responsible for `repartition`ing so each
    * partition directory lands as one file — that is the point of calling
    * this for compaction.
    *
    * Swap order is rename-aside, not delete-then-rename: the old table is
    * renamed to `<path>.bak`, the replacement renamed in, THEN the backup
    * deleted — so the live path is absent only between two metadata
    * renames (never across a recursive delete, which on object-store
    * filesystems is a slow per-file walk), and a crash mid-swap leaves
    * either the old table live or a recoverable `.bak` beside the new
    * one instead of a missing store. A stale `.bak` from a previous
    * failed swap is cleared first. */
  def swapWrite(df: DataFrame, path: String,
                partitionCols: Seq[String] = Nil): Unit = {
    val tmp = s"$path.tmp"
    val bak = s"$path.bak"
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    fs.delete(new Path(bak), true)
    if (fs.exists(new Path(path)))
      require(fs.rename(new Path(path), new Path(bak)),
        s"swapWrite: rename-aside $path -> $bak failed")
    require(fs.rename(new Path(tmp), new Path(path)),
      s"swapWrite: rename $tmp -> $path failed (old table at $bak)")
    fs.delete(new Path(bak), true)
  }

  /** Marker files: a zero-byte flag the read paths can test with one
    * filesystem metadata op instead of a Spark job (e.g. "does this store
    * have tombstones?"). `markerExists` doubles as a plain path-existence
    * probe for store-layout migration fallbacks. */
  def setMarker(spark: org.apache.spark.sql.SparkSession,
                path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.create(p, true).close()
  }

  def clearMarker(spark: org.apache.spark.sql.SparkSession,
                  path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  def markerExists(spark: org.apache.spark.sql.SparkSession,
                   path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Tombstone-list plumbing shared by the persistent stores
    * (SearchIndex/AnnIndex/DedupIndex/CentroidStore): a (id) parquet list
    * of logically-removed rows plus a `_has_tombstones` marker so read
    * paths can decide whether to add the anti-join with ONE filesystem
    * metadata op instead of a per-query Spark `isEmpty` job. Reads fall
    * back to an empty frame when the list file predates the layout (the
    * store-migration rule). */
  object Tombstones {
    private def marker(dir: String) = s"$dir/_has_tombstones"
    private def path(dir: String) = s"$dir/tombstones.parquet"

    /** Reset to "no tombstones" — build/vacuum call this. coalesce(1):
      * a 0-row frame otherwise writes one empty part file PER PARALLELISM
      * partition (32 task launches and 32 footer files per store build —
      * pure lifecycle overhead the bench gates pay). */
    def writeEmpty(spark: org.apache.spark.sql.SparkSession, dir: String,
                   idCol: String): Unit = {
      spark.range(0).select(org.apache.spark.sql.functions.col("id").as(idCol))
        .coalesce(1).write.mode("overwrite").parquet(path(dir))
      clearMarker(spark, marker(dir))
    }

    /** Append ids (deduplicated, cast to long) — a model-sized pure write
      * bounded by vacuum cadence, independent of store size.
      *
      * Marker is set BEFORE the parquet append: a crash between the two
      * then leaves a spurious marker over an unchanged list (harmless —
      * reads just pay the anti-join against the old tombstones), whereas
      * the reverse order would leave tombstone rows on disk that every
      * marker-gated read path ignores — removed docs silently served
      * until the next remove/vacuum. */
    def add(dir: String, ids: DataFrame, idCol: String): Unit = {
      setMarker(ids.sparkSession, marker(dir))
      ids.select(org.apache.spark.sql.functions.col(idCol)
          .cast(org.apache.spark.sql.types.LongType).as(idCol))
        .distinct().write.mode("append").parquet(path(dir))
    }

    /** One metadata op, no Spark job. */
    def any(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
      markerExists(spark, marker(dir))

    /** The distinct tombstone list; empty frame when the store predates
      * the tombstone layout. */
    def read(spark: org.apache.spark.sql.SparkSession, dir: String,
             idCol: String): DataFrame =
      if (markerExists(spark, path(dir)))
        spark.read.parquet(path(dir)).distinct()
      else spark.range(0)
        .select(org.apache.spark.sql.functions.col("id").as(idCol))
  }

  /** Exactly-once batch append — the idempotent-sink recipe every
    * `foreachBatch` store path uses (SearchIndex / AnnIndex / SketchStore /
    * RollupStore streaming maintenance). Structured Streaming replays the
    * last uncommitted micro-batch on failure recovery, so a plain
    * `mode("append")` double-appends; here every file a batch commits is
    * keyed by the batch id, making the commit REPLAYABLE:
    *
    *   1. stage: write `df` to `<path>.staging/b<id>` with overwrite —
    *      a replay of a crashed attempt restarts the staging clean;
    *   2. undo: delete every `b<id>_*` file already under `<path>` —
    *      exactly the files a crashed attempt's partial commit moved in;
    *   3. commit: rename each staged parquet file into its partition
    *      directory under `<path>` as `b<id>_<name>` (metadata ops only —
    *      staging and store share a filesystem by construction).
    *
    * Run twice with the same (path, batchId, data), the end state is
    * identical to running once — whatever step the first attempt died at.
    * Partition directories are preserved (the staged layout IS the store
    * layout), so pruning contracts survive. The batch-id key space is the
    * caller's: streaming passes the foreachBatch id, batch callers that
    * want replayable appends pick their own (crawl snapshot id). */
  def appendKeyed(df: DataFrame, path: String, batchId: Long,
                  partitionCols: Seq[String] = Nil): Unit = {
    val staging = new Path(s"$path.staging/b$batchId")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging.toString)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = staging.getFileSystem(conf)
    val dest = new Path(path)
    val prefix = s"b${batchId}_"
    if (fs.exists(dest)) {
      val it = fs.listFiles(dest, true)
      val stale = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.startsWith(prefix)) stale += p
      }
      stale.foreach(fs.delete(_, false))
    }
    val staged = {
      val it = fs.listFiles(staging, true)
      val b = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) b += p
      }
      b.toSeq
    }
    staged.foreach { f =>
      // partition subpath relative to the staging root (e.g. "pfx=3")
      val rel = f.getParent.toUri.getPath
        .stripPrefix(staging.toUri.getPath).stripPrefix("/")
      val targetDir = if (rel.isEmpty) dest else new Path(dest, rel)
      fs.mkdirs(targetDir)
      require(fs.rename(f, new Path(targetDir, prefix + f.getName)),
        s"appendKeyed: commit rename of $f into $targetDir failed")
    }
    fs.delete(staging, true)
  }

  /** Parquet files under `path` (recursively; excludes _SUCCESS etc.) —
    * the observable a compaction spec pins: results identical, file count
    * collapsed to one per partition directory. */
  def parquetFileCount(spark: org.apache.spark.sql.SparkSession,
                       path: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }
}
