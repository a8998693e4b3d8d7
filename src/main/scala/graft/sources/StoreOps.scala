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
      require(Committer.current.publishRename(fs, new Path(path), new Path(bak)),
        s"swapWrite: rename-aside $path -> $bak failed")
    require(Committer.current.publishRename(fs, new Path(tmp), new Path(path)),
      s"swapWrite: rename $tmp -> $path failed (old table at $bak)")
    fs.delete(new Path(bak), true)
  }

  /** Layout sidecar (`_layout`): ONE integer — the scale-adaptive
    * partition fan-out a store froze at build time (r18, guide §2: derive
    * partitioning from input size, not a constant tuned for one scale).
    * Append and probe paths must hash with the build's modulus, so the
    * value is written once at build and read back with one FS metadata
    * op (no Spark job — the tombstone-marker rule). Stores written before
    * the sidecar read as `default` (their hard-coded historical
    * fan-out), so on-disk layouts never mix. */
  def writeLayout(spark: org.apache.spark.sql.SparkSession,
                  dir: String, n: Int): Unit = {
    val p = new Path(s"$dir/_layout")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(s"npfx=$n\n".getBytes("UTF-8"))
    out.close()
  }

  def readLayout(spark: org.apache.spark.sql.SparkSession,
                 dir: String, default: Int): Int = {
    val p = new Path(s"$dir/_layout")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) default
    else {
      val in = fs.open(p)
      val bytes = new Array[Byte](64)
      val n = in.read(bytes)
      in.close()
      new String(bytes, 0, math.max(n, 0), "UTF-8").trim
        .stripPrefix("npfx=").toInt
    }
  }

  /** The layout-sizing rule shared by the adaptive stores: enough
    * partitions that each directory holds ≥ `rowsPerPart` rows, capped at
    * the store's production fan-out (pruning power and write parallelism
    * grow with the data; a gate-scale store stops paying 32-64 directory
    * commits for a few thousand rows). */
  def adaptiveFanout(rows: Long, rowsPerPart: Long, cap: Int): Int =
    math.min(cap.toLong,
      math.max(1L, (rows + rowsPerPart - 1L) / rowsPerPart)).toInt

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
    * want replayable appends pick their own (crawl snapshot id).
    *
    * STORAGE-LAYER CONTRACT: step 3's rename is assumed to be an atomic,
    * cheap metadata operation — true on HDFS and posix filesystems, NOT
    * on S3-class object stores, where "rename" is copy+delete (non-atomic
    * and O(bytes)). The assumption is now a SEAM, not a hard-wiring:
    * every atomicity-sensitive op here routes through
    * [[Committer.current]] (default [[Committer.Rename]] = HDFS
    * semantics, today's behavior), and an object-store deployment
    * installs the conditional-PUT / manifest-ledger implementation —
    * see [[Committer]]'s scaladoc for the per-primitive mapping, all
    * compatible with this layout because the commit unit is a
    * batch-keyed FILE NAME. The same seam covers [[swapWrite]]
    * (directory-level swap) and the [[Lease]]. SURVEY §5 carries the
    * deployment-facing version of this contract. */
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
      require(Committer.current.publishRename(fs,
          f, new Path(targetDir, prefix + f.getName)),
        s"appendKeyed: commit rename of $f into $targetDir failed")
    }
    fs.delete(staging, true)
  }

  /** Thrown when a maintenance op finds another maintainer's live lease
    * on the store — the op refused to run rather than corrupt. */
  final class StoreBusyException(msg: String)
    extends IllegalStateException(msg)

  /** Single-maintainer lease over a store directory.
    *
    * The persistent stores are single-writer BY CONTRACT (the scaladoc at
    * the top of this file: "maintenance runs in the ingest job's write
    * slot"); the lease makes the contract ENFORCED instead of assumed.
    * The hazard is not append-vs-append (batch-keyed appends commit
    * distinct files) but maintenance-vs-anything: a vacuum/compact swap
    * rebuilds a table from a snapshot read, so a concurrent append lands
    * files the swap never saw and silently DROPS them; two concurrent
    * vacuums double-swap. Every mutator therefore runs under
    * [[withLease]]; probes never take it (reads stay lock-free — the
    * rename-aside swap keeps the store readable throughout).
    *
    * Mechanics: `_lease` is created with create-no-overwrite (atomic on
    * HDFS and posix; object stores map it to a conditional PUT) holding
    * `<token> <epoch-ms>`. A second maintainer's create fails → it reads
    * the holder and throws [[StoreBusyException]] — fail-fast, no
    * blocking, the caller's scheduler owns retry policy. A holder that
    * CRASHED leaves a lease behind; once it is older than `ttlMs` the
    * next acquirer deletes it and re-creates — of two racing takeovers,
    * the loser's create-no-overwrite fails and it re-evaluates. Release
    * deletes the file only if it still holds OUR token, so a stale
    * holder resuming after an expiry takeover cannot delete its
    * successor's lease (it gets a warning-free no-op; its own mutation
    * already won or lost at the filesystem rename level).
    *
    * The ttl must exceed the longest maintenance op (default 15 min —
    * generous against the measured storescale.json lifecycle times);
    * like every expiry-based lease, a holder paused PAST the ttl can
    * overlap its successor — the standard trade, documented not hidden.
    * Reentrant per thread (vacuum may call compact on the same dir). */
  object Lease {
    val DefaultTtlMs: Long = 15 * 60 * 1000L
    private def leasePath(dir: String) = new Path(s"$dir/_lease")
    private val held = new ThreadLocal[Set[String]] {
      override def initialValue(): Set[String] = Set.empty
    }

    def withLease[T](spark: org.apache.spark.sql.SparkSession, dir: String,
                     ttlMs: Long = DefaultTtlMs)(body: => T): T =
      if (held.get.contains(dir)) body
      else {
        val token = acquire(spark, dir, ttlMs)
        held.set(held.get + dir)
        try body
        finally { held.set(held.get - dir); release(spark, dir, token) }
      }

    /** Holder + age of the current lease, if any — for operators
      * deciding whether a takeover is safe. */
    def holder(spark: org.apache.spark.sql.SparkSession,
               dir: String): Option[(String, Long)] = {
      val p = leasePath(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      readLease(fs, p).map { case (t, ts) =>
        (t, System.currentTimeMillis() - ts)
      }
    }

    private def readLease(fs: org.apache.hadoop.fs.FileSystem,
                          p: Path): Option[(String, Long)] =
      try {
        val in = fs.open(p)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](256)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .trim.split(' ') match {
          case Array(tok, ts) => Some((tok, ts.toLong))
          case _ => None // garbage lease: treat as expired-unknown
        }
      } catch { case _: java.io.IOException => None } // vanished mid-read

    private def acquire(spark: org.apache.spark.sql.SparkSession,
                        dir: String, ttlMs: Long): String = {
      val p = leasePath(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(dir))
      val token = java.util.UUID.randomUUID().toString
      var attempt = 0
      while (attempt < 3) {
        attempt += 1
        try {
          Committer.current.createExclusive(fs, p,
            s"$token ${System.currentTimeMillis()}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          return token
        } catch {
          case _: java.io.IOException =>
            readLease(fs, p) match {
              case Some((holderTok, ts))
                  if System.currentTimeMillis() - ts <= ttlMs =>
                throw new StoreBusyException(
                  s"store $dir is under maintenance by $holderTok " +
                    s"(lease age ${System.currentTimeMillis() - ts} ms, " +
                    s"ttl $ttlMs ms)")
              case _ =>
                // expired or unreadable: take over; a racing winner's
                // create makes OUR next create fail and re-evaluate
                fs.delete(p, false)
            }
        }
      }
      throw new StoreBusyException(
        s"store $dir: lease churn — lost $attempt takeover races")
    }

    private def release(spark: org.apache.spark.sql.SparkSession,
                        dir: String, token: String): Unit = {
      val p = leasePath(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (readLease(fs, p).exists(_._1 == token)) fs.delete(p, false)
    }
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
