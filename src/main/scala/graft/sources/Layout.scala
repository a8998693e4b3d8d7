package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-ORDER (Morton) clustering.
  *
  * At 100 TB the cheapest query is the one that never opens the file:
  * parquet min/max statistics skip whole files/row-groups, but they only
  * work along the sort order — a corpus sorted by `user_id` answers
  * user-range scans with near-perfect skipping and reads EVERYTHING for a
  * `value`-range scan. Z-ordering interleaves the bits of several
  * columns into one sort key, so files become axis-aligned boxes in the
  * multi-dim space: a predicate on ANY participating column intersects
  * only the files whose box overlaps — the standard layout lever behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a plain column expression
  * plus a range-partitioned write (no table format required).
  *
  * [[zValue]] is pure per-row integer arithmetic (shift/mask/or — exact
  * in any engine, which is what the `zorder_key` gate pins); the write
  * path is `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)`, so
  * the cluster-wide cost is ONE range shuffle — the same price as a
  * single-column sort — and the skipping benefit lands on every
  * dimension at once. LayoutSpec MEASURES the law on real files: the
  * candidate-file count of a 2-D box query under z-order vs a
  * single-column sort, from the per-file min/max the engine itself
  * would use.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns: bit b of `x`
    * lands at position 2b, bit b of `y` at 2b+1. `bits` per dimension
    * (≤ 31 so the result stays in a positive long). Columns must already
    * be non-negative integers in [0, 2^bits); scale/rank first if not —
    * the key is a LAYOUT artifact, so any monotone per-dim mapping
    * preserves the skipping law. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered on (`x`, `y`) into `nFiles` range-partitioned
    * parquet files: one range shuffle, one sorted file per partition, so
    * per-file min/max boxes tile the z-curve. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    nFiles: Int = 16, bits: Int = 16): Unit = {
    val keyed = df.withColumn("__z__", zValue(x, y, bits))
    keyed.repartitionByRange(nFiles, col("__z__"))
      .sortWithinPartitions(col("__z__"))
      .drop("__z__")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max boxes of two columns — the statistics a scan's
    * file-skipping consults, surfaced for measurement: one row per file
    * with (lo_x, hi_x, lo_y, hi_y). */
  def fileBoxes(df: DataFrame, x: Column, y: Column): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(x).as("lo_x"), max(x).as("hi_x"),
        min(y).as("lo_y"), max(y).as("hi_y"))

  // ------------------------------------------------- bucketed co-location

  /** Write `df` as a BUCKETED table: rows hash-partitioned into `nBuckets`
    * files by `key` at WRITE time, bucket spec recorded in the catalog.
    * This is the other layout lever next to z-order: z-order buys file
    * SKIPPING, bucketing buys join CO-LOCATION — two tables bucketed on
    * their join key with the same bucket count join with ZERO shuffle
    * (bucket i only ever meets bucket i), so the dominant cost of a
    * fact⋈fact join at 100 TB — re-hashing both sides over the network,
    * every time — is paid ONCE at write and amortized over every
    * subsequent join, the same trade the z-order write makes for scans.
    * `sortBy(key)` inside buckets lets the join skip its sort too.
    *
    * The table is EXTERNAL (data at `path`), registered under `name` in
    * the session catalog — re-register after a restart with the same
    * call; `overwrite` drops and replaces. */
  def writeBucketed(df: DataFrame, name: String, path: String, key: String,
                    nBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.format("parquet").option("path", path)
      .bucketBy(nBuckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(name)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog — a
    * plain parquet read of the same path would NOT co-locate). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
