package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Model

/** The regular output grid of a range query (reference timevectors.rs:165-201).
  * `length = max(1, floor((end - start + step) / step))`, points
  * `start + i*step`.
  */
final case class Grid(start: Double, end: Double, step: Double) {
  require(end > start, "end <= start")
  require(step > 0, "increment <= 0")
  val length: Int = math.max(1, ((end - start + step) / step).floor.toInt)

  /** Column of all grid instants (array<double>), computed without data motion. */
  def pointsCol: Column =
    transform(sequence(lit(0), lit(length - 1)), i => lit(start) + i.cast(DoubleType) * lit(step))
}

/** Resampling onto a regular grid with linear interpolation, plus the shared
  * probe-bracketing machinery used by rate/irate.
  *
  * Interpolation semantics (reference timeseries.rs:164-191):
  * before-first → first value; after-last → last value; otherwise linear
  * between the bracketing samples; NaN when the series is empty.
  *
  * Spark-first design: instead of per-series binary search, we union the
  * sample rows with one probe row per (series, grid instant) and resolve each
  * probe's bracketing samples with a single
  * `Window.partitionBy(skey).orderBy(t)` pass using `last/first(ignoreNulls)`.
  * One shuffle on the series key, whole-stage-codegen arithmetic, no UDFs, no
  * driver-side loops — the same plan shape works at 100 TB because samples of
  * a series are co-partitioned and each partition streams in time order.
  */
object Resample {

  /** Sample struct carried through the probe-bracketing window.
    * p_ts/p_value are the *previous* sample of the same series (needed by
    * irate); populated only when `withLag`. */
  private val svType = new StructType()
    .add("ts", DoubleType).add("v", DoubleType)
    .add("p_ts", DoubleType).add("p_value", DoubleType)

  /** For each probe row, find `prev` = last sample with ts <= probe_ts and
    * `next` = first sample with ts > probe_ts (strictly), mirroring
    * `VecTimeRange::locate` (timevectors.rs:110-148).
    *
    * @param samples (skey, ts, value) — deduped, one row per (series, ts)
    * @param probes  (skey, labels, out_ts, kind, probe_ts)
    * @return probes + (prev, next) structs
    */
  def bracket(samples: DataFrame, probes: DataFrame, withLag: Boolean): DataFrame = {
    val lagged =
      if (withLag) {
        val w = Window.partitionBy(Model.SkeyCol).orderBy(Model.TsCol)
        samples.withColumn("p_ts", lag(Model.TsCol, 1).over(w))
          .withColumn("p_value", lag(Model.ValueCol, 1).over(w))
      } else
        samples.withColumn("p_ts", lit(null).cast(DoubleType))
          .withColumn("p_value", lit(null).cast(DoubleType))

    val sampleRows = lagged.select(
      col(Model.SkeyCol),
      col(Model.TsCol).as("t"),
      lit(0).as("ord"), // samples sort before probes at equal t: prev is inclusive, next strict
      struct(col(Model.TsCol).as("ts"), col(Model.ValueCol).as("v"),
        col("p_ts"), col("p_value")).as("sv"),
      lit(null).cast(MapType(StringType, StringType)).as(Model.LabelsCol),
      lit(null).cast(DoubleType).as("out_ts"),
      lit(null).cast(StringType).as("kind"))

    val probeRows = probes.select(
      col(Model.SkeyCol), col("probe_ts").as("t"), lit(1).as("ord"),
      lit(null).cast(svType).as("sv"),
      col(Model.LabelsCol), col("out_ts"), col("kind"))

    // Both window frames are RUNNING frames (upper bound fixed relative to
    // the partition start) — Spark evaluates them incrementally. A naive
    // `first(..., ignoreNulls) over (1, unboundedFollowing)` is a shrinking
    // frame that Spark re-evaluates per row: O(n²) per partition (observed
    // 137 s vs 4 s on a 100k-sample series). The "next sample strictly after
    // t" is instead a running `last` over DESCENDING (t, ord) with the
    // current row excluded.
    val wAsc = Window.partitionBy(Model.SkeyCol).orderBy(col("t"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(Model.SkeyCol).orderBy(col("t").desc, col("ord").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val unioned = sampleRows.unionByName(probeRows)
      .withColumn("prev", last(col("sv"), ignoreNulls = true).over(wAsc))
      .withColumn("next", last(col("sv"), ignoreNulls = true).over(wDesc))

    unioned.filter(col("ord") === 1)
      .select(col(Model.SkeyCol), col(Model.LabelsCol), col("out_ts"), col("kind"),
        col("t").as("probe_ts"), col("prev"), col("next"))
  }

  /** `interpolated_at` (timeseries.rs:164-191) as a pure column expression. */
  def interpolated(t: Column, prev: Column, next: Column): Column = {
    val nan = lit(Double.NaN)
    when(prev.isNull && next.isNull, nan)
      .when(prev.isNull, next("v"))
      .when(next.isNull, prev("v"))
      .otherwise(
        ((t - prev("ts")) * next("v") + (next("ts") - t) * prev("v")) / (next("ts") - prev("ts")))
  }

  /** One probe row per (series, grid instant); `probe_ts = out_ts - offset`
    * implements the `offset` modifier (reference timeseries.rs:57-68). */
  def gridProbes(samples: DataFrame, grid: Grid, offset: Double, kind: String = "i"): DataFrame = {
    val series = samples.groupBy(Model.SkeyCol).agg(first(Model.LabelsCol).as(Model.LabelsCol))
    series.select(
      col(Model.SkeyCol), col(Model.LabelsCol),
      explode(grid.pointsCol).as("out_ts"),
      lit(kind).as("kind"))
      .withColumn("probe_ts", col("out_ts") - lit(offset))
  }

  /** [[bracket]] with the probe rows generated INLINE from the samples: the
    * first sample of each series (row_number over the same skey window)
    * explodes into one probe per (kind, grid instant). Semantically identical
    * to `bracket(samples, gridProbes(...))`, but the upstream pipeline is
    * computed ONCE and shuffled ONCE — the two-branch formulation re-computed
    * the whole input per branch (column pruning makes the branches
    * non-canonical, so Spark's ReuseExchange never fires; observed 3 full
    * input scans in the hist_quantile plan, and none after this).
    *
    * @param kinds (kind marker, total probe offset): `probe_ts = out_ts - off`
    */
  def bracketInline(samples: DataFrame, grid: Grid, kinds: Seq[(String, Double)],
                    withLag: Boolean): DataFrame = {
    val w0 = Window.partitionBy(Model.SkeyCol).orderBy(Model.TsCol)
    val lagged = samples
      .withColumn("p_ts", if (withLag) lag(Model.TsCol, 1).over(w0) else lit(null).cast(DoubleType))
      .withColumn("p_value", if (withLag) lag(Model.ValueCol, 1).over(w0) else lit(null).cast(DoubleType))
      .withColumn("__rn__", row_number().over(w0))

    val mapT = MapType(StringType, StringType)
    val sampleStruct = struct(
      col(Model.TsCol).as("t"), lit(0).as("ord"),
      struct(col(Model.TsCol).as("ts"), col(Model.ValueCol).as("v"),
        col("p_ts"), col("p_value")).as("sv"),
      lit(null).cast(mapT).as(Model.LabelsCol),
      lit(null).cast(DoubleType).as("out_ts"),
      lit(null).cast(StringType).as("kind"))
    val probeArrays: Seq[Column] = kinds.map { case (k, off) =>
      transform(grid.pointsCol, p => struct(
        (p - lit(off)).as("t"), lit(1).as("ord"),
        lit(null).cast(svType).as("sv"),
        col(Model.LabelsCol).as(Model.LabelsCol),
        p.as("out_ts"), lit(k).as("kind")))
    }
    val rowArr = when(col("__rn__") === 1, concat(array(sampleStruct) +: probeArrays: _*))
      .otherwise(array(sampleStruct))
    // explode preserves the skey partitioning: the bracketing windows below
    // need only an intra-partition sort, no further exchange
    val unioned = lagged
      .select(col(Model.SkeyCol), explode(rowArr).as("__r__"))
      .select(col(Model.SkeyCol), col("__r__.*"))

    val wAsc = Window.partitionBy(Model.SkeyCol).orderBy(col("t"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(Model.SkeyCol).orderBy(col("t").desc, col("ord").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn("prev", last(col("sv"), ignoreNulls = true).over(wAsc))
      .withColumn("next", last(col("sv"), ignoreNulls = true).over(wDesc))
      .filter(col("ord") === 1)
      .select(col(Model.SkeyCol), col(Model.LabelsCol), col("out_ts"), col("kind"),
        col("t").as("probe_ts"), col("prev"), col("next"))
  }

  /** Resample each series onto the grid (reference `calculate_resampled_series`,
    * timeseries.rs:57-68). Output: (skey, labels, ts, value). */
  def resample(samples: DataFrame, grid: Grid, offset: Double = 0.0): DataFrame = {
    val br = bracketInline(samples, grid, Seq(("i", offset)), withLag = false)
    br.select(
      col(Model.SkeyCol), col(Model.LabelsCol),
      col("out_ts").as(Model.TsCol),
      interpolated(col("probe_ts"), col("prev"), col("next")).as(Model.ValueCol))
  }
}
