package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Model

/** `*_over_time` range-vector aggregations (avg/min/max/sum/count over the
  * samples in `(t - range, t]` per grid instant) — the PromQL range-function
  * family the reference does not implement but every Prometheus user leans
  * on; added as a natural extension with sample (not interpolated) semantics.
  *
  * Distributed shape: instead of joining every grid instant against every
  * sample (a range join that degenerates at scale), each SAMPLE is exploded
  * to the grid windows it falls into — at most `ceil(range/step)` window
  * indices per sample, a bounded constant — and a single partial-aggregated
  * `groupBy(series, window)` folds them. Shuffle key = (series, grid
  * instant); grid instants with no samples produce no row.
  */
object RangeAgg {

  def overTime(samples: DataFrame, grid: Grid, overRange: Double,
               aggFn: Column => Column, outName: String = Model.ValueCol): DataFrame = {
    require(overRange > 0, "range <= 0")
    val start = lit(grid.start)
    val step = lit(grid.step)
    // window k (0-based grid index) contains sample t iff
    // grid_t - range < t <= grid_t, grid_t = start + k*step
    //  =>  k >= (t - start)/step  and  k < (t - start + range)/step
    val kLo = ceil((col(Model.TsCol) - start) / step).cast(IntegerType)
    val kHi = least(
      floor((col(Model.TsCol) - start + lit(overRange)) / step -
        // half-open upper bound: t == grid_t - range must NOT count
        when((col(Model.TsCol) - start + lit(overRange)) % step === 0, 1).otherwise(0))
        .cast(IntegerType),
      lit(grid.length - 1))
    val kLo0 = greatest(kLo, lit(0))
    samples
      .withColumn("__k__", explode(
        when(kLo0 <= kHi, sequence(kLo0, kHi))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .groupBy(col(Model.SkeyCol), col("__k__"))
      .agg(first(Model.LabelsCol).as(Model.LabelsCol), aggFn(col(Model.ValueCol)).as(outName))
      .select(col(Model.SkeyCol), col(Model.LabelsCol),
        (start + col("__k__").cast(DoubleType) * step).as(Model.TsCol), col(outName))
  }

  /** `deriv(v[range])`: least-squares slope of value vs time over the
    * window's samples (PromQL extension; sample semantics like the rest of
    * the family). Time is centered on the window's grid instant before the
    * sums — t² at epoch scale (~3e18) would eat all double precision; the
    * slope is shift-invariant. Windows with fewer than two samples or zero
    * time variance yield no row. */
  def derivOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame = {
    require(overRange > 0, "range <= 0")
    val start = lit(grid.start)
    val step = lit(grid.step)
    val kLo = ceil((col(Model.TsCol) - start) / step).cast(IntegerType)
    val kHi = least(
      floor((col(Model.TsCol) - start + lit(overRange)) / step -
        when((col(Model.TsCol) - start + lit(overRange)) % step === 0, 1).otherwise(0))
        .cast(IntegerType),
      lit(grid.length - 1))
    val kLo0 = greatest(kLo, lit(0))
    samples
      .withColumn("__k__", explode(
        when(kLo0 <= kHi, sequence(kLo0, kHi))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .withColumn("__tc__", col(Model.TsCol) - (start + col("__k__").cast(DoubleType) * step))
      .groupBy(col(Model.SkeyCol), col("__k__"))
      .agg(first(Model.LabelsCol).as(Model.LabelsCol),
        count(lit(1)).cast(DoubleType).as("__n__"),
        sum("__tc__").as("__st__"), sum(Model.ValueCol).as("__sv__"),
        sum(col("__tc__") * col(Model.ValueCol)).as("__stv__"),
        sum(col("__tc__") * col("__tc__")).as("__stt__"))
      .withColumn("__den__", col("__n__") * col("__stt__") - col("__st__") * col("__st__"))
      .filter(col("__n__") >= 2 && col("__den__") =!= 0.0)
      .select(col(Model.SkeyCol), col(Model.LabelsCol),
        (start + col("__k__").cast(DoubleType) * step).as(Model.TsCol),
        ((col("__n__") * col("__stv__") - col("__st__") * col("__sv__")) / col("__den__"))
          .as(Model.ValueCol))
  }

  def avgOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame =
    overTime(samples, grid, overRange, avg)
  def minOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame =
    overTime(samples, grid, overRange, min)
  def maxOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame =
    overTime(samples, grid, overRange, max)
  def sumOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame =
    overTime(samples, grid, overRange, sum)
  def countOverTime(samples: DataFrame, grid: Grid, overRange: Double): DataFrame =
    overTime(samples, grid, overRange, count)
}
