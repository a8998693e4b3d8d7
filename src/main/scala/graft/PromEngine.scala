package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Grid
import graft.promql.Eval

/** The engine facade — the Spark-native analogue of the reference's
  * `TimeSeriesCollection` + query entry points (timeseries.rs:389-484,
  * query.rs:583-596).
  *
  * @param collection long-format samples (labels map incl __name__, ts, value)
  * @param queryStartTime when set, queries behave as if the data started at
  *        this instant (`--shift_to_midnight`, main.rs:110 / timeseries.rs:410-417):
  *        grid instants are shifted back by `queryTimeOffset` before
  *        evaluation and shifted forward again in the output.
  */
final class PromEngine(val collection: DataFrame, val queryStartTime: Option[Double] = None,
                       val nativeHistograms: Map[String, DataFrame] = Map.empty,
                       val rollupStores: Map[String, graft.sources.RollupStore.Registered] = Map.empty) {

  private lazy val keyed = Model.withSkey(collection)
  private lazy val ctx = Eval.Ctx(keyed, nativeHistograms, rollupStores)

  /** Register native-histogram frames ([[graft.operators.NativeHistogram]]
    * layout) by metric name; `histogram_quantile` over a registered name
    * dispatches to the map-only native walk. */
  def withNativeHistograms(m: Map[String, DataFrame]): PromEngine =
    new PromEngine(collection, queryStartTime, m, rollupStores)

  /** Register [[graft.sources.RollupStore]] handles by metric name:
    * aligned avg/min/max/sum/count/last_over_time range queries are then
    * served from the downsampled store instead of raw samples (identical
    * results — see [[Eval.Ctx]]); everything else falls back to raw. */
  def withRollups(m: Map[String, graft.sources.RollupStore.Registered]): PromEngine =
    new PromEngine(collection, queryStartTime, nativeHistograms, m)

  lazy val (minTime, maxTime): (Double, Double) = {
    val r: Row = collection.agg(min(Model.TsCol), max(Model.TsCol)).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** `set_query_start_time` (timeseries.rs:414-417). */
  def queryTimeOffset: Option[Double] = queryStartTime.map(_ - minTime)

  def withStartTime(t: Double): PromEngine =
    new PromEngine(collection, Some(t), nativeHistograms, rollupStores)

  /** Run a PromQL range query; start/end/step in the *query* time frame.
    * Output (labels, ts, value) with ts back in the query time frame. */
  def queryRange(query: String, start: Double, end: Double, step: Double): DataFrame = {
    val off = queryTimeOffset.getOrElse(0.0)
    val grid = Grid(start - off, end - off, step)
    val out = Eval.run(ctx, query, grid)
    out.select(col(Model.LabelsCol), (col(Model.TsCol) + lit(off)).as(Model.TsCol), col(Model.ValueCol))
  }

  /** Internal-frame variant used by the correctness harness. */
  def queryRangeRaw(query: String, grid: Grid): DataFrame = Eval.run(ctx, query, grid)

  /** Instant query (extension — the reference's /api/v1/query only evaluates
    * "1+1", main.rs:399-405): evaluate on a single-instant grid at `t`. */
  def queryInstant(query: String, t: Double): DataFrame = {
    val off = queryTimeOffset.getOrElse(0.0)
    val grid = Grid(t - off, t - off + 0.5, 1.0) // length 1 → the instant itself
    val out = Eval.run(ctx, query, grid)
    out.select(col(Model.LabelsCol), (col(Model.TsCol) + lit(off)).as(Model.TsCol), col(Model.ValueCol))
  }

  /** Sorted distinct label names (timeseries.rs:459-476). */
  def allLabelsDF: DataFrame =
    collection.select(explode(map_keys(col(Model.LabelsCol))).as("label"))
      .distinct().orderBy("label")

  def allLabels(): Seq[String] = allLabelsDF.collect().map(_.getString(0)).toSeq

  /** Distinct metric names (timeseries.rs:478-483). */
  def allSeriesNamesDF: DataFrame =
    collection.select(col(Model.LabelsCol).getItem(Model.NameLabel).as("name"))
      .distinct().orderBy("name")

  def allSeriesNames(): Seq[String] = allSeriesNamesDF.collect().map(_.getString(0)).toSeq

  /** Distinct values of one label (main.rs:407-416 supports only __name__;
    * we generalize to any label). */
  def labelValuesDF(label: String): DataFrame =
    collection.select(col(Model.LabelsCol).getItem(label).as("value"))
      .filter(col("value").isNotNull).distinct().orderBy("value")

  def labelValues(label: String): Seq[String] =
    labelValuesDF(label).collect().map(_.getString(0)).toSeq
}
