package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Model

/** Partitioned store sink: the write-side counterpart of [[TsIngest]].
  *
  * Layout: `path/__metric__=<name>/part-*.parquet`, rows sorted by
  * (series key, ts) inside each file. Why this layout at 100 TB:
  *  - a metric-name selector — the mandatory first filter of every PromQL
  *    query (timeseries.rs:487-531) — becomes PARTITION PRUNING: unselected
  *    metrics are never listed, let alone read;
  *  - within a file, sorting by (skey, ts) gives parquet run-length/dict
  *    encoded label columns and time-clustered pages, so min/max page stats
  *    prune time ranges;
  *  - `__name__` is dropped from the stored label map (redundant with the
  *    partition value) and reconstructed on read.
  */
object TsSink {

  private val MetricCol = "__metric__"

  def write(collection: DataFrame, path: String): Unit =
    collection
      .withColumn(MetricCol, col(Model.LabelsCol).getItem(Model.NameLabel))
      .withColumn(Model.LabelsCol,
        map_filter(col(Model.LabelsCol), (k, _) => k =!= Model.NameLabel))
      .withColumn(Model.SkeyCol, Model.canonicalKey(col(Model.LabelsCol)))
      .repartition(col(MetricCol))
      .sortWithinPartitions(col(MetricCol), col(Model.SkeyCol), col(Model.TsCol))
      .select(MetricCol, Model.LabelsCol, Model.TsCol, Model.ValueCol)
      .write.partitionBy(MetricCol).mode("overwrite").parquet(path)

  /** Read the whole store back into the long collection model. NOTE: a
    * post-hoc `labels['__name__']` filter does NOT prune here — Catalyst
    * cannot fold a map_concat extraction onto the partition column (it
    * can't prove the stored map lacks the key). Metric-scoped queries
    * should go through [[readMetric]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    rebuild(spark.read.parquet(path))

  /** Pruned per-metric read: the name filter lands on the PARTITION column
    * before the label map is rebuilt, so unselected metrics are never
    * listed or scanned — the 100 TB point of this layout. */
  def readMetric(spark: SparkSession, path: String, name: String): DataFrame =
    rebuild(spark.read.parquet(path).filter(col(MetricCol) === name))

  private def rebuild(df: DataFrame): DataFrame =
    df.withColumn(Model.LabelsCol,
        map_concat(map(lit(Model.NameLabel), col(MetricCol)), col(Model.LabelsCol)))
      .select(Model.LabelsCol, Model.TsCol, Model.ValueCol)
}
