package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Model

/** `label_replace` / `label_join` (PromQL extension; Prometheus semantics).
  * Pure map manipulation + skey recompute — no shuffle. */
object Labels {

  private def setLabel(labels: Column, dst: String, value: Column): Column = {
    // empty result removes the label (Prometheus semantics)
    val without = map_filter(labels, (k, _) => k =!= dst)
    when(value === "", without)
      .otherwise(map_concat(without, map(lit(dst), value)))
  }

  private def rekey(df: DataFrame): DataFrame =
    df.withColumn(Model.SkeyCol, Model.canonicalKey(col(Model.LabelsCol)))

  /** `label_replace(v, dst, replacement, src, regex)`: if the FULLY-ANCHORED
    * regex matches the (possibly missing → "") src label value, dst is set to
    * the replacement with `$1`-style capture references; otherwise the series
    * is unchanged. */
  def labelReplace(df: DataFrame, dst: String, replacement: String,
                   src: String, regex: String): DataFrame = {
    val anchored = s"^(?:$regex)$$"
    val srcVal = coalesce(col(Model.LabelsCol).getItem(src), lit(""))
    val newLabels = when(srcVal.rlike(anchored),
        setLabel(col(Model.LabelsCol), dst, regexp_replace(srcVal, anchored, replacement)))
      .otherwise(col(Model.LabelsCol))
    rekey(df.withColumn(Model.LabelsCol, newLabels))
  }

  /** `label_join(v, dst, sep, src1, src2, ...)`: dst = src values joined by
    * sep (missing labels join as ""). */
  def labelJoin(df: DataFrame, dst: String, sep: String, srcs: Seq[String]): DataFrame = {
    val joined = concat_ws(sep,
      srcs.map(s => coalesce(col(Model.LabelsCol).getItem(s), lit(""))): _*)
    rekey(df.withColumn(Model.LabelsCol, setLabel(col(Model.LabelsCol), dst, joined)))
  }
}
