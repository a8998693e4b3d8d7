package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.llm.Sketches

/** Streaming maintenance of the HDR-bin quantile sketch
  * ([[graft.llm.Sketches.quantileBins]]) — the continuous twin the
  * sketch family was missing (heavy hitters stream via Misra–Gries
  * state; HLL/CMS/KLL-class summaries only had batch folds).
  *
  * The design point worth writing down: the bin sketch needs NO custom
  * state operator. Its merge law is count addition per (group, bin) —
  * exactly the update Spark's built-in streaming aggregation state
  * performs — and its binning is a stateless per-row expression. So the
  * streaming form IS the batch form applied to a streaming frame: state
  * is one long per live (group, bin) cell, bounded by ≤ ~90 bins per
  * decimal order of magnitude per group regardless of stream length —
  * the sketch property, enforced by the aggregation itself. Estimates
  * ([[Sketches.quantileEstimates]]) read the maintained bins per
  * trigger (foreachBatch) or from the sink — a model-frame computation
  * (hundreds of rows per group), never a stream-sized one.
  *
  * StreamingSpec pins two-trigger streaming bins + estimates ≡ the
  * one-pass batch sketch over the same rows.
  */
object StreamQuantile {

  /** Streaming (group, bin, cnt) maintenance — use with update/complete
    * output mode. `stream` is a streaming DataFrame. */
  def bins(stream: DataFrame, valueCol: String, groupCol: String): DataFrame =
    Sketches.quantileBins(stream, valueCol, groupCol)

  /** Quantile estimates over a maintained bin frame (a sink read or a
    * foreachBatch snapshot). */
  def estimates(binFrame: DataFrame, groupCol: String,
                qs: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    Sketches.quantileEstimates(binFrame, groupCol, qs)
}
