package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.llm.Sketches

/** Streaming maintenance of the HLL and CMS sketches — completing the
  * family's continuous story next to [[StreamHeavyHitters]] (custom
  * Misra–Gries state) and [[StreamQuantile]] (bin counts).
  *
  * Both follow the same design law StreamQuantile wrote down: when a
  * sketch's MERGE operation is a commutative aggregate Spark's streaming
  * state already implements, the streaming form is the batch form on a
  * streaming frame —
  *
  *   HLL:  register merge = element-wise MAX  → `groupBy(group, idx).max(rho)`
  *   CMS:  counter merge  = cell-wise SUM     → `groupBy(j, cell).count()`
  *
  * State is the sketch itself (m registers per group / d·w counters),
  * constant in stream length — the sketch property IS the state bound.
  * Estimates read the maintained frames (model-sized) per trigger or
  * from the sink; StreamingSpec pins two-trigger folds ≡ the one-pass
  * batch sketches, registers/counters AND estimates.
  */
object StreamSketch {

  /** Streaming HLL register maintenance (update/complete mode). */
  def hllRegisters(stream: DataFrame, groupCol: String = "lang"): DataFrame =
    Sketches.hllRegisters(stream, groupCol)

  /** Streaming CMS counter-grid maintenance (update/complete mode). */
  def cmsCounters(stream: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    Sketches.cmsCounters(stream, d, w)

  /** Distinct-count estimates over maintained registers (a sink read or
    * foreachBatch snapshot). */
  def hllEstimates(regs: DataFrame, groupCol: String = "lang"): DataFrame =
    Sketches.hllEstimateFromRegisters(regs, groupCol)
}
