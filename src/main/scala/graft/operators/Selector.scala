package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Model

/** PromQL label matchers `=`, `!=`, `=~`, `!~` (reference query.rs:176-218).
  *
  * Pure Catalyst expressions over the label map — equality/`rlike` on
  * `labels[name]`, so Catalyst can push the name-equality conjunct into the
  * parquet scan when the collection is stored long-form.
  *
  * Reference quirks preserved:
  *  - a series lacking the matched label NEVER matches, whatever the operator
  *    (labels.rs:295-313);
  *  - the `__name__` matcher must be a single equality
  *    (timeseries.rs:491-519); enforced by [[graft.promql.Eval]], while this
  *    operator accepts any matcher combination for standalone use.
  */
object Selector {
  sealed trait Matcher { def label: String }
  final case class Eq(label: String, value: String) extends Matcher
  final case class Ne(label: String, value: String) extends Matcher
  final case class Re(label: String, pattern: String) extends Matcher
  final case class Nre(label: String, pattern: String) extends Matcher

  def predicate(m: Matcher): Column = {
    val v = col(Model.LabelsCol).getItem(m.label)
    val test = m match {
      case Eq(_, x) => v === x
      case Ne(_, x) => v =!= x
      case Re(_, p) => v.rlike(p)
      case Nre(_, p) => !v.rlike(p)
    }
    v.isNotNull && test
  }

  def select(df: DataFrame, matchers: Seq[Matcher]): DataFrame =
    matchers.foldLeft(df)((d, m) => d.filter(predicate(m)))

  /** Metric-name selector (reference timeseries.rs:447). */
  def byName(df: DataFrame, name: String): DataFrame =
    select(df, Seq(Eq(Model.NameLabel, name)))
}
