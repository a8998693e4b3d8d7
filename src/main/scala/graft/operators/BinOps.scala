package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Model

/** PromQL binary operators (extension — the reference rejects
  * `Node::Operator` with "Not implemented yet", query.rs:549-551; semantics
  * follow the Prometheus operator documentation).
  *
  * All inputs are resampled instant vectors `(skey, labels, ts, value)` on
  * the same grid, so vector-vector matching is an equi-join on
  * `(match-key, ts)` — one shuffle keyed exactly like every other per-series
  * operator, no cartesian anywhere. Output labels of an arithmetic /
  * bool-comparison result are the MATCH labels (metric name dropped, as
  * Prometheus drops it); filter-comparisons keep the input series unchanged.
  *
  * One-to-one matching is assumed (duplicate match keys on either side
  * produce join fan-out rather than Prometheus's "many-to-one matching must
  * be explicit" error — detecting that would cost an extra aggregation per
  * query; `on`/`ignoring` give the user the same control).
  */
object BinOps {

  import graft.promql.Ops

  def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    // Prometheus runs IEEE-754 float division: x/0 = ±Inf, 0/0 = NaN,
    // x%0 = NaN. Spark 4's ANSI mode (default on) instead raises
    // DIVIDE_BY_ZERO — guard the zero-divisor rows explicitly (CaseWhen
    // codegen only evaluates the taken branch, so the guarded division
    // never sees a zero). Divergence kept: a -0.0 divisor yields the +0.0
    // sign (detecting the sign bit of zero isn't worth a custom expression
    // here).
    case "/" =>
      when(r =!= 0.0, l / r)
        .otherwise(
          when(l.isNaN || (l === 0.0), lit(Double.NaN))
            .when(l > 0, lit(Double.PositiveInfinity))
            .otherwise(lit(Double.NegativeInfinity)))
    case "%" => when(r =!= 0.0, l % r).otherwise(lit(Double.NaN))
    case "^" => pow(l, r)
    case other => throw new IllegalArgumentException(s"not an arithmetic operator: '$other'")
  }

  def cmp(op: String, l: Column, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case other => throw new IllegalArgumentException(s"not a comparison operator: '$other'")
  }

  def scalarScalar(op: String, a: Double, b: Double, boolMod: Boolean): Double =
    if (Ops.isCmp(op)) {
      if (!boolMod)
        throw graft.promql.Eval.EvalException("comparisons between scalars must use BOOL modifier")
      val r = op match {
        case "==" => a == b; case "!=" => a != b
        case ">" => a > b; case "<" => a < b
        case ">=" => a >= b; case "<=" => a <= b
      }
      if (r) 1.0 else 0.0
    } else op match {
      case "+" => a + b; case "-" => a - b; case "*" => a * b
      case "/" => a / b; case "%" => a % b; case "^" => math.pow(a, b)
    }

  /** Labels minus the metric name — Prometheus drops `__name__` from any
    * arithmetic / bool-comparison result (and from the math-function
    * family, which shares this helper). */
  def dropName(df: DataFrame): DataFrame =
    df.withColumn(Model.LabelsCol,
        map_filter(col(Model.LabelsCol), (k, _) => k =!= Model.NameLabel))
      .withColumn(Model.SkeyCol, Model.canonicalKey(col(Model.LabelsCol)))

  /** vector ⊗ scalar (scalar ⊗ vector when `scalarOnRight` is false). */
  def vectorScalar(df: DataFrame, op: String, s: Double, scalarOnRight: Boolean,
                   boolMod: Boolean): DataFrame = {
    val v = col(Model.ValueCol)
    val sc = lit(s)
    def sided(f: (Column, Column) => Column): Column =
      if (scalarOnRight) f(v, sc) else f(sc, v)
    if (Ops.isCmp(op)) {
      val c = sided(cmp(op, _, _))
      if (boolMod)
        dropName(df.withColumn(Model.ValueCol, when(c, lit(1.0)).otherwise(lit(0.0))))
      else df.filter(c) // filter form keeps the series as-is, name included
    } else {
      dropName(df.withColumn(Model.ValueCol, sided(arith(op, _, _))))
    }
  }

  /** vector ⊗ per-step scalar (`time()` / `scalar(v)`): broadcast-join the
    * tiny (ts, value) step frame on ts alone and apply the op element-wise —
    * the vector side never shuffles, so this scales exactly like the
    * literal-scalar form. */
  def vectorStepScalar(df: DataFrame, op: String, step: DataFrame,
                       scalarOnRight: Boolean, boolMod: Boolean): DataFrame = {
    val joined = df.join(
      broadcast(step.withColumnRenamed(Model.ValueCol, "__sv__")), Model.TsCol)
    val v = col(Model.ValueCol)
    val sc = col("__sv__")
    def sided(f: (Column, Column) => Column): Column =
      if (scalarOnRight) f(v, sc) else f(sc, v)
    val out =
      if (Ops.isCmp(op)) {
        val c = sided(cmp(op, _, _))
        if (boolMod)
          dropName(joined.withColumn(Model.ValueCol, when(c, lit(1.0)).otherwise(lit(0.0))))
        else joined.filter(c)
      } else dropName(joined.withColumn(Model.ValueCol, sided(arith(op, _, _))))
    out.select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** per-step scalar ⊗ per-step scalar: join the two tiny frames on ts.
    * Comparison semantics follow scalar⊗scalar (bool required — enforced by
    * the evaluator; the value becomes 0/1). */
  def stepStep(l: DataFrame, r: DataFrame, op: String): DataFrame = {
    val j = l.withColumnRenamed(Model.ValueCol, "__l__")
      .join(r.withColumnRenamed(Model.ValueCol, "__r__"), Model.TsCol)
    val out =
      if (Ops.isCmp(op))
        when(cmp(op, col("__l__"), col("__r__")), lit(1.0)).otherwise(lit(0.0))
      else arith(op, col("__l__"), col("__r__"))
    j.withColumn(Model.ValueCol, out).select(Model.TsCol, Model.ValueCol)
  }

  /** The vector-matching key: `on(...)` keeps exactly those labels;
    * `ignoring(...)` drops those plus `__name__`; default drops `__name__`
    * only. */
  private def matchMap(on: Option[Seq[String]], ignoring: Option[Seq[String]]): Column =
    on match {
      case Some(names) =>
        map_filter(col(Model.LabelsCol), (k, _) => array_contains(lit(names.toArray), k))
      case None =>
        val dropped = ignoring.getOrElse(Seq.empty) :+ Model.NameLabel
        map_filter(col(Model.LabelsCol), (k, _) => !array_contains(lit(dropped.toArray), k))
    }

  /** vector ⊗ vector, one-to-one: inner join on `(match-key, ts)`.
    * Arithmetic / bool-comparison output labels are the MATCH labels;
    * filter-form comparisons pass surviving LHS series through UNCHANGED
    * (original metric name and labels), as Prometheus does. */
  def vectorVector(lhs: DataFrame, rhs: DataFrame, op: String,
                   on: Option[Seq[String]], ignoring: Option[Seq[String]],
                   boolMod: Boolean): DataFrame = {
    val mm = matchMap(on, ignoring)
    // join key is the canonical match key; the LHS's own skey/labels ride
    // along so the filter form can return the untouched input series
    val l = lhs.select(Model.canonicalKey(mm).as("__mkey__"), mm.as("__ml__"),
      col(Model.SkeyCol), col(Model.LabelsCol),
      col(Model.TsCol), col(Model.ValueCol).as("__lv__"))
    val r = rhs.select(Model.canonicalKey(mm).as("__mkey__"),
      col(Model.TsCol), col(Model.ValueCol).as("__rv__"))
    val joined = l.join(r, Seq("__mkey__", Model.TsCol))
    def matchLabeled(df: DataFrame): DataFrame =
      df.select(col("__mkey__").as(Model.SkeyCol), col("__ml__").as(Model.LabelsCol),
        col(Model.TsCol), col(Model.ValueCol))
    if (Ops.isCmp(op)) {
      val c = cmp(op, col("__lv__"), col("__rv__"))
      if (boolMod)
        matchLabeled(joined.withColumn(Model.ValueCol, when(c, lit(1.0)).otherwise(lit(0.0))))
      else // filter form: original LHS series, value included
        joined.filter(c)
          .select(col(Model.SkeyCol), col(Model.LabelsCol), col(Model.TsCol),
            col("__lv__").as(Model.ValueCol))
    } else {
      matchLabeled(joined.withColumn(Model.ValueCol, arith(op, col("__lv__"), col("__rv__"))))
    }
  }

  /** Many-to-one vector matching (`group_left` / `group_right`): the MANY
    * side keeps its full label identity (minus `__name__` for arith/bool
    * results), each of its series matched to the single one-side series
    * sharing the match key — the "ratio to group aggregate" idiom. Labels
    * listed in `include` are copied over from the one side (overwriting).
    * Plan shape: the same `(match-key, ts)` equi-join as one-to-one
    * matching; the one side is typically a per-group aggregate and AQE
    * broadcasts it when small.
    *
    * `leftIsMany` = group_left. Filter-form comparisons return the many
    * side's rows untouched, like Prometheus. */
  def vectorVectorGrouped(lhs: DataFrame, rhs: DataFrame, op: String,
                          on: Option[Seq[String]], ignoring: Option[Seq[String]],
                          boolMod: Boolean, leftIsMany: Boolean,
                          include: Seq[String]): DataFrame = {
    val mm = matchMap(on, ignoring)
    val (many, one) = if (leftIsMany) (lhs, rhs) else (rhs, lhs)
    val m = many.select(Model.canonicalKey(mm).as("__mkey__"),
      col(Model.SkeyCol), col(Model.LabelsCol),
      col(Model.TsCol), col(Model.ValueCol).as("__mv__"))
    val o = one.select(Model.canonicalKey(mm).as("__mkey__"),
      col(Model.LabelsCol).as("__ol__"),
      col(Model.TsCol), col(Model.ValueCol).as("__ov__"))
    val joined = m.join(o, Seq("__mkey__", Model.TsCol))
    val (lv, rv) =
      if (leftIsMany) (col("__mv__"), col("__ov__")) else (col("__ov__"), col("__mv__"))
    val outLabels =
      if (include.isEmpty)
        map_filter(col(Model.LabelsCol), (k, _) => k =!= Model.NameLabel)
      else map_concat(
        map_filter(col(Model.LabelsCol), (k, _) =>
          k =!= Model.NameLabel && !array_contains(lit(include.toArray), k)),
        map_filter(col("__ol__"), (k, _) => array_contains(lit(include.toArray), k)))
    def relabeled(df: DataFrame): DataFrame =
      df.withColumn(Model.LabelsCol, outLabels)
        .withColumn(Model.SkeyCol, Model.canonicalKey(col(Model.LabelsCol)))
        .select(Model.SkeyCol, Model.LabelsCol, Model.TsCol, Model.ValueCol)
    if (Ops.isCmp(op)) {
      val c = cmp(op, lv, rv)
      if (boolMod)
        relabeled(joined.withColumn(Model.ValueCol, when(c, lit(1.0)).otherwise(lit(0.0))))
      else // filter form: the many side's series pass through unchanged
        joined.filter(c)
          .select(col(Model.SkeyCol), col(Model.LabelsCol), col(Model.TsCol),
            col("__mv__").as(Model.ValueCol))
    } else {
      relabeled(joined.withColumn(Model.ValueCol, arith(op, lv, rv)))
    }
  }

  /** Single-pass fast path for the dominant many-to-one idiom
    * `v op group_left agg by (L) (v)` (same subtree both sides, on-labels =
    * by-labels): instead of resampling the vector twice and joining, the
    * group aggregate is a WINDOW over the one resampled frame partitioned
    * by (match-key, ts). Saves a full corpus re-read + the join; the
    * evaluator proves applicability structurally (Node equality) before
    * calling this. */
  def vectorGroupWindow(many: DataFrame, op: String, on: Seq[String],
                        aggName: String, boolMod: Boolean,
                        manyIsLeft: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mm = matchMap(Some(on), None)
    val keyed = many.withColumn("__mkey__", Model.canonicalKey(mm))
    val w = Window.partitionBy(col("__mkey__"), col(Model.TsCol))
    val v = col(Model.ValueCol)
    val aggCol = (aggName match {
      case "sum" => sum(v)
      case "avg" => avg(v)
      case "min" => min(v)
      case "max" => max(v)
      case "count" => count(v)
      case other => throw new IllegalArgumentException(s"no window form for '$other'")
    }).over(w)
    val withAgg = keyed.withColumn("__ov__", aggCol)
    val (lv, rv) = if (manyIsLeft) (v, col("__ov__")) else (col("__ov__"), v)
    val out =
      if (Ops.isCmp(op)) {
        val c = cmp(op, lv, rv)
        if (boolMod)
          dropName(withAgg.withColumn(Model.ValueCol, when(c, lit(1.0)).otherwise(lit(0.0))))
        else withAgg.filter(c)
      } else dropName(withAgg.withColumn(Model.ValueCol, arith(op, lv, rv)))
    out.select(Model.SkeyCol, Model.LabelsCol, Model.TsCol, Model.ValueCol)
  }

  /** `and` / `unless` / `or` set operators: semi/anti joins on
    * `(match-key, ts)`; `or` unions in the right-side rows with no left
    * match. Series keep their own labels (names included), as in Prometheus. */
  def setOp(lhs: DataFrame, rhs: DataFrame, op: String,
            on: Option[Seq[String]], ignoring: Option[Seq[String]]): DataFrame = {
    val mm = matchMap(on, ignoring)
    def keyed(df: DataFrame): DataFrame = df.withColumn("__mkey__", Model.canonicalKey(mm))
    val l = keyed(lhs)
    val rKeys = keyed(rhs).select(col("__mkey__"), col(Model.TsCol))
    op match {
      case "and" => l.join(rKeys, Seq("__mkey__", Model.TsCol), "left_semi").drop("__mkey__")
      case "unless" => l.join(rKeys, Seq("__mkey__", Model.TsCol), "left_anti").drop("__mkey__")
      case "or" =>
        val lKeys = l.select(col("__mkey__"), col(Model.TsCol))
        val extra = keyed(rhs).join(lKeys, Seq("__mkey__", Model.TsCol), "left_anti").drop("__mkey__")
        lhs.unionByName(extra)
      case other => throw new IllegalArgumentException(s"not a set operator: '$other'")
    }
  }
}
