package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Model

/** Native (exponential/sparse) histograms — the Prometheus data model that
  * succeeds classic `Le`-bucket histograms: ONE sample per (series,
  * instant) carrying the whole distribution as sparse bucket arrays, with
  * resolution set by a `schema` integer (bucket i covers
  * `(base^(i-1), base^i]` where `base = 2^(2^-schema)`; higher schema =
  * finer buckets).
  *
  * The reference implements only classic histograms (metricstore.rs:389-524
  * — `Le<float>` columns exploded into `_bucket` series); this operator is
  * the forward-looking extension for stores written by Prometheus ≥ 2.40
  * remote-write or OTel exponential histograms.
  *
  * Frame layout (one row per series instant — see [[schema]]):
  *   labels, ts, nh_schema, nh_zero_count, nh_sum, nh_count,
  *   nh_pos_idx: array<int> (ascending), nh_pos_cnt: array<double>
  *
  * Negative-spectrum buckets are deliberately out of scope for this first
  * cut (latency/size metrics — the overwhelming native-histogram use case —
  * are non-negative); the zero bucket IS handled. Scale story:
  *
  *  - [[quantile]] is MAP-ONLY: the whole distribution rides in-row, so
  *    the bucket walk is an `aggregate()` HOF over the sparse arrays —
  *    zero shuffles, fully codegen-compatible, embarrassingly parallel at
  *    any corpus size (contrast classic histogram_quantile, which must
  *    first group bucket SERIES by instant).
  *  - [[merge]] is the classic-shape aggregation (sum of histograms
  *    across series): explode the sparse arrays, ONE groupBy on
  *    (group-labels, ts, bucket-idx) — group size bounded by series
  *    count per bucket — then re-collect the sparse form. Mixed schemas
  *    within a group downscale to the coarsest member (Prometheus
  *    semantics); a strict mode raises instead.
  */
object NativeHistogram {

  /** The canonical column set; a frame is "native-histogram shaped" if it
    * carries these on top of (labels, ts). */
  val Columns: Seq[String] = Seq("nh_schema", "nh_zero_count", "nh_sum",
    "nh_count", "nh_pos_idx", "nh_pos_cnt")

  def schema: StructType = StructType(Seq(
    StructField(Model.LabelsCol, MapType(StringType, StringType)),
    StructField(Model.TsCol, DoubleType),
    StructField("nh_schema", IntegerType),      // resolution: base = 2^(2^-schema)
    StructField("nh_zero_count", DoubleType),   // observations in [-zt, zt]
    StructField("nh_sum", DoubleType),
    StructField("nh_count", DoubleType),        // zero_count + Σ pos counts
    StructField("nh_pos_idx", ArrayType(IntegerType)),  // ascending, sparse
    StructField("nh_pos_cnt", ArrayType(DoubleType))))

  /** Upper bound of bucket `idx` at resolution `sch`: `2^(idx * 2^-sch)`. */
  private def upperBound(idx: Column, sch: Column): Column =
    pow(lit(2.0), idx.cast(DoubleType) * pow(lit(2.0), -sch.cast(DoubleType)))

  /** Synthesize native histograms from raw value samples — the ingest path
    * for stores that only have classic per-observation rows: every
    * (series, ts) group becomes ONE native-histogram row. `v > 0` lands in
    * bucket `ceil(log2(v) * 2^sch)`; `v <= 0` goes to the zero bucket (a
    * simplification of Prometheus's zero-threshold machinery, documented).
    *
    * The log2 product is rounded to 9 decimals before ceil so the bucket
    * index is reproducible across engines (libm vs JVM log differ in the
    * last ULP; exact powers of two are exact in both). Two groupBys, both
    * keyed on the bounded (series, ts[, idx]) — the same shuffle budget as
    * any sum-by; the sparse arrays come out sorted. */
  def fromSamples(samples: DataFrame, sch: Int): DataFrame = {
    val idx = ceil(round(log2(col(Model.ValueCol)) * lit(math.pow(2.0, sch)), 9))
      .cast(IntegerType)
    samples
      .withColumn("__i__", when(col(Model.ValueCol) > 0, idx))
      .groupBy(col(Model.SkeyCol), col(Model.TsCol), col("__i__"))
      .agg(first(Model.LabelsCol).as(Model.LabelsCol),
        count(lit(1)).cast(DoubleType).as("cnt"),
        sum(Model.ValueCol).as("vsum"))
      .groupBy(col(Model.SkeyCol), col(Model.TsCol))
      .agg(first(Model.LabelsCol).as(Model.LabelsCol),
        sum(when(col("__i__").isNull, col("cnt")).otherwise(lit(0.0)))
          .as("nh_zero_count"),
        sum("vsum").as("nh_sum"),
        sum("cnt").as("nh_count"),
        sort_array(collect_list(when(col("__i__").isNotNull,
          struct(col("__i__").as("i"), col("cnt").as("c"))))).as("bs"))
      .select(col(Model.LabelsCol), col(Model.TsCol),
        lit(sch).as("nh_schema"), col("nh_zero_count"), col("nh_sum"),
        col("nh_count"),
        transform(col("bs"), b => b("i")).as("nh_pos_idx"),
        transform(col("bs"), b => b("c")).as("nh_pos_cnt"))
  }

  /** Snap native-histogram samples onto the query grid: for each (series,
    * grid instant), the LATEST histogram row whose ts falls in the
    * one-step lookback window `(grid_t - step, grid_t]` — Prometheus
    * staleness semantics with lookback = step. Linear interpolation (the
    * classic resample) is undefined between whole distributions, so
    * last-known-value is the correct snap. Same bounded windowExplode +
    * one groupBy shape as any `*_over_time`. */
  def snapToGrid(nh: DataFrame, grid: Grid): DataFrame =
    RangeAgg.windowExplode(nh, grid, grid.step)
      .groupBy(col(Model.SkeyCol), col("__k__"))
      .agg(max_by(struct((Model.LabelsCol +: Columns).map(col): _*),
        col(Model.TsCol)).as("h"))
      .select(Seq(col(Model.SkeyCol), RangeAgg.gridTs(grid).as(Model.TsCol)) ++
        (Model.LabelsCol +: Columns).map(c => col(s"h.$c")): _*)

  /** `histogram_quantile(q, <native>)`: per row, locate the bucket whose
    * cumulative count reaches `rank = q * count` walking zero bucket then
    * positive buckets ascending, and interpolate linearly inside it
    * (Prometheus native-histogram interpolation). Edges follow classic
    * histogram_quantile: q < 0 → -Inf, q > 1 → +Inf, empty → NaN; rank
    * inside the zero bucket → 0.0; q = 1 → upper bound of the last bucket.
    *
    * Map-only: no shuffle, no UDF — one `aggregate()` fold over the
    * in-row sparse arrays. */
  def quantile(df: DataFrame, q: Double): DataFrame = {
    val total = col("nh_zero_count") + coalesce(
      aggregate(col("nh_pos_cnt"), lit(0.0), (a, x) => a + x), lit(0.0))
    val rank = lit(q) * total
    // fold state: (cum count so far, found result or NaN)
    val init = struct(col("nh_zero_count").as("cum"), when(
      rank <= col("nh_zero_count") && col("nh_zero_count") > 0, lit(0.0))
      .otherwise(lit(Double.NaN)).as("res"))
    val walked = aggregate(
      zip_with(col("nh_pos_idx"), col("nh_pos_cnt"), (i, c) => struct(i.as("i"), c.as("c"))),
      init,
      (acc, b) => {
        val lower = upperBound(b("i") - 1, col("nh_schema"))
        val upper = upperBound(b("i"), col("nh_schema"))
        val within = (rank - acc("cum")) / b("c")
        struct(
          (acc("cum") + b("c")).as("cum"),
          when(isnan(acc("res")) && acc("cum") + b("c") >= rank && b("c") > 0,
            lower + (upper - lower) * within)
            .otherwise(acc("res")).as("res"))
      },
      acc => acc("res"))
    // q = 1 lands exactly on the last cumulative count and is found by the
    // walk; rank beyond total (fp wobble) clamps to the last upper bound.
    val lastUpper = when(size(col("nh_pos_idx")) > 0,
      upperBound(element_at(col("nh_pos_idx"), -1), col("nh_schema")))
      .otherwise(lit(0.0))
    val value =
      when(lit(q) < 0, lit(Double.NegativeInfinity))
        .when(lit(q) > 1, lit(Double.PositiveInfinity))
        .when(total === 0, lit(Double.NaN))
        .otherwise(coalesce(nullifNaN(walked), lastUpper))
    df.select(col(Model.LabelsCol), col(Model.TsCol), value.as(Model.ValueCol))
  }

  private def nullifNaN(c: Column): Column = when(!isnan(c), c)

  /** Estimated count of observations ≤ `x` (positive spectrum + zero
    * bucket): whole buckets below `x` count fully, the straddling bucket
    * linearly — each bucket's contribution is independent, so this is an
    * order-free transform + sum, no walk needed. */
  private def cdfCount(x: Column): Column = {
    val contribs = transform(
      zip_with(col("nh_pos_idx"), col("nh_pos_cnt"),
        (i, c) => struct(i.as("i"), c.as("c"))),
      b => {
        val lower = upperBound(b("i") - 1, col("nh_schema"))
        val upper = upperBound(b("i"), col("nh_schema"))
        when(upper <= x, b("c"))
          .when(lower < x, b("c") * (x - lower) / (upper - lower))
          .otherwise(lit(0.0))
      })
    when(x < 0, lit(0.0)).otherwise(
      col("nh_zero_count") + coalesce(
        aggregate(contribs, lit(0.0), (a, v) => a + v), lit(0.0)))
  }

  /** `histogram_fraction(lo, hi, <native>)`: estimated fraction of
    * observations in `[lo, hi]` — the native-histogram sibling of
    * histogram_quantile (Prometheus 2.40+). Map-only like [[quantile]];
    * empty histograms yield NaN (guarded — Spark 4 ANSI would otherwise
    * raise DIVIDE_BY_ZERO). */
  def fraction(df: DataFrame, lo: Double, hi: Double): DataFrame = {
    val total = col("nh_zero_count") + coalesce(
      aggregate(col("nh_pos_cnt"), lit(0.0), (a, x) => a + x), lit(0.0))
    val frac = greatest(cdfCount(lit(hi)) - cdfCount(lit(lo)), lit(0.0)) / total
    df.select(col(Model.LabelsCol), col(Model.TsCol),
      when(total === 0, lit(Double.NaN)).otherwise(frac).as(Model.ValueCol))
  }

  /** `histogram_sum` / `histogram_count` / `histogram_avg` (Prometheus
    * 2.40+): scalar extracts of the in-row distribution — pure column
    * selects, map-only. */
  def sumOf(df: DataFrame): DataFrame = scalarOf(df, col("nh_sum"))
  def countOf(df: DataFrame): DataFrame = scalarOf(df, col("nh_count"))
  def avgOf(df: DataFrame): DataFrame =
    scalarOf(df, when(col("nh_count") > 0, col("nh_sum") / col("nh_count"))
      .otherwise(lit(Double.NaN)))
  private def scalarOf(df: DataFrame, v: Column): DataFrame =
    df.select(col(Model.LabelsCol), col(Model.TsCol), v.as(Model.ValueCol))

  /** Sum of native histograms across series, `by` retained label names —
    * the `sum by (...)` of the native world. One explode + one groupBy on
    * (group-labels, ts, bucket-idx) + one sorted re-collect.
    *
    * Mixed resolutions within a group follow Prometheus: every member is
    * DOWNSCALED to the group's coarsest schema before bucket counts merge
    * — `d = s - s_tgt` halvings map bucket `i` to `ceil(i / 2^d)` (each
    * coarse bucket `(base^(2^d·(j-1)), base^(2^d·j)]` absorbs exactly the
    * fine buckets with `2^d·(j-1) < i ≤ 2^d·j`; the division is dyadic and
    * the indexes small, so the double `ceil` is exact). The target schema
    * is a `min` window over the same (group, ts) partitioning the merge
    * shuffles on anyway. `downscaleMixed = false` restores the strict
    * pre-r10 guard: a mixed-schema group raises instead of merging —
    * for stores where a schema change signals a config error rather than
    * Prometheus's adaptive bucket scaling. */
  def merge(df: DataFrame, by: Seq[String],
            downscaleMixed: Boolean = true): DataFrame = {
    val groupLabels = map_from_arrays(
      array(by.map(lit(_)): _*),
      array(by.map(b => col(Model.LabelsCol).getItem(b)): _*))
    // maps can't be grouping keys — shuffle on the canonical skey of the
    // RETAINED label set (same trick as Aggregate.aggBy), labels ride along
    val base0 = df.withColumn("__gl__", groupLabels)
      .withColumn("__gk__", Model.canonicalKey(col("__gl__")))
    val base =
      if (downscaleMixed)
        base0.withColumn("__stgt__", min("nh_schema").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__gk__"), col(Model.TsCol))))
      else base0.withColumn("__stgt__", col("nh_schema"))
    val keyed = base.select(col("__gk__"), col("__gl__"), col(Model.TsCol),
        col("nh_schema"), col("__stgt__"),
        explode_outer(arrays_zip(col("nh_pos_idx"), col("nh_pos_cnt"))).as("b"))
      .withColumn("__ri__", ceil(col("b.nh_pos_idx").cast(DoubleType) /
        pow(lit(2.0), (col("nh_schema") - col("__stgt__")).cast(DoubleType)))
        .cast(IntegerType))
    val bucketAgg0 = keyed
      .groupBy(col("__gk__"), col(Model.TsCol), col("__ri__"))
      .agg(first("__gl__").as("__gl__"), sum(col("b.nh_pos_cnt")).as("cnt"),
        min("nh_schema").as("s_min"), max("nh_schema").as("s_max"),
        first("__stgt__").as("__stgt__"))
    // in strict mode the guard rides the OUTPUT schema column so column
    // pruning can't drop it: a mixed-schema group raises instead of
    // silently merging incompatible bucket boundaries
    val bucketAgg = bucketAgg0.withColumn("s_chk",
      if (downscaleMixed) col("__stgt__")
      else when(col("s_min") === col("s_max"), col("s_min"))
        .otherwise(raise_error(concat(lit("mixed nh_schema in merge group: "),
          col("s_min").cast(StringType), lit(" vs "),
          col("s_max").cast(StringType))).cast(IntegerType)))
    val buckets = bucketAgg
      .groupBy(col("__gk__"), col(Model.TsCol))
      .agg(first("__gl__").as(Model.LabelsCol), first("s_chk").as("nh_schema"),
        sort_array(collect_list(when(col("__ri__").isNotNull,
          struct(col("__ri__").as("i"), col("cnt").as("c"))))).as("bs"))
    val scalars = base0
      .groupBy(col("__gk__"), col(Model.TsCol))
      .agg(sum("nh_zero_count").as("nh_zero_count"),
        sum("nh_sum").as("nh_sum"), sum("nh_count").as("nh_count"))
    buckets.join(scalars, Seq("__gk__", Model.TsCol))
      .select(col(Model.LabelsCol), col(Model.TsCol), col("nh_schema"),
        col("nh_zero_count"), col("nh_sum"), col("nh_count"),
        transform(col("bs"), b => b("i")).as("nh_pos_idx"),
        transform(col("bs"), b => b("c")).as("nh_pos_cnt"))
  }
}
