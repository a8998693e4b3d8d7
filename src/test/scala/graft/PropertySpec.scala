package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TimeParse
import graft.operators.Grid

/** Property-based invariants (raw scalacheck generators, fixed seed). */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("duration parts sum (web.rs:60-85)") {
    val part = for {
      n <- Gen.choose(0L, 999L)
      u <- Gen.oneOf("ms", "s", "m", "h", "d", "w", "y")
    } yield (n, u)
    val secsOf = Map("ms" -> 0.001, "s" -> 1.0, "m" -> 60.0, "h" -> 3600.0,
      "d" -> 86400.0, "w" -> 604800.0, "y" -> 31536000.0)
    samples(Gen.nonEmptyListOf(part)).foreach { parts =>
      val s = parts.map { case (n, u) => s"$n$u" }.mkString
      val expected = parts.map { case (n, u) => n * secsOf(u) }.sum
      val got = TimeParse.parseDurationOrThrow(s)
      assert(math.abs(got - expected) <= 1e-9 * math.max(1.0, expected), s"input $s")
    }
  }

  test("plain float durations round-trip") {
    samples(Gen.choose(0.0, 1e6)).foreach { d =>
      assert(TimeParse.parseDurationOrThrow(d.toString) == d)
    }
  }

  test("grid length/points match the reference length formula (timevectors.rs:176-180)") {
    val gen = for {
      start <- Gen.choose(-1e6, 1e6)
      span <- Gen.choose(0.001, 1e5)
      step <- Gen.choose(0.01, 1e4)
    } yield (start, start + span, step)
    samples(gen).foreach { case (start, end, step) =>
      val g = Grid(start, end, step)
      val expected = math.max(1, ((end - start + step) / step).floor.toInt)
      assert(g.length == expected)
      assert(g.length >= 1)
    }
  }

  test("metric name legalization is idempotent and always legal") {
    samples(Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString)).foreach { s =>
      val legal = Model.makeMetricNameLegal(s)
      assert(legal.matches("^[a-zA-Z_][a-zA-Z0-9_]*$"), s"input '$s' -> '$legal'")
      assert(Model.makeMetricNameLegal(legal) == legal)
    }
  }
  test("parser round-trip: fully parenthesized renderings parse to the same tree") {
    import graft.promql.{BinOp, Node, Parser, ScalarLit}
    val leaf: Gen[Node] = Gen.choose(0, 99).map(n => ScalarLit(n.toDouble))
    def tree(depth: Int): Gen[Node] =
      if (depth == 0) leaf
      else Gen.frequency(
        2 -> leaf,
        3 -> (for {
          op <- Gen.oneOf("+", "-", "*", "/", "%", "^")
          l <- tree(depth - 1)
          r <- tree(depth - 1)
        } yield BinOp(op, l, r, None, None, boolMod = false)))
    def render(n: Node): String = n match {
      case ScalarLit(v) => v.toLong.toString
      case BinOp(op, l, r, _, _, _) => s"(${render(l)} $op ${render(r)})"
      case other => fail(s"unexpected node $other")
    }
    def strip(n: Node): Node = n match {
      case BinOp(op, l, r, _, _, _) => BinOp(op, strip(l), strip(r), None, None, boolMod = false)
      case other => other
    }
    samples(tree(4)).foreach { t =>
      val parsed = Parser.parse(render(t))
      assert(strip(parsed) == strip(t), s"round-trip failed for ${render(t)}")
    }
  }

  test("resample matches an in-memory reference interpolation on random series (timeseries.rs:164-191)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // in-memory mirror of the reference semantics: clamp before-first/after-last, linear inside
    def interpRef(ts: Vector[Double], vs: Vector[Double], t: Double): Double = {
      require(ts.nonEmpty)
      if (t < ts.head) vs.head
      else if (t >= ts.last) vs.last
      else {
        val i = ts.lastIndexWhere(_ <= t)
        val (t0, t1, v0, v1) = (ts(i), ts(i + 1), vs(i), vs(i + 1))
        ((t - t0) * v1 + (t1 - t) * v0) / (t1 - t0)
      }
    }
    val seriesGen = for {
      n <- Gen.choose(1, 12)
      ts0 <- Gen.listOfN(n, Gen.choose(0.0, 1000.0))
      vs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield (ts0.distinct.sorted.toVector, vs.toVector)
    val grid = operators.Grid(-100.0, 1100.0, 97.0) // probes straddle both edges
    samples(seriesGen, n = 40).zipWithIndex.foreach { case ((ts, vs0), i) =>
      val vs = vs0.take(ts.length)
      val df = Model.withSkey(
        ts.zip(vs).toDF("ts", "value")
          .withColumn("labels", map(lit("__name__"), lit(s"m$i"))))
      val out = operators.Resample.resample(df, grid)
        .select("ts", "value").as[(Double, Double)].collect().toMap
      assert(out.size == grid.length, s"series $i: ${out.size} != ${grid.length}")
      (0 until grid.length).foreach { k =>
        val t = grid.start + k * grid.step
        val expect = interpRef(ts, vs, t)
        val got = out(t)
        assert(math.abs(got - expect) <= 1e-9 * math.max(1.0, math.abs(expect)),
          s"series $i t=$t: $got vs $expect (ts=$ts vs=$vs)")
      }
    }
  }

  test("curation invariants hold on random corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    samples(Gen.listOfN(30, docGen), n = 5).zipWithIndex.foreach { case (texts, run) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, s"s${i % 3}") }
        .toDF("doc_id", "text", "source")

      // span dedup: counts bounded, fractions in (0, 1]
      val spans = graft.llm.Curation.dedupSpans(docs, span = 4)
        .as[(Long, Long, Long, Double)].collect()
      assert(spans.length == texts.length, s"run $run")
      spans.foreach { case (id, nSpans, nKept, frac) =>
        assert(nKept <= nSpans, s"run $run doc $id")
        // 0.0 is legitimate: every chunk already seen in an earlier doc
        assert(frac >= 0.0 && frac <= 1.0, s"run $run doc $id frac $frac")
        assert((frac == 0.0) == (nKept == 0 && nSpans > 0) || nSpans == 0, s"run $run doc $id")
      }
      // every distinct chunk is kept exactly once corpus-wide
      val totalKept = spans.map(_._3).sum
      val distinctChunks = docs.withColumn("tk",
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .selectExpr("explode(transform(sequence(0, greatest(cast(ceil(size(tk)/4.0) as int)-1, 0)), c -> concat_ws(' ', slice(tk, c*4+1, 4)))) AS ch")
        .filter(col("ch") =!= "").select("ch").distinct().count()
      assert(totalKept == distinctChunks, s"run $run")

      // decontaminate: hits never exceed grams; bench docs excluded
      val dec = graft.llm.Curation.decontaminate(docs, col("doc_id") % 5 === 0, n = 3)
        .as[(Long, Long, Long, Boolean)].collect()
      dec.foreach { case (id, g, h, c) =>
        assert(id % 5 != 0 && h <= g && c == (h > 0), s"run $run doc $id")
      }

      // packing tiles exactly: sum of toks == final offset + last tok
      val packed = graft.llm.Curation.packSequences(docs, blockSize = 8L, bucketWidth = 7L)
        .orderBy("doc_id").as[(Long, Long, Long, Long, Long, Long)].collect()
      var off = 0L
      packed.foreach { case (_, tok, o, _, _, _) => assert(o == off); off += tok }
    }
  }

  test("grammar sweep: every generated well-typed expression parses AND evaluates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two series of metric m (labels h=a/h=b), 5 points each
    val collection = Model.withSkey(
      (for (h <- Seq("a", "b"); i <- 0 to 4)
        yield (i * 60.0, (i + 1) * (if (h == "a") 1.0 else -2.0), h))
        .toDF("ts", "value", "h")
        .withColumn("labels", map(lit("__name__"), lit("m"), lit("h"), col("h")))
        .drop("h"))
    val grid = operators.Grid(0.0, 240.0, 120.0)

    val sel: Gen[String] = Gen.oneOf("m", """m{h="a"}""", """m{h!="a"}""",
      """m{h=~"a|b"}""", """m{h!~"zzz"}""")
    val mathFn = Gen.oneOf("abs", "ceil", "floor", "sqrt", "exp", "ln", "log2",
      "log10", "sgn", "sin", "cos", "tan", "asin", "acos", "atan", "sinh",
      "cosh", "tanh", "asinh", "acosh", "atanh", "deg", "rad")
    val aggFn = Gen.oneOf("sum", "avg", "min", "max", "count", "group",
      "stddev", "stdvar")
    val rangeFn = Gen.oneOf("rate", "irate", "increase", "delta",
      "avg_over_time", "min_over_time", "max_over_time", "sum_over_time",
      "count_over_time", "last_over_time", "stddev_over_time",
      "stdvar_over_time", "changes", "resets", "deriv", "present_over_time",
      "mad_over_time", "idelta", "absent_over_time",
      "rate_resets", "increase_resets", "irate_resets")
    def instant(depth: Int): Gen[String] =
      if (depth == 0) sel
      else Gen.frequency(
        3 -> sel,
        2 -> (for { f <- mathFn; e <- instant(depth - 1) } yield s"$f($e)"),
        2 -> (for {
          f <- aggFn; e <- instant(depth - 1)
          mode <- Gen.oneOf("by", "without"); lbl <- Gen.oneOf("h", "nolabel")
        } yield s"$f $mode ($lbl) ($e)"),
        2 -> (for { f <- rangeFn; s <- sel } yield s"$f($s[5m])"),
        1 -> (for { f <- rangeFn; e <- instant(depth - 1) } yield s"$f(($e)[10m:5m])"),
        2 -> (for {
          op <- Gen.oneOf("+", "-", "*", "/", "^")
          l <- instant(depth - 1); r <- instant(depth - 1)
        } yield s"($l) $op ($r)"),
        1 -> (for {
          op <- Gen.oneOf("+", "-", "*", "/", "%", "^")
          e <- instant(depth - 1); k <- Gen.choose(1, 9)
        } yield s"($e) $op $k"),
        1 -> instant(depth - 1).map(e => s"clamp(($e), -10, 10)"),
        1 -> instant(depth - 1).map(e => s"round(($e), 0.001)"),
        1 -> instant(depth - 1).map(e => s"($e) * pi()"),
        1 -> (for { s <- Gen.oneOf("sort", "sort_desc"); e <- instant(depth - 1) } yield s"$s($e)"),
        1 -> instant(depth - 1).map(e => s"topk(1, $e)"),
        1 -> (for { e <- instant(depth - 1); t <- Gen.oneOf("120", "start()", "end()") } yield s"($e) @ $t"),
        1 -> (for { f <- rangeFn; e <- instant(depth - 1) } yield s"$f((($e) @ 120)[10m:5m])"),
        1 -> (for { op <- Gen.oneOf("+", "-", "*", "/"); e <- instant(depth - 1) } yield s"($e) $op time()"),
        1 -> instant(depth - 1).map(e => s"($e) / scalar(sum($e))"),
        1 -> (for { l <- instant(depth - 1); r <- instant(depth - 1) }
          yield s"($l) / on (h) group_left sum by (h) ($r)"),
        1 -> Gen.const("vector(1)"),
        1 -> Gen.const("vector(hour(time()))"),
        1 -> instant(depth - 1).map(e => s"quantile(0.5, $e)"),
        1 -> instant(depth - 1).map(e => s"timestamp($e)"),
        // round 8-10 surface: limiters, label sorters/rewriters, bucketing
        // aggs, parameterized range functions, set ops and bool comparisons
        1 -> (for {
          pre <- Gen.oneOf("limitk(2, ", "limit_ratio(0.5, ", "bottomk(1, ")
          e <- instant(depth - 1)
        } yield s"$pre$e)"),
        1 -> (for {
          f <- Gen.oneOf("clamp_min", "clamp_max")
          e <- instant(depth - 1)
        } yield s"$f($e, 0)"),
        1 -> (for {
          f <- Gen.oneOf("sort_by_label", "sort_by_label_desc")
          e <- instant(depth - 1)
        } yield s"""$f($e, "h")"""),
        1 -> instant(depth - 1).map(e =>
          s"""label_replace($e, "dst", "x-$$1", "h", "(.*)")"""),
        1 -> instant(depth - 1).map(e => s"""count_values("v", $e)"""),
        1 -> (for {
          s <- sel
          q <- Gen.oneOf(s"quantile_over_time(0.5, $s[5m])",
            s"holt_winters($s[5m], 0.5, 0.5)", s"predict_linear($s[5m], 60)")
        } yield q),
        1 -> (for {
          op <- Gen.oneOf("and", "or", "unless")
          l <- instant(depth - 1); r <- instant(depth - 1)
        } yield s"($l) $op ($r)"),
        1 -> (for {
          op <- Gen.oneOf(">", "<", ">=", "<=", "==", "!=")
          b <- Gen.oneOf("", "bool ")
          l <- instant(depth - 1); r <- instant(depth - 1)
        } yield s"($l) $op $b($r)"),
        1 -> instant(depth - 1).map(e => s"absent($e)"))
    samples(instant(3), n = 60).foreach { q =>
      val ast = graft.promql.Parser.parse(q) // must parse
      assert(ast != null)
      try {
        val rows = graft.promql.Eval.run(collection, q, grid).collect() // must eval
        assert(rows.forall(_.schema.fieldNames.contains(Model.ValueCol)), s"query $q")
      } catch {
        case e: Throwable => fail(s"query `$q` failed: ${e.getMessage.take(300)}", e)
      }
    }
  }

}
