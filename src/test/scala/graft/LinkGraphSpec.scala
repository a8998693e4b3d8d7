package graft

import org.apache.spark.sql.functions._

import graft.llm.{Extract, LinkGraph}

/** [[graft.llm.LinkGraph]] — host edges and fixed-point PageRank: the
  * integer iteration is replicated in plain Scala and pinned EXACTLY
  * (that is the whole point of fixed-point: any partitioning, any
  * engine, same longs), plus the graph semantics — distinct-doc edge
  * weights, self-edge drop, dangling redistribution, absent-host prior.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** The spec's own fixed-point PageRank: same Scale, same integer
    * formula, sequential Scala — the DataFrame version must match it
    * long-for-long. */
  private def refPageRank(edges: Seq[(String, String, Long)],
                          iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var r = nodes.map(_ -> LinkGraph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => (r(u) / out(u)) * w }.sum
      }
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        v -> ((3L * LinkGraph.Scale) / (20L * n) +
          (17L * (contrib.getOrElse(v, 0L) + dang / n)) / 20L)
      }.toMap
    }
    r
  }

  private def ranksOf(edges: Seq[(String, String, Long)], iters: Int,
                      eager: Boolean = true): Map[String, Long] =
    LinkGraph.pageRank(edges.toDF("src_host", "dst_host", "w"), iters,
        eager = eager)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("links: every href shape extracts — quotes, protocol-relative " +
    "with port, relative, no-href, entities and inner tags in anchors") {
    val html = "<body>" +
      "<a href=\"https://alpha.example/x\">A &amp; B</a>" +
      "<a href='http://beta.example:8080/y'>c <b>d</b></a>" +
      "<a href=\"//gamma.example/z\">g</a>" +
      "<a href=\"/relative\">r</a>" +
      "<a name=\"anchor-only\">n</a></body>"
    val rows = Extract.links(Seq((7L, html)).toDF("doc_id", "html"))
      .orderBy("link_idx").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("A & B", "c d", "g", "r", "n"))
    assert(rows.map(_.getString(4)).toSeq ==
      Seq("alpha.example", "beta.example", "gamma.example", "", ""))
    assert(rows(3).getString(2) == "/relative" && rows(4).getString(2) == "")
  }

  test("hostEdges: weight counts DISTINCT docs, self-edges and hostless " +
    "rows drop") {
    val docs = Seq(
      // doc 1 links b twice (counts once) and itself (drops)
      (1L, "https://a.com/p",
        "<a href='https://b.com/1'>x</a><a href='https://b.com/2'>y</a>" +
          "<a href='https://a.com/self'>s</a>"),
      (2L, "https://a.com/q", "<a href='https://b.com/3'>z</a>"),
      (3L, "https://c.com/r", "<a href='/rel'>only relative</a>")
    ).toDF("doc_id", "url", "html")
    val e = LinkGraph.hostEdges(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(e == Set(("a.com", "b.com", 2L)))
  }

  test("pageRank: exact long-for-long match with the sequential " +
    "fixed-point reference on a mixed graph (cycle + dangling sink)") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 2L),
      ("b", "c", 1L), ("d", "a", 3L)) // c dangling, d source-only
    for (k <- Seq(1, 3, 5))
      assert(ranksOf(edges, k) == refPageRank(edges, k), s"iters=$k")
  }

  test("pageRank: dangling mass redistributes — a pure sink keeps the " +
    "graph's mass near Scale instead of leaking 85% per iteration") {
    val edges = Seq(("a", "c", 1L), ("b", "c", 1L)) // c absorbs everything
    val r = ranksOf(edges, 5)
    assert(r == refPageRank(edges, 5))
    val total = r.values.sum
    // floors bleed < nodes * iters units; anything near-Scale proves the
    // dangling term works (without it total ≈ 0.15 * Scale by iter 5)
    assert(total > (LinkGraph.Scale * 9) / 10 && total <= LinkGraph.Scale)
    assert(r("c") > r("a") && r("a") == r("b"))
  }

  test("pageRank: eager materialization changes the plan, not one long") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L),
      ("a", "c", 5L))
    assert(ranksOf(edges, 4, eager = false) == ranksOf(edges, 4))
  }

  /** The spec's own HyperBall: same md5-derived registers, same merge,
    * same round-6 estimate chain, sequential Scala. */
  private def refHarmonic(edges: Seq[(String, String)],
                          iters: Int): Map[String, (Double, Double)] = {
    def md560(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def est(m: Map[Long, Int]): Double = {
      val vz = 64 - m.size
      val sScaled = m.values.map(r => 1L << (55 - r)).sum +
        vz.toLong * (1L << 55)
      val raw = LinkGraph.HbNumerator / sScaled.toDouble
      round6(if (raw <= 160.0 && vz > 0) 64.0 * math.log(64.0 / vz) else raw)
    }
    var regs: Map[String, Map[Long, Int]] = nodes.map { v =>
      val h = md560("hb:" + v)
      val w = h / 64
      val rho =
        if (w == 0) 55 else java.lang.Long.numberOfTrailingZeros(w) + 1
      v -> Map((h % 64) -> rho)
    }.toMap
    val ests = scala.collection.mutable.ArrayBuffer(
      nodes.map(v => v -> est(regs(v))).toMap)
    for (_ <- 1 to iters) {
      regs = nodes.map { v =>
        val in = edges.filter(_._2 == v).map(e => regs(e._1))
        v -> (regs(v) +: in).reduce { (a, b) =>
          (a.keySet ++ b.keySet).map(k =>
            k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
        }
      }.toMap
      ests += nodes.map(v => v -> est(regs(v))).toMap
    }
    nodes.map { v =>
      val h = (1 to iters).foldLeft(0.0) { (acc, r) =>
        acc + (ests(r)(v) - ests(r - 1)(v)) / r.toDouble
      }
      v -> (ests(iters)(v), round6(h))
    }.toMap
  }

  test("harmonicCentrality: exact match with the sequential HyperBall " +
    "reference; path-graph ordering holds; eager ≡ pure") {
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "c"), ("a", "d"))
    val df = edges.map { case (s, d) => (s, d, 1L) }
      .toDF("src_host", "dst_host", "w")
    val got = LinkGraph.harmonicCentrality(df, 3).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val want = refHarmonic(edges, 3)
    assert(got == want, s"\ngot  $got\nwant $want")
    // c is reachable from everyone (a,b,d), a from no one
    assert(got("c")._2 > got("b")._2 && got("b")._2 > got("a")._2)
    assert(got("a")._2 == 0.0)
    val pure = LinkGraph.harmonicCentrality(df, 3, eager = false).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(pure == got)
  }

  test("docPrior: a doc on an unseen host gets rank 0, ranked hosts " +
    "join their exact fixed-point score") {
    val docs = Seq(
      (1L, "https://a.com/p", "<a href='https://b.com/x'>l</a>"),
      (2L, "https://b.com/q", "<a href='https://a.com/y'>l</a>"),
      (3L, "https://nowhere.example/r", "no links at all")
    ).toDF("doc_id", "url", "html")
    val ranks = LinkGraph.pageRank(LinkGraph.hostEdges(docs), 3)
    val prior = LinkGraph.docPrior(docs, ranks).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val expect = refPageRank(Seq(("a.com", "b.com", 1L),
      ("b.com", "a.com", 1L)), 3)
    assert(prior(1L) == ("a.com", expect("a.com")))
    assert(prior(2L) == ("b.com", expect("b.com")))
    assert(prior(3L) == ("nowhere.example", 0L))
  }
}
