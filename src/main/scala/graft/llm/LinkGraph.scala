package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-level LINK GRAPH analytics over a crawl — the quality prior the
  * big web pipelines actually use: CCNet/RefinedWeb-class curation ranks
  * HOSTS (Common Crawl publishes host-level ranks; harmonic centrality
  * and PageRank are the two published choices) and feeds the rank into
  * document filtering, because page-level quality scores can be gamed a
  * page at a time while a host's in-link profile cannot. The chain here
  * is `html → out-links ([[Extract.links]]) → host edges → PageRank →
  * per-document prior`, completing the crawl stack: WARC bytes in
  * ([[Warc]]), content out ([[Extract]]), URL policy ([[Curation
  * .domainDedup]]), and now GRAPH policy.
  *
  * PageRank (Page, Brin, Motwani & Winograd 1999) runs in FIXED-POINT
  * integer arithmetic — rank mass is `Scale` = 10^12 long units, every
  * division is integer `div`, every sum is a long sum. Two reasons, both
  * load-bearing:
  *
  *   1. EXACTNESS ACROSS ENGINES AND PARTITIONINGS: long addition is
  *      associative-commutative, so the rank vector is bit-identical
  *      regardless of shuffle order, partition count, or engine — the
  *      DuckDB oracle ([[oraclePageRankSql]], the same unrolled
  *      iteration chain) hash-matches without any rounding escape
  *      hatch, and a re-run on a different cluster layout reproduces
  *      the same priors (float PageRank does neither: its sums are
  *      order-dependent).
  *   2. OVERFLOW-PROOF BY CONSTRUCTION: the per-edge contribution is
  *      `(rank div out_w) * w`, never `(rank * w) div out_w` — since
  *      `w ≤ out_w` (a host's total out-weight includes each edge), the
  *      product is ≤ rank ≤ Scale, so no intermediate exceeds ~17·10^12
  *      no matter how heavy an edge gets at 100 TB. The cost is a floor
  *      per edge (< w/Scale of one host's rank — at Scale 10^12,
  *      noise), paid for never having to reason about 128-bit math.
  *
  * Per iteration: `r'(v) = (3·Scale) div (20·N)  +  (17·(in(v) +
  * dang div N)) div 20` — damping 0.85 = 17/20 exactly, teleport
  * 0.15 = 3/20, `dang` the summed rank of DANGLING hosts (no
  * out-edges: the classic uniform redistribution, without which every
  * sink leaks 85% of its mass per iteration). Floors bleed a few units
  * of mass per host per iteration (bounded in LinkGraphSpec); rank is a
  * quality SCORE, not a probability, so the bleed is irrelevant — what
  * matters is the ORDER and the exactness, and both hold.
  *
  * Scale shape: `hostEdges` is one aggregation keyed by (src, dst) host
  * pair; each PageRank iteration is one shuffle of the EDGE list (join
  * ranks on src, groupBy dst) plus broadcast-sized side frames (the
  * one-row N, the one-row dangling sum) — the canonical distributed
  * PageRank plan. Iterations compose as one declarative plan at gate
  * scale; at corpus scale pass `checkpointIterations = true` and each
  * iteration's rank frame localCheckpoints, cutting the lineage so the
  * k-th iteration does not replay the first k−1 (values are identical
  * either way — integer arithmetic does not care where it runs; the
  * spec pins eager ≡ pure). The host-rank table is tiny compared
  * to the corpus (hosts ≪ documents), so [[docPrior]]'s final join
  * broadcasts.
  */
object LinkGraph {

  /** Rank mass carried per unit of probability: 10^12 long units. */
  val Scale: Long = 1000000000000L

  /** Host→host edge list from a crawl frame (doc_id, url, html):
    * (src_host, dst_host, w) — src from the document's own URL, dst from
    * its absolute out-links, `w` = number of DISTINCT linking documents
    * (one page linking a host 400 times counts once: the cheap
    * link-spam guard), self-edges and hostless rows dropped. */
  def hostEdges(docs: DataFrame, urlCol: String = "url",
                htmlCol: String = "html"): DataFrame = {
    val src = docs.select(col("doc_id"),
      Extract.urlHostSpark(col(urlCol)).as("src_host"))
    Extract.links(docs, htmlCol)
      .select(col("doc_id"), col("host").as("dst_host"))
      .filter(col("dst_host") =!= "")
      .join(src, "doc_id")
      .filter(col("src_host") =!= "" && col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count_distinct(col("doc_id")).as("w"))
  }

  /** Fixed-point PageRank over an edge list (src_host, dst_host, w):
    * (host, rank_fp, rank) — `rank_fp` the exact long fixed-point score
    * (the gate's hash target), `rank` its double view `rank_fp / Scale`
    * (exact: rank_fp < 2^53). Node set = every host appearing on either
    * side. `iterations` fixed and small (the score stabilizes fast on
    * power-law graphs; the published host-rank tables use O(10)).
    *
    * `eager` (default TRUE) localCheckpoints the shared frames — edges,
    * nodes, out-weights once, and each iteration's rank vector. This is
    * the codebase's shared-frame rule and here it is NOT optional tuning:
    * every iteration consumes the previous ranks THREE times (contrib,
    * dangling, carry) and the edge frame twice, so the pure declarative
    * plan re-derives the whole upstream per consumer and blows up
    * ~3^k — measured 636 parquet scans / 1014 exchanges at k=4 against
    * eager's 1 scan / ~20 exchanges. `eager = false` exists for the spec
    * that pins the two modes long-for-long equal (integer arithmetic
    * does not care where it runs). */
  def pageRank(edges: DataFrame, iterations: Int = 4,
               eager: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def pin(df: DataFrame): DataFrame = if (eager) df.localCheckpoint() else df
    val e = pin(edges.select(col("src_host"), col("dst_host"),
      col("w").cast("long").as("w")))
    val nodes = pin(e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct())
    val nFrame = nodes.agg(count(lit(1)).as("n")) // one row — broadcasts
    val outW = pin(e.groupBy(col("src_host"))
      .agg(sum(col("w")).as("out_w")))

    var ranks = nodes.crossJoin(broadcast(nFrame))
      .select(col("host"), expr(s"${Scale}L div n").as("r"))
    for (_ <- 1 to iterations) {
      // per-edge contribution (rank div out_w) * w — see object doc for
      // why this order: w <= out_w makes it overflow-proof
      val contrib = e
        .join(ranks.withColumnRenamed("host", "src_host"), "src_host")
        .join(outW, "src_host")
        .groupBy(col("dst_host").as("host"))
        .agg(sum(expr("(r div out_w) * w")).as("c"))
      val dang = ranks
        .join(outW.withColumnRenamed("src_host", "host"), Seq("host"),
          "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang")) // one row
      val next = ranks.select(col("host"))
        .join(contrib, Seq("host"), "left")
        .crossJoin(broadcast(nFrame)).crossJoin(broadcast(dang))
        .select(col("host"), expr(
          s"(3L * ${Scale}L) div (20L * n) + " +
            "(17L * (coalesce(c, 0L) + dang div n)) div 20L").as("r"))
      ranks = pin(next)
    }
    ranks.select(col("host"), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** The per-document quality prior: each document tagged with its own
    * host's rank — (doc_id, host, rank_fp, rank); hosts absent from the
    * graph (no resolvable links in or out) get rank 0, NOT the teleport
    * floor: a host the graph never saw has no evidence, and 0 sorts it
    * below every ranked host. Broadcast join — the rank table is
    * hosts-sized. */
  def docPrior(docs: DataFrame, ranks: DataFrame,
               urlCol: String = "url"): DataFrame =
    docs.select(col("doc_id"),
      Extract.urlHostSpark(col(urlCol)).as("host"))
      .join(broadcast(ranks), Seq("host"), "left")
      .select(col("doc_id"), col("host"),
        coalesce(col("rank_fp"), lit(0L)).as("rank_fp"),
        coalesce(col("rank"), lit(0.0)).as("rank"))

  // ------------------------------------------- HyperBall harmonic rank

  /** HyperBall register count m = 64 (p = 6, rel. error 1.04/√64 ≈ 13%
    * — the precision band the published web-scale runs use; the point
    * of HyperBall is that exact per-node BFS state is O(V²) while a
    * counter is 64 registers regardless of graph size). The 60-bit
    * [[Dedup.md5Hash60]] splits 6/54. */
  val HbM = 64
  private val HbMaxRank = 55 // 54-bit remainder all-zero → rank 55
  private val HbScale = 1L << HbMaxRank
  private val HbAlpha = 0.709 // the published α₆₄
  /** α·m²·2^55 as ONE double literal shared with the oracle. */
  val HbNumerator: Double = HbAlpha * (HbM.toDouble * HbM) * HbScale.toDouble

  /** register frame → (host, est): the [[Sketches]] estimate discipline
    * at m = 64 — exact scaled-BIGINT register sum, one division, the
    * linear-counting small-range branch, round-6. */
  private def hbEstimate(regs: DataFrame, estCol: String): DataFrame =
    regs.groupBy("host")
      .agg(count(lit(1)).as("__used__"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $HbMaxRank - mreg))")
          .as("__s_used__"))
      .withColumn("__vz__", lit(HbM.toLong) - col("__used__"))
      .withColumn("__raw__", lit(HbNumerator) /
        (col("__s_used__") + col("__vz__") * lit(HbScale)).cast("double"))
      .select(col("host"), round(
        when(col("__raw__") <= lit(2.5 * HbM) && col("__vz__") > 0,
          lit(HbM.toDouble) * log(lit(HbM.toDouble) /
            col("__vz__").cast("double")))
          .otherwise(col("__raw__")), 6).as(estCol))

  /** HARMONIC CENTRALITY by HyperBall (Boldi & Vigna 2013 — the
    * algorithm AND the ranking behind the published Common Crawl host
    * ranks): each host carries a 64-register HLL counter of its in-ball
    * (the set of hosts that can REACH it); one iteration merges every
    * counter along its out-edges (register-wise max — HLL's union),
    * so after r rounds host v's counter estimates |B_r(v)| and
    * `harmonic(v) = Σ_r (|B_r| − |B_{r−1}|)/r` — nodes at distance r
    * weighted 1/r, the centrality that (unlike closeness) handles
    * disconnected graphs gracefully. Truncated at `iterations` (the
    * published runs converge in O(diameter) ≈ O(10) on web graphs).
    *
    * Exactness discipline: registers are INTEGER maxes (order-free);
    * each per-round estimate is the [[Sketches]]-style single division
    * rounded at 6; the harmonic sum is ONE fixed left-associated
    * expression over the k rounded estimates — so the gate is
    * hash-exact, like [[pageRank]] but for an approximate algorithm:
    * the approximation is in the MATH (±13% cardinalities), not in the
    * execution, which is bit-reproducible.
    *
    * Scale shape: state is m rows per host (sparse registers); one
    * iteration = one edge join + one (host, idx) max-aggregate, both
    * map-side combinable; same eager-materialization rule as
    * [[pageRank]] (the counter frame is consumed twice per round).
    * Returns (host, reach_est, harmonic). */
  def harmonicCentrality(edges: DataFrame, iterations: Int = 4,
                         eager: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def pin(df: DataFrame): DataFrame = if (eager) df.localCheckpoint() else df
    val e = pin(edges.select(col("src_host"), col("dst_host")).distinct())
    val nodes = pin(e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct())
    var regs = pin(nodes
      .withColumn("__h__", Dedup.md5Hash60(concat(lit("hb:"), col("host"))))
      .select(col("host"), (col("__h__") % HbM).as("idx"),
        expr(s"__h__ div $HbM").as("__w__"))
      .withColumn("mreg", expr(
        s"CASE WHEN __w__ = 0 THEN $HbMaxRank " +
          "ELSE CAST(bit_count((__w__ & -__w__) - 1) + 1 AS INT) END"))
      .drop("__w__"))
    var wide = hbEstimate(regs, "e0")
    for (r <- 1 to iterations) {
      val flowed = e
        .join(regs.withColumnRenamed("host", "src_host"), "src_host")
        .select(col("dst_host").as("host"), col("idx"), col("mreg"))
      regs = pin(regs.unionByName(flowed)
        .groupBy("host", "idx").agg(max(col("mreg")).as("mreg")))
      wide = wide.join(hbEstimate(regs, s"e$r"), "host")
    }
    val harmonic = (1 to iterations)
      .map(r => s"(e$r - e${r - 1}) / $r.0")
      .mkString(" + ")
    wide.select(col("host"), col(s"e$iterations").as("reach_est"),
      expr(s"round($harmonic, 6)").as("harmonic"))
  }

  /** DuckDB replay of [[harmonicCentrality]] over `rel`: the k merge
    * rounds unroll into register/estimate CTE pairs of the identical
    * arithmetic. Yields (host, reach_est, harmonic). */
  def oracleHarmonicSql(rel: String, iterations: Int = 4,
                        preamble: String = ""): String = {
    val num = HbNumerator.toString
    def estCte(r: Int): String =
      s"""s$r AS (SELECT host, round(CASE WHEN raw <= ${2.5 * HbM} AND
         |      vz > 0 THEN ${HbM}.0 * ln(${HbM}.0 / CAST(vz AS DOUBLE))
         |      ELSE raw END, 6) AS est
         |  FROM (SELECT host, $HbM - CAST(count(*) AS BIGINT) AS vz,
         |      $num / CAST(sum((1::BIGINT) << ($HbMaxRank - mreg)) +
         |        ($HbM - count(*)) * $HbScale AS DOUBLE) AS raw
         |    FROM g$r GROUP BY host))""".stripMargin
    val iters = (1 to iterations).map { r =>
      s"""g$r AS (SELECT host, idx, max(mreg) AS mreg FROM (
         |    SELECT host, idx, mreg FROM g${r - 1}
         |    UNION ALL
         |    SELECT ed.dst_host AS host, g.idx, g.mreg
         |    FROM ed JOIN g${r - 1} g ON ed.src_host = g.host)
         |  GROUP BY 1, 2),
         |${estCte(r)}""".stripMargin
    }.mkString(",\n")
    val harmonic = (1 to iterations)
      .map(r => s"(s$r.est - s${r - 1}.est) / $r.0")
      .mkString(" + ")
    val joins = (0 to iterations)
      .map(r => s"JOIN s$r ON n.host = s$r.host").mkString(" ")
    s"""WITH $preamble${oracleEdgeCtes(rel)},
       |ed AS (SELECT DISTINCT src_host, dst_host FROM e),
       |g0 AS (SELECT host, CAST(h % $HbM AS BIGINT) AS idx,
       |    CASE WHEN h // $HbM = 0 THEN $HbMaxRank
       |      ELSE bit_count(((h // $HbM) & -(h // $HbM)) - 1) + 1 END AS mreg
       |  FROM (SELECT host,
       |      ('0x' || substr(md5('hb:' || host), 1, 15))::BIGINT AS h
       |    FROM nodes)),
       |${estCte(0)},
       |$iters
       |SELECT n.host, s$iterations.est AS reach_est,
       |  round($harmonic, 6) AS harmonic
       |FROM nodes n $joins""".stripMargin
  }

  /** [[docPrior]] as a column attachment: the input frame with
    * `host_rank_fp` / `host_rank` added (absent hosts 0, same
    * convention) and every original column kept — what a pipeline stage
    * wants. Broadcast host join: ZERO corpus shuffle, unlike a doc_id
    * join of two corpus-sized frames. */
  def withDocPrior(docs: DataFrame, ranks: DataFrame,
                   urlCol: String = "url"): DataFrame =
    docs.withColumn("__lg_host__", Extract.urlHostSpark(col(urlCol)))
      .join(broadcast(ranks.select(col("host").as("__lg_host__"),
        col("rank_fp"), col("rank"))), Seq("__lg_host__"), "left")
      .withColumn("host_rank_fp", coalesce(col("rank_fp"), lit(0L)))
      .withColumn("host_rank", coalesce(col("rank"), lit(0.0)))
      .drop("__lg_host__", "rank_fp", "rank")

  /** The CTE chain shared by [[oraclePageRankSql]] and
    * [[oracleDocPriorSql]]: link extraction → edge aggregation → k
    * unrolled iteration triples (contribution / dangling sum / next
    * rank) of the SAME integer arithmetic (`//` is DuckDB's integer
    * division; operands are non-negative so trunc ≡ floor ≡ Spark's
    * `div`). The final rank relation is `r<iterations>` (host, r). */
  /** Shared edge-derivation CTEs (`lnk`, `e`, `nodes`, `nn`) — the DuckDB
    * twin of [[hostEdges]]. */
  private def oracleEdgeCtes(rel: String): String = {
    val links = Extract.oracleLinksSql(rel)
    s"""lnk AS ($links),
       |e AS (SELECT s.src_host, l.host AS dst_host,
       |    CAST(count(DISTINCT l.doc_id) AS BIGINT) AS w
       |  FROM (SELECT doc_id, host FROM lnk WHERE host <> '') l
       |  JOIN (SELECT doc_id, ${Extract.urlHostSql("url")} AS src_host
       |      FROM $rel) s ON l.doc_id = s.doc_id
       |  WHERE s.src_host <> '' AND s.src_host <> l.host
       |  GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT host FROM (
       |  SELECT src_host AS host FROM e
       |  UNION ALL SELECT dst_host FROM e)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)""".stripMargin
  }

  private def oracleCtes(rel: String, iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (SELECT e.dst_host AS host, sum((r.r // o.out_w) * e.w) AS c
         |  FROM e JOIN $prev r ON e.src_host = r.host
         |    JOIN outw o ON e.src_host = o.src_host GROUP BY 1),
         |d$i AS (SELECT coalesce(sum(r.r), 0) AS dang FROM $prev r
         |  LEFT JOIN outw o ON r.host = o.src_host WHERE o.src_host IS NULL),
         |r$i AS (SELECT n.host,
         |    (3 * ${Scale}) // (20 * (SELECT n FROM nn)) +
         |    (17 * (coalesce(c.c, 0) + (SELECT dang FROM d$i) //
         |      (SELECT n FROM nn))) // 20 AS r
         |  FROM nodes n LEFT JOIN c$i c ON n.host = c.host)""".stripMargin
    }.mkString(",\n")
    s"""${oracleEdgeCtes(rel)},
       |outw AS (SELECT src_host, sum(w) AS out_w FROM e GROUP BY 1),
       |r0 AS (SELECT host, ${Scale} // (SELECT n FROM nn) AS r FROM nodes),
       |$iters""".stripMargin
  }

  /** DuckDB replay of [[hostEdges]] → [[pageRank]] over `rel`
    * (doc_id, url, html): yields (host, rank_fp, rank). `preamble` lets
    * the caller prepend its own fixture CTEs (`"crawl AS (…), "`). */
  def oraclePageRankSql(rel: String, iterations: Int = 4,
                        preamble: String = ""): String =
    s"""WITH $preamble${oracleCtes(rel, iterations)}
       |SELECT host, CAST(r AS BIGINT) AS rank_fp,
       |  CAST(r AS DOUBLE) / CAST(${Scale} AS DOUBLE) AS rank
       |FROM r$iterations""".stripMargin

  /** DuckDB replay of the full chain through [[docPrior]] over `rel`:
    * yields (doc_id, host, rank_fp, rank) with the same absent-host → 0
    * convention. */
  def oracleDocPriorSql(rel: String, iterations: Int = 4,
                        preamble: String = ""): String =
    s"""WITH $preamble${oracleCtes(rel, iterations)}
       |SELECT d.doc_id, d.host,
       |  coalesce(CAST(r.r AS BIGINT), 0) AS rank_fp,
       |  coalesce(CAST(r.r AS DOUBLE) / CAST(${Scale} AS DOUBLE), 0.0) AS rank
       |FROM (SELECT doc_id, ${Extract.urlHostSql("url")} AS host FROM $rel) d
       |LEFT JOIN r$iterations r ON d.host = r.host""".stripMargin
}
