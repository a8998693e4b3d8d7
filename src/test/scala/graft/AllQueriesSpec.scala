package graft

/** Every SparkEntry query must plan and execute at sf0.001 — the same
  * contract the driver's Verify run exercises at sf0.01. */
class AllQueriesSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a PARTITION-LESS window (a
    * single-partition global sort — the `WindowExec: No Partition Defined`
    * warning). A global window is only acceptable on a MODEL-SIZED frame
    * (bounded by a knob — vocab size, merge count, stats rows — never by
    * corpus size); any query growing one outside this list fails below,
    * turning "we believe those are fine" into a regression gate. */
  private val GlobalWindowAllowed: Set[String] = Set(
    "bpe_train", "bpe_roundtrip", "text_tokens_bpe", // merge-rank frames ≤ vocab knob
    "vocab_build",                                   // band ranks over the vocab
    "mix_budget", "mix_temperature",                 // per-source banded cutoffs (sources, not docs)
    "dsir_weight",                                   // source-mass normalizer (one row per source)
    "mix_cluster",                                   // per-bucket λ over `buckets`-knob rows
    "sample_stratified",                             // per-stratum quota frame
    "embed_pca", "embed_project",                    // component/variance rows ≤ k
    "classifier_train", "text_classifier",           // feature-weight rows ≤ vocab knob
    "pack_blocks", "pack_tok",                       // bucket bases: corpus/bucketWidth rows
    "pack_ffd",                                      // bin-count bases: one row per bucket
    "shard_balanced",                                // distinct-token-count offsets (value-bounded)
    "q18_topn", "limitk", "limit_ratio", "topk")     // final global top-N over aggregated rows

  test("every registered query executes; every oracle key has a query") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ListBuffer[String]()
    val rogueWindows = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val n = df.count()
        if (n < 0) failures += s"$name: negative count"
        // enumerate partition-less windows and bound each one's INPUT
        // (window ops are 1:1, so the child count is the frame the single
        // task sorts); 20k rows at sf0.001 would already mean the frame
        // scales with the corpus, not a knob
        val globals = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty && !GlobalWindowAllowed.contains(name))
          rogueWindows += s"$name (${globals.size} global windows)"
        globals.foreach { w =>
          val rows = org.apache.spark.sql.GraftPlanProbe.rowsOf(spark, w.child)
          if (rows > 20000)
            rogueWindows += s"$name: global window over $rows rows"
        }
      } catch {
        case e: Exception => failures += s"$name: ${e.toString.take(200)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(rogueWindows.isEmpty,
      s"partition-less windows outside the allowlist (or unbounded): " +
        rogueWindows.mkString("; "))
    // every oracle refers to an existing query
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    // every query is oracle-checked (multimodal_features gained a SQL oracle
    // in r3 — the stub codec is deterministic)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only: $rowsOnly")
  }
}
