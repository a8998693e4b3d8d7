package graft

/** Every SparkEntry query must plan and execute at sf0.001 — the same
  * contract the driver's Verify run exercises at sf0.01. */
class AllQueriesSpec extends SparkSpec {

  test("every registered query executes; every oracle key has a query") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        if (n < 0) failures += s"$name: negative count"
      } catch {
        case e: Exception => failures += s"$name: ${e.toString.take(200)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // every oracle refers to an existing query
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    // every query is oracle-checked (multimodal_features gained a SQL oracle
    // in r3 — the stub codec is deterministic)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only: $rowsOnly")
  }
}
