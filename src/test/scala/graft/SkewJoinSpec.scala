package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain inner join, incl. dim-side multiplicity") {
    val big = (0L until 200L).map(i => (i, if (i % 10 < 9) "hot" else s"k$i"))
      .toDF("id", "key")
    // dim has TWO rows for 'hot' — multiplicity must be preserved
    val dim = Seq(("hot", 1), ("hot", 2), ("k9", 3), ("k19", 4), ("zz", 5))
      .toDF("key", "payload")
    val got = SkewJoin.salted(big, dim, "key", col("id"), nSalts = 4)
      .select("id", "key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    val want = big.join(dim, "key").select("id", "key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    assert(got == want)
    assert(got.count(_._2 == "hot") == 180 * 2) // both hot dim rows matched
  }

  test("null salt source never drops a row with a non-null join key") {
    val big = Seq((Some(1L), "hot"), (None, "hot"), (None, "k2"), (Some(4L), "k2"))
      .toDF("id", "key")
    val dim = Seq(("hot", 10), ("k2", 20)).toDF("key", "payload")
    val got = SkewJoin.salted(big, dim, "key", col("id"), nSalts = 4)
      .select("key", "payload")
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    val want = big.join(dim, "key").select("key", "payload")
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(got == want)
    assert(got.size == 4) // incl. both null-id rows
  }

  test("salting splits the hot key's partition: max task rows shrink ~nSalts×") {
    val n = 4000
    // 90% of rows on one key — the straggler shape
    val big = (0 until n).map(i => (i.toLong, if (i % 10 < 9) "hot" else s"k$i"))
      .toDF("id", "key")
    def maxPart(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id()).count()
        .agg(max("count")).head().getLong(0)
    val unsalted = maxPart(big.repartition(64, col("key")))
    val salted = maxPart(big
      .withColumn("__salt__", pmod(crc32(col("id").cast("string")), lit(8L)))
      .repartition(64, col("key"), col("__salt__")))
    // unsalted: the hot key's 3600 rows share one partition; salted: ~450
    assert(unsalted >= 3600, s"unsalted max $unsalted")
    assert(salted <= unsalted / 3, s"salted max $salted vs unsalted $unsalted")
  }
}
