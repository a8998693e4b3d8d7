package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured comparison of the two [[graft.llm.Extract]] line stages —
  * `runMain graft.ExtractBench <sfDir> [reps]`:
  *
  *   A. mainContent    — posexplode → codegen'd per-line regexes →
  *                       groupBy(doc_id) re-join: ONE full corpus
  *                       shuffle, but every regex runs compiled
  *   B. mainContentRow — the same rules as array HOFs inside the row:
  *                       ZERO shuffle, but HOF lambdas evaluate
  *                       interpreted (the r17 media_resize lesson)
  *
  * The question §6 needs answered with a number, not a hunch: does the
  * shuffle saved pay for the interpreted per-line evaluation at corpus
  * scale? The workload is the text_extract_html gate's own inject
  * (nav + head chrome around every real document) over sf0.1, result
  * forced through the same count+length aggregate for both. Medians of
  * `reps` runs after one warmup each, interleaved A/B so neither side
  * owns the cold JVM. Results land in SURVEY §6.
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(
        lit("<html><head><script>nav()</script><style>p{}</style></head>" +
          "<body><nav><a href=\"/\">Home</a> <a href=\"/a\">More</a>" +
          "<a href=\"/b\">Else</a></nav><h1>T</h1><p>"),
        col("text"),
        lit("</p><div><a href=\"/c\">Terms</a> <a href=\"/d\">Privacy</a>" +
          "</div></body></html>")).as("html"))
      .localCheckpoint() // both sides read the same in-memory input

    def run(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.agg(count(lit(1)), sum(length(col("text"))), sum("n_kept")).head()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // warmup one each, then interleave
    run(graft.llm.Extract.mainContent(docs))
    run(graft.llm.Extract.mainContentRow(docs))
    val (ex, rw) = (1 to reps).map { _ =>
      (run(graft.llm.Extract.mainContent(docs)),
        run(graft.llm.Extract.mainContentRow(docs)))
    }.unzip
    println(f"""{"variant":"explode_groupby","median_sec":${median(ex)}%.3f,"runs":${ex.map(x => f"$x%.3f").mkString("[", ",", "]")}}""")
    println(f"""{"variant":"row_hof","median_sec":${median(rw)}%.3f,"runs":${rw.map(x => f"$x%.3f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
