package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins PLANS.md to the code: every headline query in `Plans.Headline` must
  * have a generated `## name` section, and every headline name must still be
  * a real SparkEntry query. Adding a headline query (or renaming one) without
  * re-running `runMain graft.Plans` fails here — the committed plan evidence
  * can't silently go stale the way it did between rounds 3 and 7.
  */
class PlansSpec extends AnyFunSuite {

  test("every Plans.Headline name is a SparkEntry query") {
    val missing = Plans.Headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names with no query: $missing")
  }

  test("PLANS.md has a section per headline query (regenerate via runMain graft.Plans)") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run: sbt 'runMain graft.Plans'")
    val text = Files.readString(path)
    val missing = Plans.Headline.filterNot(q => text.contains(s"## $q\n"))
    assert(missing.isEmpty,
      s"PLANS.md is stale — no section for: $missing. Run: sbt 'runMain graft.Plans'")
  }

  test("transient search plans stay shared-frame (the r17 search_rm3 17-scan regression)") {
    // The transient rankers pin their tokenized/postings/query frames
    // (Search.pin), so the EXECUTED plan re-reads the corpus at most a
    // handful of times — before the r18 fix, rm3's plan read
    // documents.parquet 17× (every consumer replayed the tokenize +
    // explode + groupBy subtree). The pin here is the verdict's "≤ 3"
    // bound, parsed from the committed PLANS.md executed: lines.
    val text = Files.readString(Paths.get("PLANS.md"))
    def scans(q: String): Int = {
      val i = text.indexOf(s"## $q\n")
      assert(i >= 0, s"PLANS.md has no section for $q")
      val m = "executed: (\\d+) parquet scan".r
        .findFirstMatchIn(text.substring(i))
      assert(m.isDefined, s"no executed: line for $q")
      m.get.group(1).toInt
    }
    for ((q, bound) <- Seq("search_bm25" -> 3, "search_ql" -> 3,
        "search_sdm" -> 3, "search_rm3" -> 3, "search_hybrid" -> 4,
        // the served family: pruned store probes, never a corpus rescan
        // (rm3's docvecs twin and sdm's bigram family each add a table)
        "search_index" -> 4, "search_rm3_index" -> 5,
        "search_ql_index" -> 4, "search_sdm_index" -> 7))
      assert(scans(q) <= bound,
        s"$q executed plan re-scans parquet ${scans(q)}× (> $bound) — " +
          "a shared frame lost its Search.pin; regenerate PLANS.md and " +
          "re-pin (runMain graft.Plans)")
  }

  test("every partition-less WindowExec in the gate plans is an explained, model-bounded frame") {
    val text = Files.readString(Paths.get("PLANS.md"))
    val header = "## partition-less windows"
    assert(text.contains(header),
      "PLANS.md predates the global-window audit — run: sbt 'runMain graft.Plans'")
    val section = text.substring(text.indexOf(header))
    // the generator writes UNEXPLAINED for any occurrence missing from
    // Plans.BoundedGlobalWindows — a corpus-sized one-task sort must
    // never land silently (it melts at scale)
    assert(!section.contains("UNEXPLAINED"),
      "unexplained partition-less window(s):\n" + section.take(2000))
    val listed = section.linesIterator
      .filter(_.startsWith("- `")).map(_.drop(3).takeWhile(_ != '`')).toSet
    // the allowlist stays live: an entry whose query no longer shows a
    // global window must be dropped, not accreted
    val stale = Plans.BoundedGlobalWindows.keys.map(_._1).toSet -- listed
    assert(stale.isEmpty, s"BoundedGlobalWindows entries no longer observed: $stale")
  }
}
