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
}
