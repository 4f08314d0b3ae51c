package graft

import org.scalatest.funsuite.AnyFunSuite

/** Completeness gate for the SCALING.md superlinearity net (r8): the
  * ladder is only a net if every catalog query is actually IN it — a
  * query added after the last probe run (or one that failed mid-probe)
  * would otherwise vanish silently while the artifact keeps claiming
  * "flagged superlinear: 0" over the full catalog. This spec makes a
  * missing row a test failure, the same way PlanBudgetSpec gates new
  * entries into the stage/byte budgets.
  *
  * Regen: sbt 'Test/runMain graft.tools.ScalingProbe [query...]' then
  * python3 tools/scaling_report.py <log> > SCALING.md (append-friendly:
  * any table row anywhere in the file counts).
  */
class ScalingLadderSpec extends AnyFunSuite {

  test("every catalog query has a SCALING.md ladder row") {
    val src = scala.io.Source.fromFile("SCALING.md")(scala.io.Codec.UTF8)
    val lines = try src.getLines().toList finally src.close()
    val rowName = """^\|\s*([A-Za-z0-9_]+)\s*\|""".r
    val present = lines
      .flatMap(l => rowName.findFirstMatchIn(l).map(_.group(1)))
      .filter(_ != "query").toSet
    val missing = SparkEntry.queries.keySet -- present
    assert(missing.isEmpty,
      s"SCALING.md has no ladder row for: ${missing.toSeq.sorted.mkString(", ")} " +
        "(run graft.tools.ScalingProbe for them and regenerate/append)")
  }

  test("SCALING.md reports no failed/incomplete measurements") {
    val src = scala.io.Source.fromFile("SCALING.md")(scala.io.Codec.UTF8)
    val text = try src.mkString finally src.close()
    assert(!text.contains("FAILED/INCOMPLETE"),
      "SCALING.md carries failed/incomplete probe rows — rerun the probe " +
        "for them; a query absent from the exponent table is the " +
        "likely-worst one")
  }
}
