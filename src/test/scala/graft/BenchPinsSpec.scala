package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pin-file governance: the bench's end-of-run re-time pass is driven by
  * BENCH_PINS.json, parsed as real JSON. A structure change or a
  * malformed edit must DISABLE the pass (no pins) rather than silently
  * half-parse — half-parsed pins would drop re-time protection for an
  * arbitrary subset of queries while looking healthy. */
class BenchPinsSpec extends AnyFunSuite {

  private def write(content: String): java.nio.file.Path = {
    val p = Files.createTempFile("graft_pins", ".json")
    p.toFile.deleteOnExit()
    Files.write(p, content.getBytes("UTF-8"))
    p
  }

  test("well-formed pins parse; the committed BENCH_PINS.json itself " +
       "parses non-empty") {
    val p = write("""{"q01_pricing_summary": 0.5, "q02_filter": 1.25}""")
    assert(Bench.loadPins(p) ==
      Map("q01_pricing_summary" -> 0.5, "q02_filter" -> 1.25))
    val committed = java.nio.file.Paths.get("BENCH_PINS.json")
    assume(Files.exists(committed))
    val pins = Bench.loadPins(committed)
    assert(pins.size > 100, s"committed pins parsed to ${pins.size} entries")
    assert(pins.values.forall(v => v > 0 && v < 600))
  }

  test("negative: malformed JSON yields NO pins (re-time disabled), " +
       "never a half-parse") {
    // truncated object — the regex parser this replaced would have
    // happily matched the lines before the break
    val truncated = write("""{"q01": 0.5, "q02": 1.2""")
    assert(Bench.loadPins(truncated).isEmpty)
    val garbage = write("not json at all")
    assert(Bench.loadPins(garbage).isEmpty)
    val missing = java.nio.file.Paths.get("/nonexistent/graft/pins.json")
    assert(Bench.loadPins(missing).isEmpty)
  }

  test("non-numeric and nested values are skipped, numeric siblings " +
       "survive (structure changes cannot silently break governance)") {
    val mixed = write(
      """{"q01": 0.5, "comment": "hand edit", "meta": {"round": 16},
         |"q02": 2.0, "q03": null}""".stripMargin)
    assert(Bench.loadPins(mixed) == Map("q01" -> 0.5, "q02" -> 2.0))
  }
}
