package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench compact-stdout-line contract: the line must stay
  * ≤ 1800 chars (driver tail window 2000 minus sbt's success line)
  * at the LIVE query count and under adversarial values, and must
  * stay parseable JSON. The r9 verdict flagged that the old adaptive
  * decimal chain would overflow SILENTLY at ~230 queries — this spec
  * makes any such overflow a failing test before it can ship. */
class BenchFormatSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)
  private val liveNames = SparkEntry.queries.keys.toSeq.sorted

  private def line(values: Seq[Double],
                   names: Seq[String] = liveNames,
                   failed: Seq[String] = Nil,
                   flaky: Seq[(String, Int)] = Nil): String =
    BenchFormat.compactLine(names.zip(values), failed, flaky,
      "169.064", "isolated-min", 2, "bench_full.json", "/root/testdata/sf0.1")

  test("live query count with realistic values fits and parses") {
    // realistic sf0.1 profile: most queries sub-second, a heavy tail
    val vals = liveNames.zipWithIndex.map { case (_, i) =>
      if (i % 13 == 0) 3.742 else if (i % 5 == 0) 1.206 else 0.314
    }
    val l = line(vals)
    assert(l.length <= BenchFormat.MaxLen, s"len ${l.length}")
    val j = parse(l)
    assert(j.get("metric").asText == "total")
    assert(j.get("queries").size + j.path("q_zero").asInt(0) == liveNames.size)
    assert(j.get("value").asDouble == 169.064)
  }

  test("adversarial: every query ≥ 1000 s still fits via fallback tiers") {
    val l = line(liveNames.map(_ => 9999.999))
    assert(l.length <= BenchFormat.MaxLen, s"len ${l.length}")
    val j = parse(l)
    // whichever tier fired, the query population stays accounted for
    val accounted =
      if (j.has("q_count")) j.get("q_count").asInt
      else j.get("queries").size + j.path("q_zero").asInt(0)
    assert(accounted == liveNames.size)
  }

  test("adversarial: mass failure + flaky lists still fit and parse") {
    val names = liveNames
    val l = line(names.map(_ => -1.0), names = names,
      failed = names, flaky = names.map(n => (n, 2)))
    assert(l.length <= BenchFormat.MaxLen, s"len ${l.length}")
    val j = parse(l)
    if (j.has("failed_count")) assert(j.get("failed_count").asInt == names.size)
    else assert(j.get("failed").size == names.size)
  }

  test("future growth: 500 queries with adversarial values stays bounded") {
    val names = (1 to 500).map(i => f"q$i%03d_future_query_$i")
    val vals = names.map(_ => 8888.888)
    val l = line(vals, names = names, failed = names.take(250),
      flaky = names.drop(250).map(n => (n, 1)))
    assert(l.length <= BenchFormat.MaxLen, s"len ${l.length}")
    assert(parse(l).has("q_count") || parse(l).has("queries"))
  }

  test("r13: live count with an r12-like profile keeps 1-decimal resolution") {
    // r12 fleet profile: roughly half the fleet sub-0.45 s, the rest
    // 0.5–9 s. The chain must land on a 1-decimal omission tier (the
    // r12 0-decimal tier quantized the driver's round-over-round diff:
    // every 1 s↔2 s host wobble read as a 2×/0.5× step).
    val vals = liveNames.zipWithIndex.map { case (_, i) =>
      if (i % 2 == 0) 0.31 else if (i % 13 == 0) 7.06 else 1.27
    }
    val l = line(vals)
    assert(l.length <= BenchFormat.MaxLen, s"len ${l.length}")
    val j = parse(l)
    assert(j.get("queries").size + j.path("q_zero").asInt(0) == liveNames.size)
    // kept entries carry 1 decimal, and the omission threshold rides
    // along as q_lt (strictly below the 0-decimal tier's 0.5 s cut)
    assert(j.has("q_lt") && j.get("q_lt").asDouble < 0.5)
    val vs = j.get("queries").elements()
    var saw13 = false
    while (vs.hasNext) { if (vs.next().asDouble == 1.3) saw13 = true }
    assert(saw13, "expected a 1.27 s query to render as 1.3")
  }

  test("tier choice preserves per-query values when there is room") {
    // 10 queries → 2-decimal tier must win and carry exact centiseconds
    val names = (1 to 10).map(i => f"q$i%02d_small")
    val l = line(names.map(_ => 1.239), names = names)
    val j = parse(l)
    assert(j.get("queries").get("q01").asDouble == 1.24)
  }

  test("duplicate qNN prefixes fall back to full names (no key collisions)") {
    val names = Seq("q01_a", "q01_b", "q02_c")
    val j = parse(line(Seq(1.0, 2.0, 3.0), names = names))
    assert(j.get("queries").size == 3)
    assert(j.get("queries").has("q01_a") && j.get("queries").has("q01_b"))
  }
}
