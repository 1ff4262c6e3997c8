package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchDiff.numMap

/** Pins BenchDiff's artifact parsing: the exact-key map extraction
  * must not confuse `queries` with `session_queries`/`queries_max`/
  * `queries_anchor_ratio`, and must round-trip the bench's numeric
  * formats (-1 failures, 3-decimal floats, integer byte counts). */
class BenchDiffSpec extends AnyFunSuite {

  private val artifact =
    """{"metric":"total","value":12.345,"unit":"sec",""" +
      """"queries":{"q01_agg_basic":1.229,"q23_minhash_sig":2.500,"q83_containment":2.500,"q99_shards":-1},""" +
      """"failed":["q99_shards"],"flaky_passes":{},"mode":"isolated-min","passes":2,""" +
      """"queries_max":{"q01_agg_basic":1.400,"q23_minhash_sig":2.600,"q83_containment":9.900,"q99_shards":-1},""" +
      """"session_total":10.000,"session_queries":{"q01_agg_basic":1.300,"q23_minhash_sig":2.550,"q83_containment":2.700,"q99_shards":-1},""" +
      """"shuffle_bytes":{"q01_agg_basic":1000,"q23_minhash_sig":2000,"q83_containment":33000,"q99_shards":0},""" +
      """"shuffle_read_bytes":{"q01_agg_basic":900,"q23_minhash_sig":1800,"q83_containment":30000,"q99_shards":0},""" +
      """"spill_bytes":{"q01_agg_basic":0,"q23_minhash_sig":0,"q83_containment":0,"q99_shards":0},""" +
      """"anchor":"q01_agg_basic","anchor_sec":1.229,"sf":"/root/testdata/sf0.1"}"""

  test("numMap extracts the exact key, not its prefixed/suffixed cousins") {
    val q = numMap(artifact, "queries")
    assert(q == Map("q01_agg_basic" -> 1.229, "q23_minhash_sig" -> 2.5,
      "q83_containment" -> 2.5, "q99_shards" -> -1.0))
    // the maps that CONTAIN "queries" as a substring stay separate
    assert(numMap(artifact, "session_queries")("q83_containment") == 2.7)
    assert(numMap(artifact, "queries_max")("q83_containment") == 9.9)
    assert(numMap(artifact, "shuffle_bytes")("q83_containment") == 33000.0)
    assert(numMap(artifact, "no_such_map").isEmpty)
  }

  test("classification end-to-end on a synthetic r10-style pair") {
    // The exact r10 scenario the two-anchor design exists for: the
    // scan anchor q01 holds FLAT while the host's CPU side slows ~3×
    // — the kernel anchor q23 carries the shift, so q83 (kernel-bound,
    // moved with q23, bytes identical) classifies as host-window,
    // while q84 (bytes moved) is a plan change regardless of anchors.
    def art(q23: Double, q83: Double, q84: Double, q84bytes: Long): String =
      s"""{"queries":{"q01_agg_basic":1.2,"q23_minhash_sig":$q23,"q83_x":$q83,"q84_y":$q84},""" +
        s""""shuffle_bytes":{"q01_agg_basic":1000,"q23_minhash_sig":2000,"q83_x":5000,"q84_y":$q84bytes},""" +
        s""""shuffle_read_bytes":{"q01_agg_basic":900,"q23_minhash_sig":1800,"q83_x":4500,"q84_y":4500}}"""
    val dir = java.nio.file.Files.createTempDirectory("bdiff")
    val o = dir.resolve("old.json"); val n = dir.resolve("new.json")
    java.nio.file.Files.writeString(o, art(2.0, 2.5, 3.0, 7000))
    java.nio.file.Files.writeString(n, art(6.4, 8.0, 9.0, 9500))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.BenchDiff.main(Array(o.toString, n.toString))
    }
    val s = out.toString("UTF-8")
    assert(s.contains("q83_x") && s.contains("host-window"), s)
    assert(s.contains("q84_y") && s.contains("PLAN-CHANGE"), s)
  }

  test("--scale self-adjudicates: a mover whose bigger-sf anchor ratio held is a host window") {
    // q85 moves 3x against BOTH anchors and the fleet with identical
    // bytes (anchors flat, the rest of the fleet flat) — without
    // --scale that is UNEXPLAINED; the sf10 capture shows its anchor
    // ratio SHRANK at 100x the data, which a plan regression cannot
    // do, so the scale check certifies a host window. q86 moves the
    // same way at sf0.1 AND grew its sf10 anchor ratio 2x -> SUSPECT.
    def art(q85: Double, q86: Double): String =
      s"""{"queries":{"q01_agg_basic":1.0,"q23_minhash_sig":2.0,"q85_w":$q85,"q86_v":$q86,"q87_u":0.5},""" +
        s""""shuffle_bytes":{"q01_agg_basic":1000,"q23_minhash_sig":2000,"q85_w":5000,"q86_v":5000,"q87_u":100},""" +
        s""""shuffle_read_bytes":{"q01_agg_basic":900,"q23_minhash_sig":1800,"q85_w":4500,"q86_v":4500,"q87_u":90}}"""
    // sf10 capture of the NEW code: anchors 5x the sf0.1 values;
    // q85 only 2x (ratio shrank: 6/5 = 0.4x its sf0.1 ratio 3.0);
    // q86 10x (ratio grew: 30/5 = 2x its sf0.1 ratio 3.0)
    val scale =
      """{"queries":{"q01_agg_basic":5.0,"q23_minhash_sig":10.0,"q85_w":6.0,"q86_v":30.0,"q87_u":2.5}}"""
    val dir = java.nio.file.Files.createTempDirectory("bdiff2")
    val o = dir.resolve("old.json"); val n = dir.resolve("new.json")
    val sc = dir.resolve("sf10.json")
    java.nio.file.Files.writeString(o, art(1.0, 1.0))
    java.nio.file.Files.writeString(n, art(3.0, 3.0))
    java.nio.file.Files.writeString(sc, scale)
    def run(extra: String*): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        graft.tools.BenchDiff.main(Array(o.toString, n.toString) ++ extra)
      }
      out.toString("UTF-8")
    }
    val without = run()
    assert(without.linesIterator.exists(l => l.contains("q85_w") && l.contains("UNEXPLAINED")), without)
    val withScale = run(s"--scale=$sc")
    assert(withScale.linesIterator.exists(l =>
      l.contains("q85_w") && l.contains("host-window (scale-check passed")), withScale)
    assert(withScale.linesIterator.exists(l =>
      l.contains("q86_v") && l.contains("SUSPECT")), withScale)
    assert(!withScale.contains("UNEXPLAINED"), withScale)
  }

  test("a speedup mover with identical bytes is a recovery, never SUSPECT") {
    def art(q85: Double): String =
      s"""{"queries":{"q01_agg_basic":1.0,"q23_minhash_sig":2.0,"q85_w":$q85,"q87_u":0.5},""" +
        s""""shuffle_bytes":{"q01_agg_basic":1000,"q23_minhash_sig":2000,"q85_w":5000,"q87_u":100},""" +
        s""""shuffle_read_bytes":{"q01_agg_basic":900,"q23_minhash_sig":1800,"q85_w":4500,"q87_u":90}}"""
    val dir = java.nio.file.Files.createTempDirectory("bdiff3")
    val o = dir.resolve("old.json"); val n = dir.resolve("new.json")
    java.nio.file.Files.writeString(o, art(3.0)) // the OLD capture was the victim
    java.nio.file.Files.writeString(n, art(1.0))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.BenchDiff.main(Array(o.toString, n.toString))
    }
    val s = out.toString("UTF-8")
    assert(s.linesIterator.exists(l => l.contains("q85_w") && l.contains("recovery")), s)
    assert(!s.contains("UNEXPLAINED") && !s.contains("SUSPECT"), s)
  }
}
