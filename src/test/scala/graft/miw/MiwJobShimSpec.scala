package graft.miw

import org.scalatest.funsuite.AnyFunSuite

/** The python job-control shim (tools/miw_job.py — analog of the
  * reference's python/miw_job.py entry point) must keep its template
  * semantics: its --selftest asserts the reference's default command
  * template expands against MiwCli-understood flags. */
class MiwJobShimSpec extends AnyFunSuite {
  test("tools/miw_job.py --selftest passes") {
    val p = new ProcessBuilder("python3", "tools/miw_job.py", "--selftest")
      .directory(new java.io.File("."))
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"selftest failed:\n$out")
    assert(out.contains("selftest OK"), out)
  }
}
