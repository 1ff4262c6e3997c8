package graft.miw

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Schema-compilation coverage: every format shipped with the
  * reference (miw/formats dir, including the production formats
  * whose integration tests are disabled upstream) must parse into a
  * LogFormat and compile into a runnable Spark plan. (SURVEY §5:
  * "add the disabled-test format files as schema-compilation
  * tests".) The reference dialect is lax JSON — trailing commas,
  * string-typed pos values — which LogFormat.parse tolerates. */
class FormatCompileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val formatDirs = Seq(
    new java.io.File("/root/reference/miw/formats"),
    new java.io.File("/root/reference/miw/formats/tests"))

  private def formatFiles: Seq[java.io.File] =
    formatDirs.filter(_.isDirectory)
      .flatMap(_.listFiles().toSeq)
      .filter(f => f.getName.endsWith(".json"))
      .sortBy(_.getName)

  test("reference format files exist") {
    assert(formatFiles.nonEmpty, "no reference formats found (read-only tree moved?)")
  }

  for (f <- formatFiles) {
    test(s"parses and compiles: ${f.getParentFile.getName}/${f.getName}") {
      val fmt = LogFormat.parseFile(f.getPath)
      assert(fmt.fields.nonEmpty, "no fields parsed")
      assert(fmt.resolvedFields.forall(_.pos >= 0), "unresolved field position")
      // compile to a full plan over empty input and force analysis
      val df = MiwEngine.runOnLines(spark, fmt, Seq.empty)
      df.schema // analysis
      assert(df.count() == 0)
    }
  }
}
