package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the JVM-side hash mirror bit-for-bit to the columnar
  * expression — hmodJvm feeds the typed codec maps (q118/q119/q224)
  * and every pinned-model streaming closure, so a divergence would
  * silently shift waveform samples / model weights away from what the
  * DuckDB oracles replay. */
class ExactColsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hmodJvm equals the hmod column expression on adversarial strings") {
    import spark.implicits._
    val samples = Seq("", "a", "au:token", "multi word string",
      "sep", "ünïcodé ✓ 漢字", "0", "-1",
      "au:" + ("x" * 500), "\n\r\t", "jl:3:17") ++
      (0 until 200).map(i => s"fuzz:$i:${i * 2654435761L}")
    val viaCol = samples.toDF("s")
      .select(col("s"), ExactCols.hmod(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- samples)
      assert(ExactCols.hmodJvm(s) == viaCol(s), s"mismatch on '$s'")
  }

  test("hmodJvm is consistent across threads (thread-local digest)") {
    val expected = ExactCols.hmodJvm("cross-thread")
    val perThreadSum = (0 until 1000).map(i => ExactCols.hmodJvm(s"t:$i")).sum
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => results.add(
        (0 until 1000).map(i => ExactCols.hmodJvm(s"t:$i")).sum ->
          ExactCols.hmodJvm("cross-thread")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(r => r._1 == perThreadSum && r._2 == expected))
  }
}
