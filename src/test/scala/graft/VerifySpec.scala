package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-independence guard: a sample of gate queries must run green
  * at BOTH driver scale factors with identical schemas (the working
  * notes' cross-check, pinned in CI). Catches operators whose construction
  * breaks away from the sf it was calibrated on — driver-collected
  * stats, hard-coded thresholds, partition-count assumptions — before
  * the driver's CORRECTNESS gate does.
  *
  * Queries chosen cheap-but-representative: scan+agg (q01), pushdown
  * filter (q03), per-row compute + agg (q16), driver-scalar stats
  * pass (q62), two-level profile (q63), custom physical operator
  * (q64). Full-oracle value checks stay with the driver's DuckDB
  * compare (tools/check_oracle.py); this spec guards execution +
  * shape at both sfs inside `sbt test`.
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val sample = Seq(
    "q01_agg_basic", "q03_match_exact_in", "q16_wordcount",
    "q62_quantize_int8", "q63_column_profile", "q64_bottomk_sample")

  for (q <- sample) {
    test(s"$q runs at sf0.001 and sf0.01 with one schema") {
      val results = sfs.map { sf =>
        val df = SparkEntry.queries(q)(spark, sf)
        val n = df.count()
        (sf, df.schema, n)
      }
      assert(results.forall(_._3 > 0),
        s"empty result: ${results.map(r => s"${r._1}=${r._3}")}")
      assert(results.map(_._2).distinct.size == 1,
        s"schema drift across sfs: ${results.map(_._2)}")
    }
  }

  test("oracle surface is closed: every query has oracle SQL and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "queries/oracleSql keys diverge: " +
        (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet) + " / " +
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet))
  }
}
