package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.ExactCols._

/** Ad-hoc stage profiler (dev tool; not part of the driver contract).
  * Forces full evaluation via a hash-of-all-columns aggregate so
  * column pruning can't skip the projections being measured. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // aggregate over the hash itself (not count) — an aggregate that
    // references no columns lets ColumnPruning drop the hash projection
    // and all upstream per-row compute, understating stage costs
    def force(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col).toSeq: _*)).as("h"))
        .agg(count(col("h")), max(col("h"))).collect().head.getLong(0)
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = force(df)
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    // ---------- q24 stages ----------
    val docs = t(spark, d, "documents")
    val shTbl = docs
      .select(col("doc_id"), shingles(tokens(col("text")), 3, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
    time("q24 shTbl") { shTbl }
    val ex = shTbl.select(col("doc_id"), explode(col("sh")).as("sg"))
      .select(col("doc_id"), hmod(col("sg")).as("h"))
    time("q24 exploded hashes") { ex }
    val mhAggs = (0 until 8).map { j =>
      min((lit(2L * j + 1) * col("h") + lit(j.toLong * j + 7)) % P).as(s"mh$j")
    }
    val sigs = ex.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    time("q24 sigs") { sigs }
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", col(s"mh${2 * b}").cast("string"),
          col(s"mh${2 * b + 1}").cast("string")).as("sig"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    time("q24 bands") { bands }
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    time("q24 cand") { cand }
    val jac = cand
      .join(shTbl.select(col("doc_id").as("a_id"), col("sh").as("ash")), "a_id")
      .join(shTbl.select(col("doc_id").as("b_id"), col("sh").as("bsh")), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("ash"), col("bsh"))).cast("double") /
          size(array_union(col("ash"), col("bsh"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    time("q24 full") { jac }
    // self-join recomputes the signature subtree per side; the persist
    // option materializes the capped band table once
    time("q24 front door persist=off") { graft.queries.Dedup.nearDupPairs(docs) }
    time("q24 front door persist=on") {
      graft.queries.Dedup.nearDupPairs(docs,
        graft.queries.Dedup.LshConfig(persistSignatures = true))
    }
    spark.catalog.clearCache()

    // ---------- q55 stages (prefix-filtered all-pairs jaccard) ----------
    val hset = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3, distinct = true)).as("sg"))
      .select(col("doc_id"), hmod(col("sg")).as("h"))
      .distinct()
    time("q55 hset") { hset }
    val rare = hset.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select(col("h"))
    val kept55 = hset.join(rare, "h")
    time("q55 kept") { kept55 }
    val docsArr = kept55.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    time("q55 docsArr") { docsArr }
    val plen = (col("n") - greatest(floor(lit(0.3) * col("n")), lit(1.0))
      .cast("long") + 1).cast("int")
    val prefix = docsArr
      .select(col("doc_id"), col("n"), posexplode(slice(col("hs"), lit(1), plen)))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("p"), col("col").as("h"))
    time("q55 prefix") { prefix }
    val alpha = lit(0.3 / 1.3) * (col("a.n") + col("b.n"))
    val ub = lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))
    val candJoin = prefix.as("a").join(prefix.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        ub >= alpha - lit(0.5))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    time("q55 cand rows (pre-distinct)") { candJoin }
    val cand55 = candJoin.distinct()
    time("q55 cand distinct") { cand55 }
    time("q55 full") { graft.queries.Dedup.ngramJaccardPairs(docs, 0.3) }

    // ---------- q29 stages ----------
    val iv = t(spark, d, "embeddings")
      .select(col("vec_id"), iscale(col("embedding")).as("v"))
      .withColumn("nrm", inorm(col("v")))
      .withColumn("bucket",
        (0 until 6).map { k =>
          when(element_at(col("v"), k + 1) >= 0L, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _))
    time("q29 iv") { iv }
    val q = iv.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val joined = iv.join(broadcast(q),
        col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", icosine(col("qv"), col("v"), col("qn"), col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    time("q29 joined") { joined }
    joined.explain("formatted")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val fin = joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    time("q29 full") { fin }

    spark.stop()
  }
}
