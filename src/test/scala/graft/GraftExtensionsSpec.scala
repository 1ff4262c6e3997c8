package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native kernels through the SQL registration surface, plus
  * direct-eval/codegen agreement. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("registered SQL functions evaluate the native kernels") {
    GraftExtensions.registerOn(spark)
    val r = spark.sql(
      """SELECT long_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d,
                long_sq_dist(array(1L,2L), array(4L,6L)) AS s,
                sorted_intersect_count(array(1L,3L,5L,9L), array(2L,3L,4L,5L)) AS ic,
                word_ngrams(array('a','b','c','d'), 2, false) AS g,
                word_ngrams(array('a','b','a','b'), 2, true) AS gd,
                set_hit_count(array('the','cat','the'), 'the', 'a') AS hc,
                alnum_count('ab, 12!') AS ac,
                alpha_word_count(array('ab','12','c3','')) AS aw,
                winnow_fingerprint(array('a b c'), 4) AS wf,
                term_counts(array('the','cat','the'), 'the', 'a') AS tc,
                block_hash(array('a','b','c','d'), 2) AS bh,
                iscale(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT))) AS sc""").head()
    assert(r.getAs[Long]("d") == 32L)
    assert(r.getAs[Long]("s") == 25L)
    assert(r.getAs[Long]("ic") == 2L)
    assert(r.getAs[scala.collection.Seq[String]]("g").toSeq ==
      Seq("a b", "b c", "c d"))
    assert(r.getAs[scala.collection.Seq[String]]("gd").toSeq ==
      Seq("a b", "b a"))
    assert(r.getAs[Long]("hc") == 2L)
    assert(r.getAs[Long]("ac") == 4L)
    assert(r.getAs[Long]("aw") == 2L)
    assert(r.getAs[org.apache.spark.sql.Row]("wf").getAs[Long]("n_fp") == 1L)
    assert(r.getAs[scala.collection.Seq[Long]]("tc").toSeq == Seq(2L, 0L))
    assert(r.getAs[scala.collection.Seq[Long]]("bh").toSeq.length == 2)
    assert(r.getAs[scala.collection.Seq[Long]]("sc").toSeq == Seq(500000L, -1250000L))
  }

  test("extension injector exposes the same function set") {
    val names = GraftExtensions.functions.map(_._1)
    assert(names == Seq("long_dot", "long_sq_dist", "sorted_intersect_count",
      "set_hit_count", "alnum_count", "alpha_word_count",
      "positional_fingerprint", "token_stats", "winnow_fingerprint",
      "word_ngrams", "term_counts", "block_hash", "iscale"))
    // constructing the injector must not throw
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("kernel eval matches the declarative zip_with/aggregate forms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(100).select(
      transform(sequence(lit(1), lit(64)), i => i * (col("id") + 1)).as("a"),
      transform(sequence(lit(1), lit(64)), i => i + col("id")).as("b"))
    val both = df.select(
      graft.functions.VectorExprs.longDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("IScale kernel matches transform(round(x*1e6)) bit-for-bit incl. half cases") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random embedding-scale floats plus engineered .5-boundary values
    // ((2j+1)/2e6 — the decimal-vs-binary HALF_UP divergence zone),
    // negatives, zero, subnormals, and extremes
    val adversarial = (0 until 2000).map(j => ((2 * j + 1) / 2e6).toFloat) ++
      (0 until 2000).map(j => (-(2 * j + 1) / 2e6).toFloat) ++
      Seq(0.0f, -0.0f, 1e-9f, -1e-9f, Float.MinPositiveValue, 0.4999995f,
        -0.4999995f, 123.4567f, -98.76543f)
    val vecs = (0 until 200).map(_ =>
      (0 until 32).map(_ => (rnd.nextFloat() - 0.5f) * 2f).toArray) ++
      adversarial.grouped(32).map(_.toArray)
    val df = vecs.toDF("v")
    val both = df.select(
      graft.functions.VectorExprs.iscale(col("v")).as("fast"),
      transform(col("v"),
        x => round(x.cast("double") * 1000000d).cast("long")).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("IQuantSym kernel matches transform(round(x*127/s)) bit-for-bit incl. half cases") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val s = 0.9371d // an absmax-scale constant, deliberately ugly
    // engineered values whose x·127/s lands near k + 0.5 (the HALF_UP
    // divergence band), plus negatives, zero, and extremes; |q| ≤ 127
    // requires |x| ≤ s, so clamp the adversarial grid inside ±s
    val adversarial = (0 until 2000).map { j =>
      (((2 * j % 253 + 1) * 0.5 + (j % 7) * 1e-7) * s / 127d).toFloat *
        (if (j % 2 == 0) 1f else -1f)
    } ++ Seq(0.0f, -0.0f, s.toFloat, -s.toFloat, 1e-9f, Float.MinPositiveValue)
    val vecs = (0 until 200).map(_ =>
      (0 until 32).map(_ => (rnd.nextFloat() - 0.5f) * 2f * s.toFloat).toArray) ++
      adversarial.grouped(32).map(_.toArray)
    val df = vecs.toDF("v")
    val both = df.select(
      graft.functions.VectorExprs.iquantSym(col("v"), s).as("fast"),
      transform(col("v"),
        x => round(x.cast("double") * 127d / s).cast("long")).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0)
    // symmetry: sign survives quantization (the property q62's
    // unsigned codec lacks, and the reason cosine still works)
    val q = df.select(graft.functions.VectorExprs.iquantSym(col("v"), s).as("q"),
        col("v")).selectExpr("posexplode(q) as (i, qi)", "v")
      .selectExpr("qi", "CAST(v[i] AS DOUBLE) xi")
    assert(q.filter(col("qi") * col("xi") < 0).count() == 0)
  }
}
