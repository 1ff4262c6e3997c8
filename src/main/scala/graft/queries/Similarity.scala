package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.ExactCols._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * q28 is the exact brute-force baseline: broadcast the (small) query
  * set against the full vector table — one pass over the vectors, no
  * shuffle of the big side; per-query top-k via a window over the
  * query partition. At 100 TB the vector side stays partitioned and
  * only top-k rows per query survive the window — but the compare
  * count is |Q|·n.
  *
  * q29 is the scale path: a 6-bit sign-LSH signature (random-
  * hyperplane family, here axis-aligned planes on the first 6
  * dimensions — data-independent and reproducible; widen the
  * signature as the corpus grows to keep E[bucket size] bounded)
  * buckets vectors;
  * queries only compare within their bucket. Cost drops from |Q|·n to
  * |Q|·E[bucket size] at a recall tradeoff; multi-probe (flipping
  * low-confidence bits) is the standard recall knob and composes with
  * this plan unchanged.
  *
  * Int-scaled exact math throughout (ExactCols): results are
  * partition-order-independent and bit-reproducible in DuckDB.
  */
object Similarity {

  private def signBits(v: Column): Column =
    (0 until 6).map { k =>
      when(element_at(v, k + 1) >= 0L, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val ivCte =
    """iv AS (
      SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) v
      FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(CAST(list_sum([x*x for x in v]) AS DOUBLE)) nrm FROM iv)"""

  private val sqlCos =
    "CAST(list_sum(list_transform(generate_series(1,len(q.qv)), i -> q.qv[i]*n.v[i])) AS DOUBLE)/(q.qn*n.nrm)"

  val entries: Vector[Q] = Vector(

    // brute-force cosine top-5 for each query vector (vec_id % 100 = 0)
    Q("q28_ann_brute_topk", (s, d) => {
      val iv = t(s, d, "embeddings")
        .select(col("vec_id"), iscale(col("embedding")).as("v"))
        .withColumn("nrm", inorm(col("v")))
      val q = iv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      iv.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("cosine", icosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy(col("query_id"), col("rk"))
    }, Some(s"""
      WITH $ivCte
      SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) rk
        FROM (
          SELECT q.vec_id query_id, n.vec_id neighbor_id, $sqlCos cosine
          FROM (SELECT vec_id, v qv, nrm qn FROM n WHERE vec_id % 100 = 0) q(vec_id, qv, qn),
               n
          WHERE n.vec_id <> q.vec_id))
      WHERE rk <= 5 ORDER BY query_id, rk""")),

    // sign-LSH bucketed top-3: compare only within the query's bucket
    Q("q29_ann_lsh_topk", (s, d) => {
      val iv = t(s, d, "embeddings")
        .select(col("vec_id"), iscale(col("embedding")).as("v"))
        .withColumn("nrm", inorm(col("v")))
        .withColumn("bucket", signBits(col("v")))
      val q = iv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      iv.join(broadcast(q),
          col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
        .withColumn("cosine", icosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("query_id"), col("rk"))
    }, Some(s"""
      WITH $ivCte,
      b AS (
        SELECT vec_id, v, nrm,
          CAST(list_sum([CASE WHEN v[k+1] >= 0 THEN (1::BIGINT << k) ELSE 0 END
                         for k in generate_series(0,5)]) AS BIGINT) bucket
        FROM n)
      SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) rk
        FROM (
          SELECT q.vec_id query_id, n.vec_id neighbor_id, $sqlCos cosine
          FROM (SELECT vec_id, v qv, nrm qn, bucket qb FROM b WHERE vec_id % 100 = 0)
                 q(vec_id, qv, qn, qb),
               b n
          WHERE n.bucket = q.qb AND n.vec_id <> q.vec_id))
      WHERE rk <= 3 ORDER BY query_id, rk"""))
  )
}
