package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal metadata query: the relational face of the binary-
  * payload pipeline (graft.multimodal). Payloads are opaque bytes;
  * everything aggregable about them (sizes, checksums, dedup state)
  * is computed without interpreting the content, so the plan is
  * identical for real media. Feature extraction itself is covered by
  * MultimodalSpec (the decode kernel is a stub — not oracle-checkable
  * in SQL, deliberately). */
object Media {

  val entries: Vector[Q] = Vector(

    // per-source payload accounting + content-hash dedup counts
    Q("q42_multimodal_meta", (s, d) => {
      t(s, d, "documents")
        .select(col("source"),
          encode(col("text"), "UTF-8").as("payload"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_media"),
          sum(octet_length(col("payload"))).as("total_bytes"),
          max(octet_length(col("payload"))).cast("long").as("max_bytes"),
          countDistinct(md5(col("payload"))).as("distinct_payloads"))
        .orderBy(col("source"))
    }, Some("""
      SELECT source, count(*) AS n_media,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_payloads
      FROM documents GROUP BY 1 ORDER BY 1"""))
  )
}
