package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.Pipeline

/** Batch ≡ stream for the corpus-prep operators a streaming ingest
  * runs (PII audit, quality funnel): the same fixture rows produce
  * byte-identical aggregates whether scanned once in batch or fed
  * through multiple micro-batches with state-store merges between. */
class PipelineStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("streaming PII audit over 3 micro-batches equals the batch gate aggregation") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val customers = graft.Tables.t(spark, sf, "customer")
      .select("c_mktsegment", "c_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val batch = Pipeline.piiAudit(
      customers.toSeq.toDF("c_mktsegment", "c_name"), "c_mktsegment", "c_name")

    val in = MemoryStream[(String, String)]
    val q = PipelineStream
      .piiAuditStream(in.toDF().toDF("c_mktsegment", "c_name"),
        "c_mktsegment", "c_name")
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("complete").start()
    try {
      customers.grouped(math.max(1, customers.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      assert(rowsOf(spark.table("pii_stream")) == rowsOf(batch))
      assert(spark.table("pii_stream").count() > 0)
    } finally q.stop()
  }

  test("streaming funnel stats over 4 micro-batches equal the batch wide row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val batchStats = Pipeline.funnelStats(docs.toSeq.toDF("text"), "text")

    val in = MemoryStream[String]
    val q = PipelineStream.funnelStatsStream(in.toDF().toDF("text"), "text")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("funnel_stream")
      assert(rowsOf(streamed) == rowsOf(batchStats))
      // and the sink-side unpivot yields the same retention table as
      // the q72 gate formulation
      assert(rowsOf(Pipeline.funnelTable(streamed)) ==
        rowsOf(Pipeline.funnelTable(batchStats)))
      // sanity: the funnel actually filters on this corpus
      val tbl = Pipeline.funnelTable(batchStats).collect()
      assert(tbl.length == 6 && tbl.head.getLong(1) >= tbl.last.getLong(1))
    } finally q.stop()
  }

  test("streaming stratified-sample audit over 3 micro-batches equals the q79 batch gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batch = Pipeline.stratifiedSampleAudit(
      docs.toSeq.toDF("doc_id", "lang", "n_chars"))

    val in = MemoryStream[(Long, String, Long)]
    val q = PipelineStream
      .stratifiedSampleStream(in.toDF().toDF("doc_id", "lang", "n_chars"))
      .writeStream.format("memory").queryName("sample_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      assert(rowsOf(spark.table("sample_stream")) == rowsOf(batch))
      // and the streamed audit matches the graded gate rows exactly
      val gate = graft.SparkEntry.queries("q79_stratified_sample")(spark, sf)
      assert(rowsOf(spark.table("sample_stream")) == rowsOf(gate))
    } finally q.stop()
  }

  test("streaming DSIR bucket table over 4 micro-batches reproduces the q80 gate weights") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docsDf = docs.toSeq.toDF("doc_id", "lang", "text")
    val batchBuckets = Pipeline.dsirBuckets(Pipeline.dsirFeatures(docsDf))

    val in = MemoryStream[(Long, String, String)]
    val q = PipelineStream
      .dsirBucketsStream(in.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("dsir_stream")
      // the bounded state table is bit-identical to the batch one
      assert(rowsOf(streamed) == rowsOf(batchBuckets))
      assert(streamed.count() <= 128)
      // and sink-side scoring against the streamed table reproduces
      // the graded gate output exactly (stage 3 composes per batch)
      import org.apache.spark.sql.functions.col
      val rescored = Pipeline.dsirWeights(
          Pipeline.dsirFeatures(docsDf), streamed)
        .orderBy(col("weight").desc, col("doc_id")).limit(25)
      val gate = graft.SparkEntry.queries("q80_importance_weights")(spark, sf)
      assert(rescored.collect().map(_.toString).toSeq ==
        gate.collect().map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming source-mix audit against a streamed-totals recipe equals the q85 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))

    // stage 1 streamed: per-source token totals (O(|sources|) state)
    val in1 = MemoryStream[(String, Long, String)]
    val q1 = PipelineStream
      .sourceTokensStream(in1.toDF().toDF("source", "doc_id", "text"))
      .writeStream.format("memory").queryName("mix_totals_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in1.addData(chunk.toIndexedSeq)
        q1.processAllAvailable()
      }
      assert(rowsOf(spark.table("mix_totals_stream")) ==
        rowsOf(Pipeline.sourceTokenTotals(
          docs.toSeq.toDF("source", "doc_id", "text"))))
    } finally q1.stop()

    // stage 2+3: rates derived from the streamed snapshot, audit
    // streamed against the pinned recipe — equals the graded gate
    val rates = Pipeline.sourceMixRates(
      spark.table("mix_totals_stream"), 8000L,
      Map("src0" -> 200L, "src1" -> 150L), 30L).cache()
    val in2 = MemoryStream[(String, Long, String)]
    val q2 = PipelineStream
      .sourceMixAuditStream(in2.toDF().toDF("source", "doc_id", "text"), rates)
      .writeStream.format("memory").queryName("mix_audit_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { chunk =>
        in2.addData(chunk.toIndexedSeq)
        q2.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q85_source_mix")(spark, sf)
      assert(rowsOf(spark.table("mix_audit_stream")) == rowsOf(gate))
      assert(spark.table("mix_audit_stream").count() > 0)
    } finally q2.stop()
  }

  test("streaming temperature-mix audit against a streamed-totals recipe equals the q110 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // streamed totals → τ = 1/2 rates (the data-derived recipe) →
    // streamed audit; equals the graded gate minus its w join
    val in1 = MemoryStream[(String, Long, String)]
    val q1 = PipelineStream
      .sourceTokensStream(in1.toDF().toDF("source", "doc_id", "text"))
      .writeStream.format("memory").queryName("tmix_totals_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in1.addData(chunk.toIndexedSeq)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val rates = Pipeline.temperatureMixRates(
        spark.table("tmix_totals_stream"), 25000L)
      .select(col("source"), col("src_tokens"), col("rate")).cache()
    val in2 = MemoryStream[(String, Long, String)]
    val q2 = PipelineStream
      .sourceMixAuditStream(in2.toDF().toDF("source", "doc_id", "text"), rates)
      .writeStream.format("memory").queryName("tmix_audit_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { chunk =>
        in2.addData(chunk.toIndexedSeq)
        q2.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q110_temperature_mix")(spark, sf)
        .drop("w")
      assert(rowsOf(spark.table("tmix_audit_stream")) == rowsOf(gate))
      assert(spark.table("tmix_audit_stream").count() > 0)
    } finally q2.stop()
  }

  test("streaming epoch-plan audit against a pinned plan table equals the q99 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val docsDf = docs.toSeq.toDF("source", "doc_id", "text")
    val plan = Pipeline.epochPlanTable(
      Pipeline.sourceTokenTotals(docsDf), 40000L,
      Map("src0" -> 100L, "src1" -> 50L), 10L).cache()

    val in = MemoryStream[(String, Long, String)]
    val q = PipelineStream
      .epochPlanAuditStream(in.toDF().toDF("source", "doc_id", "text"), plan)
      .writeStream.format("memory").queryName("epoch_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q99_epoch_plan")(spark, sf)
      assert(rowsOf(spark.table("epoch_stream")) == rowsOf(gate))
      assert(spark.table("epoch_stream").count() > 0)
    } finally q.stop()
  }

  test("streaming source cap (bounded GroupState heap) converges to the q92 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max => fmax, struct}
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val in = MemoryStream[(String, Long)]
    val q = PipelineStream
      .sourceCapStream(in.toDF().toDF("source", "doc_id"))
      .writeStream.format("memory").queryName("cap_stream")
      .outputMode("update").start()
    try {
      // adversarial chunking: 5 uneven micro-batches so every source's
      // heap is revised across batches, not filled in one pass
      docs.grouped(math.max(1, docs.length / 5)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // final state per source = the LAST update-mode emission
      val fin = spark.table("cap_stream")
        .groupBy(col("source"))
        .agg(fmax(struct(col("n_total"), col("n_kept"),
          col("kept_checksum"))).as("s"))
        .select(col("source"), col("s.n_total").as("n_total"),
          col("s.n_kept").as("n_kept"),
          col("s.kept_checksum").as("kept_checksum"))
      val gate = graft.SparkEntry.queries("q92_source_cap")(spark, sf)
      assert(rowsOf(fin) == rowsOf(gate))
      assert(fin.count() > 0)
    } finally q.stop()
  }

  test("stateless streaming classifier inference equals the q88 batch gate, append mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.ExactCols.{hmod, P}
    // the q88 gate's hash-derived weight table, collected to the
    // bounded closure map the streaming form broadcasts
    val wDf = spark.range(512).select(col("id").as("bucket"),
      (hmod(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("w:"),
        col("id").cast("string"))) % 2001L - 1000L).as("w"))
    val weights = wDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hmodJvm really mirrors the columnar hash
    for ((b, w) <- weights.take(5))
      assert(graft.functions.ExactCols.hmodJvm(s"w:$b") % 2001L - 1000L == w)

    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .classifierScoreStream(in.toDF().toDF("doc_id", "text"), weights)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q88_quality_classifier")(spark, sf)
      assert(rowsOf(spark.table("clf_stream")) == rowsOf(gate))
      assert(spark.table("clf_stream").count() == docs.length)
    } finally q.stop()
  }

  test("stateless streaming chunk audit equals the q111 batch gate, append mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .chunkAuditStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q111_context_chunks")(spark, sf)
      assert(rowsOf(spark.table("chunk_stream")) == rowsOf(gate))
      assert(spark.table("chunk_stream").count() == docs.length)
    } finally q.stop()
  }

  test("stateless streaming bigram scoring against the exported model equals the q109 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val batch = graft.Tables.t(spark, sf, "documents")
    // the pinned-recipe split: model exported once from the corpus,
    // stream scored against it — parity proves bigramModel ≡ the
    // gate's internal gsz-weighted model transitively
    val ratios = graft.queries.Pipeline.bigramModel(batch).collect()
      .map(r => r.getAs[String]("bg") -> r.getAs[Long]("r")).toMap
    val docs = batch.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .bigramScoreStream(in.toDF().toDF("doc_id", "text"), ratios,
        threshold = 34500L)
      .writeStream.format("memory").queryName("bigram_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q109_bigram_lm")(spark, sf)
      assert(rowsOf(spark.table("bigram_stream")) == rowsOf(gate))
      assert(spark.table("bigram_stream").count() == docs.length)
    } finally q.stop()
  }

  test("stateless streaming BPE encode equals the q98 batch gate, append mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val batch = graft.Tables.t(spark, sf, "documents")
    val merges = graft.operators.BpeOp.train(batch, rounds = 8)
      .map(m => (m.left, m.right))
    val docs = batch.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .bpeEncodeStream(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q98_bpe_encode")(spark, sf)
      assert(rowsOf(spark.table("bpe_stream")) == rowsOf(gate))
      assert(spark.table("bpe_stream").count() == docs.length)
    } finally q.stop()
  }

  test("stateless streaming noise-span audit against the exported model equals the q114 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val batch = graft.Tables.t(spark, sf, "documents")
    val ratios = graft.queries.Pipeline.bigramModel(batch).collect()
      .map(r => r.getAs[String]("bg") -> r.getAs[Long]("r")).toMap
    val docs = batch.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .noiseSpanStream(in.toDF().toDF("doc_id", "text"), ratios)
      .writeStream.format("memory").queryName("noise_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q114_noise_spans")(spark, sf)
      assert(rowsOf(spark.table("noise_stream")) == rowsOf(gate))
      assert(spark.table("noise_stream").count() == docs.length)
    } finally q.stop()
  }

  test("stateless streaming contamination spans against the exported train set equals the q120 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    import graft.functions.ExactCols._
    val batch = graft.Tables.t(spark, sf, "documents")
    // export the train side once (the pinned-recipe artifact): the
    // q76/q120 split rule, distinct 5-gram hashes of bucket < 80
    val train = batch
      .withColumn("bucket", hmod(col("doc_id").cast("string")) % 100)
      .filter(col("bucket") < 80)
      .select(explode(shingles(tokens(col("text")), 5, distinct = true)).as("sg"))
      .select(hmod(col("sg")).as("h")).distinct()
      .collect().map(_.getLong(0)).toSet
    // the stream carries the eval side (arriving docs)
    val docs = batch.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => hmodJvm(id.toString) % 100 >= 90 }
    val in = MemoryStream[(Long, String)]
    val q = PipelineStream
      .contaminationSpanStream(in.toDF().toDF("doc_id", "text"), train)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").start() // stateless: append is legal
    try {
      docs.grouped(math.max(1, docs.length / 2)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val gate = graft.SparkEntry.queries("q120_contamination_spans")(spark, sf)
      assert(rowsOf(spark.table("contam_stream")) == rowsOf(gate))
      assert(spark.table("contam_stream").count() == docs.length)
    } finally q.stop()
  }

  test("streaming DAU/WAU (dedup + count, no streaming count-distinct) equals the q128 gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.t(spark, sf, "events")
      .select("ts", "user_id").collect()
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getLong(1)))
    def run(windowDays: Int, name: String): Map[Long, Long] = {
      val in = MemoryStream[(java.sql.Timestamp, Long)]
      val q = EventStream
        .activeUsersStream(in.toDF().toDF("ts", "user_id"), windowDays)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
          in.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
        spark.table(name).collect()
          .map(r => r.getAs[Long]("day") -> r.getAs[Long]("active")).toMap
      } finally q.stop()
    }
    val dau = run(1, "dau_stream")
    val wau = run(7, "wau_stream")
    val gate = graft.SparkEntry.queries("q128_rolling_active_users")(spark, sf)
      .collect()
    assert(gate.nonEmpty)
    for (r <- gate) {
      val day = r.getAs[Long]("day")
      assert(dau(day) == r.getAs[Long]("dau"), s"dau mismatch day $day")
      // the stream also emits partial future windows the gate's
      // observed-days filter drops — on observed days they agree
      assert(wau(day) == r.getAs[Long]("wau"), s"wau mismatch day $day")
    }
  }

  test("streaming funnel mins (complete mode) roll up to the q129 gate counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .select("ts", "user_id", "event_type").collect()
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getLong(1), r.getString(2)))
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = EventStream
      .funnelMinsStream(in.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("complete").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // consumer-side 3-row rollup over the per-user min table
      val mins = spark.table("funnel_stream").collect().map { r =>
        def t(i: Int): Option[Long] =
          Option(r.getAs[java.sql.Timestamp](i)).map(_.getTime)
        (t(1), t(2), t(3))
      }
      val s1 = mins.count(_._1.isDefined).toLong
      val s2 = mins.count(m => m._1.isDefined && m._2.isDefined &&
        m._1.get < m._2.get).toLong
      val s3 = mins.count(m => m._1.isDefined && m._2.isDefined &&
        m._3.isDefined && m._1.get < m._2.get && m._2.get < m._3.get).toLong
      val gate = graft.SparkEntry.queries("q129_event_funnel")(spark, sf)
        .collect().map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users"))
        .toMap
      assert(Map("1_view" -> s1, "2_click" -> s2, "3_purchase" -> s3) == gate)
    } finally q.stop()
  }

  test("streaming beacon stats (ordered ingest) equal the q132 gate rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // per-user non-decreasing arrival: feed in global ts order
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.beaconStatsStream(in.toDS())
      .writeStream.format("memory").queryName("beacon_stream")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // update mode appends per-batch emissions: the final verdict per
      // user is the one with the largest n_gaps (monotone per batch)
      val fin = spark.table("beacon_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_gaps")) }
      val gate = graft.SparkEntry.queries("q132_beacon_regularity")(spark, sf)
        .collect()
      assert(gate.length == fin.size)
      for (g <- gate) {
        val f = fin(g.getAs[Long]("user_id"))
        for (c <- Seq("n_gaps", "sum_gap", "sum_gap2", "cv2_ppm"))
          assert(f.getAs[Long](c) == g.getAs[Long](c),
            s"user ${g.getAs[Long]("user_id")} column $c")
        assert(f.getAs[Boolean]("is_beacon") == g.getAs[Boolean]("is_beacon"))
      }
    } finally q.stop()
  }

  test("streaming beacon stats survive an all-same-second early-ingest state (den=0)") {
    // a user whose first ≥2 tracked events share one epoch second has
    // every gap 0 ⇒ (Σgap)² = 0 — the division guard must emit the
    // perfect-regularity verdict (cv2_ppm 0, is_beacon) instead of
    // throwing and killing the streaming query
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.beaconStatsStream(in.toDS())
      .writeStream.format("memory").queryName("beacon_zero_gap")
      .outputMode("update").start()
    try {
      in.addData(EventStream.UserSec(7L, 100L), EventStream.UserSec(7L, 100L),
        EventStream.UserSec(7L, 100L))
      q.processAllAvailable()
      val rows = spark.table("beacon_zero_gap").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("n_gaps") == 2L && r.getAs[Long]("sum_gap") == 0L &&
        r.getAs[Long]("cv2_ppm") == 0L && r.getAs[Boolean]("is_beacon"))
      // a later real gap leaves the degenerate state and re-emits normally
      in.addData(EventStream.UserSec(7L, 160L))
      q.processAllAvailable()
      val fin = spark.table("beacon_zero_gap").collect()
        .maxBy(_.getAs[Long]("n_gaps"))
      assert(fin.getAs[Long]("n_gaps") == 3L && fin.getAs[Long]("sum_gap") == 60L)
    } finally q.stop()
  }

  test("streaming EWMA over hourly count rows emits the q141 trajectory row-for-row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the ingest shape: per-(type, hour) counts, fed in hour order
    val hourly = graft.Tables.t(spark, sf, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      .orderBy("hr").collect()
      .map(r => graft.queries.Temporal.HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
    val in = MemoryStream[graft.queries.Temporal.HourCount]
    val q = EventStream.ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("update").start()
    try {
      hourly.grouped(math.max(1, hourly.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // every input row emits its verdict exactly once → the union of
      // emissions equals the batch gate trajectory
      val gate = graft.SparkEntry.queries("q141_ewma_baseline")(spark, sf)
      assert(rowsOf(spark.table("ewma_stream")) == rowsOf(gate))
      assert(spark.table("ewma_stream").count() == hourly.length)
    } finally q.stop()
  }

  test("streaming Holt trend over hourly count rows emits the q190 trajectory row-for-row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables.t(spark, sf, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      .orderBy("hr").collect()
      .map(r => graft.queries.Temporal.HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
    val in = MemoryStream[graft.queries.Temporal.HourCount]
    val q = EventStream.holtStream(in.toDS())
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("update").start()
    try {
      hourly.grouped(math.max(1, hourly.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // every input row emits its (level, trend, spike) exactly once →
      // the union of emissions equals the batch gate trajectory
      val gate = graft.SparkEntry.queries("q190_holt_trend")(spark, sf)
      assert(rowsOf(spark.table("holt_stream")) == rowsOf(gate))
      assert(spark.table("holt_stream").count() == hourly.length)
    } finally q.stop()
  }

  test("streaming CUSUM (pinned model, ordered ingest) replays the q159 card") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables.t(spark, sf, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      .orderBy("hr").collect()
      .map(r => graft.queries.Temporal.HourCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
    // the pinned model: per-type (n, S) from the batch pre-pass
    val model = hourly.groupBy(_.event_type).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map(_.cnt).sum)
    }
    val in = MemoryStream[graft.queries.Temporal.HourCount]
    val q = EventStream.cusumStream(in.toDS(), model)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update").start()
    try {
      hourly.grouped(math.max(1, hourly.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val steps = spark.table("cusum_stream").collect()
      assert(steps.length == hourly.length)
      // fold the emitted trajectory back into the q159 card per type
      val gate = graft.SparkEntry.queries("q159_cusum_changepoint")(spark, sf)
        .collect()
      for (g <- gate) {
        val tpe = g.getAs[String]("event_type")
        val tr = steps.filter(_.getAs[String]("event_type") == tpe)
          .sortBy(_.getAs[Long]("hr"))
        assert(tr.length == g.getAs[Long]("n_hours"))
        val peak = tr.map(_.getAs[Long]("s")).max
        assert(math.max(peak, 0L) == g.getAs[Long]("peak_s"))
        val peakHr = if (peak == 0L) -1L
          else tr.find(_.getAs[Long]("s") == peak).get.getAs[Long]("hr")
        assert(peakHr == g.getAs[Long]("peak_hr"))
        val flagged = tr.filter(_.getAs[Boolean]("flagged"))
        assert(flagged.length.toLong == g.getAs[Long]("n_flagged"))
        val ff = flagged.headOption.map(_.getAs[Long]("hr")).getOrElse(-1L)
        assert(ff == g.getAs[Long]("first_flag_hr"))
      }
    } finally q.stop()
  }

  test("streaming profile deviation (pinned global) converges to q171") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "(unix_timestamp(ts) div 3600) % 24 as hod")
      .collect()
      .map(r => EventStream.UserHod(r.getAs[Long]("user_id"),
        r.getAs[Long]("hod")))
    val global = rows.groupBy(_.hod).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val in = MemoryStream[EventStream.UserHod]
    val q = EventStream.profileStream(in.toDS(), global, n)
      .writeStream.format("memory").queryName("profile_stream")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // latest (max n_events) snapshot per user ≡ the batch detector
      val fin = spark.table("profile_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_events")) }
      val gate = graft.SparkEntry.queries("q171_profile_outliers")(spark, sf)
        .collect()
      gate.foreach { g =>
        val f = fin(g.getAs[Long]("user_id"))
        assert(f.getAs[Long]("n_events") == g.getAs[Long]("n_events"))
        assert(f.getAs[Long]("tvd_ppm") == g.getAs[Long]("tvd_ppm"))
      }
      // the gate's top-20 is exactly the consumer-side selection
      val top = fin.toSeq.map { case (u, r) =>
        (u, r.getAs[Long]("tvd_ppm")) }
        .sortBy { case (u, t) => (-t, u) }.take(gate.length)
      assert(top.map(_._1) == gate.map(_.getAs[Long]("user_id")).toSeq)
    } finally q.stop()
  }

  test("streaming transitions (ordered ingest) roll up to the q148 matrix") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(ts) as sec",
        "event_type")
      .orderBy("sec", "event_id").collect()
      .map(r => EventStream.TypedEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val in = MemoryStream[EventStream.TypedEvent]
    val q = EventStream.transitionStream(in.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // consumer-side rollup of the emitted pairs == the gate's counts
      val got = spark.table("trans_stream")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val gate = graft.SparkEntry.queries("q148_transition_matrix")(spark, sf)
        .collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n")).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming prediction scoring under the pinned fold-0 model equals the q196 gate row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.functions.ExactCols.hmodJvm
    val all = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(ts) as sec",
        "event_type")
      .orderBy("sec", "event_id").collect()
      .map(r => EventStream.TypedEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    // pinned model = q196's fold-0 training side, replayed batch-side:
    // full-corpus transition counts minus fold-0 counts, argmax with
    // the (count desc, type asc) tie-break
    def transitions(evs: Seq[EventStream.TypedEvent]): Seq[(String, String)] =
      evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        val o = es.sortBy(e => (e.sec, e.event_id)).map(_.event_type)
        o.zip(o.tail)
      }
    val fold0 = all.filter(e => hmodJvm(s"mfold:${e.user_id}") % 5L == 0L).toSeq
    val cAll = transitions(all.toSeq).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val c0 = transitions(fold0).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val model = cAll.keys.map(_._1).toSeq.distinct.flatMap { from =>
      val cands = cAll.keys.filter(_._1 == from).toSeq
        .map(k => (k._2, cAll(k) - c0.getOrElse(k, 0L))).filter(_._2 > 0L)
      if (cands.isEmpty) None
      else Some(from -> cands.minBy { case (t, n) => (-n, t) }._1)
    }.toMap
    val in = MemoryStream[EventStream.TypedEvent]
    val q = EventStream.predictionStream(in.toDS(), model)
      .writeStream.format("memory").queryName("pred_stream")
      .outputMode("append").start()
    try {
      fold0.grouped(math.max(1, fold0.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val rows = spark.table("pred_stream").collect()
      val hits = rows.count(_.getAs[Boolean]("hit")).toLong
      val gate = graft.SparkEntry.queries("q196_markov_holdout")(spark, sf)
        .collect().find(_.getAs[Long]("fold") == 0L).get
      assert(rows.length.toLong == gate.getAs[Long]("n_test"))
      assert(hits == gate.getAs[Long]("n_hits"))
    } finally q.stop()
  }

  test("streaming gaps (ordered ingest) roll up to the q199 spectrum") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(ts) as sec",
        "event_type")
      .orderBy("sec", "event_id").collect()
      .map(r => EventStream.TypedEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val in = MemoryStream[EventStream.TypedEvent]
    val q = EventStream.gapStream(in.toDS())
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("gap_stream").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("gap")))
        .groupBy { case (t, g) =>
          (t, (63 - java.lang.Long.numberOfLeadingZeros(g + 1L)).toLong) }
        .map { case (k, gs) =>
          k -> (gs.length.toLong, gs.map(_._2).min, gs.map(_._2).max) }
      val gate = graft.SparkEntry.queries("q199_gap_spectrum")(spark, sf)
        .collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("gap_bucket")) ->
          ((r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap"),
            r.getAs[Long]("max_gap")))).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming runs (ordered ingest) = q221 runs minus each user's open run") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(ts) as sec",
        "event_type")
      .orderBy("sec", "event_id").collect()
      .map(r => EventStream.TypedEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val in = MemoryStream[EventStream.TypedEvent]
    val q = EventStream.runStream(in.toDS())
      .writeStream.format("memory").queryName("run_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("run_stream").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("run_len")))
        .groupBy(identity).view.mapValues(_.length).toMap
      // batch runs from the same ordered fold, dropping each user's
      // final (still-open) run — the exact append-mode contract
      val expected = ev.groupBy(_.user_id).values.flatMap { es =>
        val runs = es.sortBy(e => (e.sec, e.event_id))
          .foldLeft(List.empty[(String, Long)]) {
            case ((t, n) :: rest, e) if t == e.event_type => (t, n + 1L) :: rest
            case (acc, e) => (e.event_type, 1L) :: acc
          }
        runs match {
          case Nil => Nil
          case _ :: closed => closed // head IS the user's last run
        }
      }.toSeq.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming heatmap cells roll up to the q204 card rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.heatmapCellStream(in.toDS())
      .writeStream.format("memory").queryName("heat_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val cells = spark.table("heat_stream").collect()
        .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")))
      val total = math.max(cells.length.toLong, 1L)
      val got = cells.groupBy(identity).map { case (k, cs) =>
        val n = cs.length.toLong
        k -> (n, (1000L * math.abs(168L * n - total)) / total)
      }
      val gate = graft.SparkEntry.queries("q204_weekly_heatmap")(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")) ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("dev_milli")))).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming return times (ordered ingest) roll up to the q207 spectrum") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.returnTimeStream(in.toDS())
      .writeStream.format("memory").queryName("rt_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("rt_stream").collect()
        .map(_.getAs[Long]("rt"))
        .groupBy(rt => (63 - java.lang.Long.numberOfLeadingZeros(rt + 1L)).toLong)
        .map { case (b, rs) => b -> (rs.length.toLong, rs.min, rs.max) }
      val gate = graft.SparkEntry.queries("q207_return_time_spectrum")(spark, sf)
        .collect()
        .map(r => r.getAs[Long]("rt_bucket") ->
          ((r.getAs[Long]("n_returns"), r.getAs[Long]("min_rt"),
            r.getAs[Long]("max_rt")))).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming order gaps (threshold -1) roll up to the q212 spectrum") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // orders as a keyed CDC ingest: (custkey, epoch day); within-day
    // arrival order is irrelevant (ties emit gap 0 either way)
    val os = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) dt", "o_orderkey")
      .orderBy("dt", "o_orderkey").collect()
      .map(r => EventStream.UserSec(r.getLong(0),
        r.getAs[java.sql.Timestamp]("dt").toLocalDateTime.toLocalDate.toEpochDay))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.returnTimeStream(in.toDS(), gapSec = -1L)
      .writeStream.format("memory").queryName("ogap_stream")
      .outputMode("append").start()
    try {
      os.grouped(math.max(1, os.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("ogap_stream").collect()
        .map(_.getAs[Long]("rt"))
        .groupBy(g => (63 - java.lang.Long.numberOfLeadingZeros(g + 1L)).toLong)
        .map { case (b, gs) => b -> (gs.length.toLong, gs.min, gs.max) }
      val gate = graft.SparkEntry.queries("q212_order_interval_spectrum")(spark, sf)
        .collect()
        .map(r => r.getAs[Long]("gap_bucket") ->
          ((r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap"),
            r.getAs[Long]("max_gap")))).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming burst peaks (ordered ingest) equal the q131 gate rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.burstStream(in.toDS())
      .writeStream.format("memory").queryName("burst_stream")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val fin = spark.table("burst_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_events")) }
      val gate = graft.SparkEntry.queries("q131_burst_detection")(spark, sf)
        .collect()
      assert(gate.length == fin.size)
      for (g <- gate) {
        val f = fin(g.getAs[Long]("user_id"))
        assert(f.getAs[Long]("n_events") == g.getAs[Long]("n_events"))
        assert(f.getAs[Long]("peak_burst") == g.getAs[Long]("peak_burst"),
          s"user ${g.getAs[Long]("user_id")}")
        assert(f.getAs[Boolean]("is_burst") == g.getAs[Boolean]("is_burst"))
      }
    } finally q.stop()
  }

  test("streaming delta-bits samples roll up to the q217 card row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(ts) as sec",
        "event_type")
      .orderBy("sec", "event_id").collect()
      .map(r => EventStream.TypedEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val in = MemoryStream[EventStream.TypedEvent]
    val q = EventStream.deltaBitsStream(in.toDS())
      .writeStream.format("memory").queryName("dbits_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val rows = spark.table("dbits_stream").collect()
        .map(r => (r.getAs[Long]("raw_bits"), r.getAs[Long]("delta_bits")))
      val (n, raw, delta) =
        (rows.length.toLong, rows.map(_._1).sum, rows.map(_._2).sum)
      val savings = if (raw == 0L) -1L else (1000000L * (raw - delta)) / raw
      val gate = graft.SparkEntry.queries("q217_delta_encoding")(spark, sf)
        .head()
      assert(n == gate.getAs[Long]("n_events"))
      assert(raw == gate.getAs[Long]("raw_bits"))
      assert(delta == gate.getAs[Long]("delta_bits"))
      assert(savings == gate.getAs[Long]("savings_ppm"))
    } finally q.stop()
  }

  test("streaming session cards roll up to the q218 sessions-per-user spectrum") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.sessionStatsStream(in.toDS())
      .writeStream.format("memory").queryName("sess_spectrum_stream")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // final card per user (largest n_events — monotone per batch),
      // then the q218 rollup: bucket = len(bin(c)) - 1 over the
      // per-user session counts
      val counts = spark.table("sess_spectrum_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (_, rs) =>
          rs.maxBy(_.getAs[Long]("n_events")).getAs[Long]("n_sessions") }
        .toSeq
      val got = counts
        .groupBy(c => (63 - java.lang.Long.numberOfLeadingZeros(c)).toLong)
        .map { case (b, cs) => b -> (cs.length.toLong, cs.min, cs.max) }
      val gate = graft.SparkEntry.queries("q218_sessions_per_user")(spark, sf)
        .collect()
        .map(r => r.getAs[Long]("c_bucket") ->
          ((r.getAs[Long]("n_users"), r.getAs[Long]("min_sessions"),
            r.getAs[Long]("max_sessions")))).toMap
      assert(got == gate)
    } finally q.stop()
  }

  test("streaming session stats (ordered ingest) equal the q186 gate rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // per-user non-decreasing arrival: feed in global ts order
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) as sec")
      .orderBy("sec").collect()
      .map(r => EventStream.UserSec(r.getLong(0), r.getLong(1)))
    val in = MemoryStream[EventStream.UserSec]
    val q = EventStream.sessionStatsStream(in.toDS())
      .writeStream.format("memory").queryName("session_stream")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // update mode appends per-batch emissions: the final card per
      // user is the one with the largest n_events (monotone per batch)
      val fin = spark.table("session_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_events")) }
      val gate = graft.SparkEntry.queries("q186_sessions")(spark, sf)
        .collect()
      assert(gate.length == fin.size)
      for (g <- gate) {
        val f = fin(g.getAs[Long]("user_id"))
        for (c <- Seq("n_sessions", "n_events", "max_sess_events", "mean_len_ppm"))
          assert(f.getAs[Long](c) == g.getAs[Long](c),
            s"user ${g.getAs[Long]("user_id")} column $c")
      }
    } finally q.stop()
  }
}
