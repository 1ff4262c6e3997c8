package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The multimodal pipeline's Spark-side plumbing: schema, batch
  * shape, determinism, distribution. The decode kernels are stubs
  * (no codecs in this environment) but everything these tests pin
  * down is what survives a real-decoder swap. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("ingest produces typed media records with byte payloads") {
    val ds = Multimodal.ingest(docs, "doc_id", "text", "audio")
    val n = docs.count()
    assert(ds.count() == n)
    val r = ds.filter(_.media_id == 0).head()
    assert(r.meta.kind == "audio")
    assert(r.payload.nonEmpty)
    // payload is exactly the UTF-8 bytes of the source text
    val txt = docs.filter("doc_id = 0").select("text").head().getString(0)
    assert(java.util.Arrays.equals(r.payload, txt.getBytes("UTF-8")))
  }

  test("feature extraction: per-partition batches, fixed dim, L1-normalized, deterministic") {
    val ds = Multimodal.ingest(docs, "doc_id", "text", "image").repartition(7)
    val f1 = Multimodal.extractFeatures(ds, 16).collect().sortBy(_.media_id)
    assert(f1.length == docs.count())
    assert(f1.forall(_.features.length == 16))
    // stub decoder L1-normalizes the histogram
    assert(f1.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    // deterministic across runs and partitionings
    val f2 = Multimodal.extractFeatures(ds.repartition(3), 16).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("frame sampling: window count and content") {
    val payload = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(payload, frameSize = 32, stride = 16)
    assert(frames.length == (100 - 32) / 16 + 1)
    assert(frames.head.toSeq == payload.slice(0, 32).toSeq)
    assert(frames(1).toSeq == payload.slice(16, 48).toSeq)
    // shorter than one frame -> no frames
    assert(Multimodal.sampleFrames(new Array[Byte](10), 32, 16).isEmpty)
  }

  test("explodeFrames distributes one row per frame") {
    val ds = Multimodal.ingest(docs.limit(20), "doc_id", "text", "video")
    val expected = ds.collect()
      .map(r => Multimodal.sampleFrames(r.payload, 64, 64).length).sum
    assert(Multimodal.explodeFrames(ds, 64, 64).count() == expected)
  }

  test("resize truncates or zero-pads") {
    val p = Array[Byte](1, 2, 3)
    assert(Multimodal.resizePayload(p, 2).toSeq == Seq[Byte](1, 2))
    assert(Multimodal.resizePayload(p, 5).toSeq == Seq[Byte](1, 2, 3, 0, 0))
  }

  test("q118: decoded-WAV stats match a direct JVM replay of the sample formula") {
    import graft.functions.ExactCols.{hmodJvm, P}
    val d = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.queries.Media.audioRoundTripStats(
      spark.read.parquet(s"$sf/documents.parquet")).collect()
    assert(rows.length == d.size)
    for (r <- rows.take(50)) {
      val toks = d(r.getAs[Long]("doc_id")).split(" ").filter(_.nonEmpty)
      val s = toks.map(t => (hmodJvm("au:" + t) % 16384L) - 8192L)
      assert(r.getAs[Long]("n_samples") == s.length.toLong)
      assert(r.getAs[Long]("sum_abs") == s.map(math.abs).sum)
      assert(r.getAs[Long]("peak") == (if (s.isEmpty) 0L else s.map(math.abs).max))
      val zc = s.indices.drop(1)
        .count(i => (s(i) >= 0L) != (s(i - 1) >= 0L)).toLong
      assert(r.getAs[Long]("zero_cross") == zc)
      val ck = s.indices.foldLeft(0L)((a, i) =>
        (a + ((s(i) + 32768L) * (i + 1L)) % P) % P)
      assert(r.getAs[Long]("amp_checksum") == ck)
    }
    // signal sanity: real waveforms cross zero and peak below the clamp
    assert(rows.forall(_.getAs[Long]("peak") <= 8192L))
    assert(rows.exists(_.getAs[Long]("zero_cross") > 0L))
  }

  test("q119: decoded-stream frame hashes match a direct JVM replay") {
    import graft.functions.ExactCols.{hmodJvm, P}
    val d = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.queries.Media.videoFrameSampleAudit(
      spark.read.parquet(s"$sf/documents.parquet")).collect()
    assert(rows.length == d.size)
    for (r <- rows.take(50)) {
      val toks = d(r.getAs[Long]("doc_id")).split(" ").filter(_.nonEmpty)
      val px0 = new Array[Long](63)
      if (toks.length >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
          .groupBy(s => (hmodJvm(s) % 63L).toInt)
          .foreach { case (k, ss) => px0(k) = math.min(255L, 16L * ss.size) }
      val nf = (4L + toks.length % 5L).toInt
      val hashes = (0 until nf).filter(_ % 2 == 0).map { j =>
        val px = (0 until 63).map { k =>
          if (k < 3 * j) 0L else px0(((k - j) % 63 + 63) % 63)
        }
        val sp = px.sum
        (0 until 63).foldLeft(0L)((ah, k) =>
          if (63L * px(k) > sp) ah | (1L << k) else ah)
      }
      assert(r.getAs[Long]("n_frames") == nf.toLong)
      assert(r.getAs[Long]("n_sampled") == hashes.length.toLong)
      val scenes = hashes.indices.drop(1).count(i =>
        java.lang.Long.bitCount(hashes(i) ^ hashes(i - 1)) >= 28).toLong
      assert(r.getAs[Long]("n_scene_cut") == scenes)
      val ck = hashes.indices.foldLeft(0L)((a, i) =>
        (a + ((hashes(i) % P) * (i + 1L)) % P) % P)
      assert(r.getAs[Long]("hash_checksum") == ck)
    }
    // the wipe makes consecutive distances vary WITHIN docs: scene
    // counts must not be the all-or-nothing {0, n_sampled-1} pattern a
    // pure rotation produces (popcount is rotation-invariant)
    assert(rows.exists { r =>
      val sc = r.getAs[Long]("n_scene_cut")
      sc > 0L && sc < r.getAs[Long]("n_sampled") - 1L
    })
  }
}
