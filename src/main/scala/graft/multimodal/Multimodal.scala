package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video treated as opaque
  * `binary` payload columns with typed metadata, processed in
  * distributed batches.
  *
  * The Spark-side shape is the real thing — binary columns ride
  * through parquet scans/shuffles untouched, metadata is a typed
  * struct usable in filters/joins (so partition pruning and predicate
  * pushdown still apply to metadata predicates), and per-record
  * compute runs via `mapPartitions` so codec/model state can be
  * initialized once per partition (the JVM analog of a batched
  * pandas-UDF loop). The decode kernels themselves are DETERMINISTIC
  * STUBS — this container has no image/audio codecs — clearly marked
  * below; swapping in a real decoder changes only the function body,
  * not the pipeline, schema, or partitioning.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(
      kind: String,        // image | audio | video
      width: Int,
      height: Int,
      sampleRateHz: Int,
      durationMs: Long)

  final case class MediaRecord(
      media_id: Long,
      meta: MediaMeta,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** Attach a payload + metadata column pair to make a media table.
    * (Test data has no real media; payloads are the UTF-8 document
    * bytes — byte-wise the pipeline cannot tell the difference.) */
  def ingest(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        lit(kind).as("kind"),
        lit(0).as("width"), lit(0).as("height"),
        lit(16000).as("sampleRateHz"),
        (octet_length(encode(col(textCol), "UTF-8")) / 16).cast("long").as("durationMs"))
        .as("meta"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for image decode / audio PCM decode.
    * Deterministic: folds the byte histogram into `dim` float bins and
    * L1-normalizes. A real implementation would decode the codec here;
    * everything around it (batching, schema, partitioning) is final. */
  def decodeFeaturesStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val bins = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var k = 0
    while (k < dim) { bins(k) /= n; k += 1 }
    bins
  }

  /** Distributed feature extraction: one pass, per-partition batch
    * loop, expensive state (a real decoder/model) would be allocated
    * once per partition here. No shuffle; output co-partitioned with
    * input. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init point (decoder handle, model session, ...)
      it.map { r =>
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
          decodeFeaturesStub(r.payload, dim))
      }
    }
  }

  /** STUB frame sampler — stands in for video frame extraction:
    * fixed-size windows every `stride` bytes (deterministic). */
  def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    require(frameSize > 0 && stride > 0)
    (0 until math.max(0, payload.length - frameSize + 1) by stride)
      .map(off => java.util.Arrays.copyOfRange(payload, off, off + frameSize))
  }

  /** Frame table: one row per sampled frame, exploded distributively
    * (flatMap — no driver involvement, frames stay on executors). */
  def explodeFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      sampleFrames(r.payload, frameSize, stride).zipWithIndex.map {
        case (f, i) => (r.media_id, i, f)
      }
    }
  }

  /** STUB resize — stands in for image resize / audio resample:
    * truncate-or-zero-pad the payload to `nBytes`. */
  def resizePayload(payload: Array[Byte], nBytes: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, nBytes)
}
