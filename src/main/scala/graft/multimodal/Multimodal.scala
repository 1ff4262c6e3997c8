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
  * pandas-UDF loop).
  *
  * Decode is REAL for PPM images and WAV PCM16 audio ([[Codecs]] —
  * dependency-free byte-level parsers), and [[extractFeatures]]
  * dispatches to them by media kind. Only codecs that require native
  * libraries this container lacks (JPEG, H.264, …) fall back to the
  * DETERMINISTIC STUB below; swapping one in changes only the
  * function body, not the pipeline, schema, or partitioning.
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

  /** Kind-dispatched decode: PPM images and WAV audio parse for real
    * through [[Codecs]]; other kinds — or payloads that fail to parse
    * — fall back to the histogram stub so the pipeline is total. */
  def decodeFeatures(kind: String, payload: Array[Byte], stubDim: Int): Array[Float] =
    kind match {
      case "image" => Codecs.decodePpm(payload).map(Codecs.imageFeatures)
        .getOrElse(decodeFeaturesStub(payload, stubDim))
      case "audio" => Codecs.decodeWav(payload).map(Codecs.audioFeatures)
        .getOrElse(decodeFeaturesStub(payload, stubDim))
      case _ => decodeFeaturesStub(payload, stubDim)
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
          decodeFeatures(r.meta.kind, r.payload, dim))
      }
    }
  }

  /** Deterministic procedural image keyed by id. The container ships
    * no media files, but the emitted BYTES are a genuine P6 PPM any
    * netpbm tool reads — so the decode stage exercised on them is the
    * real parser, not a simulation. */
  def syntheticImage(id: Long, w: Int, h: Int): Codecs.Image = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        rgb(o) = ((x * 7 + id) & 0xff).toByte
        rgb(o + 1) = ((y * 5 + 2 * id) & 0xff).toByte
        rgb(o + 2) = (((x + y) * 3 + 5 * id) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Codecs.Image(w, h, rgb)
  }

  /** Deterministic procedural audio keyed by id: integer sawtooth
    * (no floating trig — bit-identical everywhere). */
  def syntheticAudio(id: Long, sampleRateHz: Int, n: Int): Codecs.Audio = {
    val period = (id % 50 + 20).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((i % period) * 2000 / period - 1000) * 16).toShort
      i += 1
    }
    Codecs.Audio(sampleRateHz, samples)
  }

  /** Media table of REAL PPM payloads, one per id in `df`. */
  def ingestImages(df: DataFrame, idCol: String, w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      MediaRecord(id, MediaMeta("image", w, h, 0, 0L),
        Codecs.encodePpm(syntheticImage(id, w, h)))
    }
  }

  /** Media table of REAL WAV payloads, one per id in `df`. */
  def ingestAudio(df: DataFrame, idCol: String, sampleRateHz: Int,
                  nSamples: Int): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      MediaRecord(id,
        MediaMeta("audio", 0, 0, sampleRateHz,
          nSamples.toLong * 1000 / sampleRateHz),
        Codecs.encodeWav(syntheticAudio(id, sampleRateHz, nSamples)))
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
