package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The real codecs: byte-exact round trips, spec-compliant header
  * tolerance, malformed-input rejection, and the distributed decode
  * path running the REAL parsers (not the stub) on real payloads. */
class CodecsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("PPM round trip is byte-exact") {
    val img = Multimodal.syntheticImage(7L, 13, 9)
    val decoded = Codecs.decodePpm(Codecs.encodePpm(img))
    assert(decoded.isDefined)
    assert(decoded.get.width == 13 && decoded.get.height == 9)
    assert(decoded.get.rgb.sameElements(img.rgb))
  }

  test("PPM parser tolerates comments and whitespace per netpbm spec") {
    val img = Multimodal.syntheticImage(3L, 4, 2)
    val withComment =
      ("P6\n# a comment line\n 4\t2 # trailing\n255\n").getBytes("US-ASCII") ++ img.rgb
    val decoded = Codecs.decodePpm(withComment)
    assert(decoded.exists(_.rgb.sameElements(img.rgb)))
  }

  test("PPM rejects malformed input") {
    assert(Codecs.decodePpm("P5\n4 2\n255\n".getBytes ++ new Array[Byte](24)).isEmpty)
    assert(Codecs.decodePpm("P6\n4 2\n255\n".getBytes ++ new Array[Byte](10)).isEmpty) // truncated
    assert(Codecs.decodePpm("P6\n4 2\n65535\n".getBytes ++ new Array[Byte](48)).isEmpty)
    assert(Codecs.decodePpm(Array[Byte]()).isEmpty)
    // hostile headers must yield None, not a task-killing throw:
    // dimension literal overflowing Int.parseInt
    assert(Codecs.decodePpm("P6\n99999999999 1\n255\n".getBytes ++ new Array[Byte](48)).isEmpty)
    // w*h*3 overflowing Int (50000*50000*3 > Int.MaxValue)
    assert(Codecs.decodePpm("P6\n50000 50000\n255\n".getBytes ++ new Array[Byte](48)).isEmpty)
  }

  test("PPM stream: multi-frame round trip with varied sizes, rejects corrupt/truncated") {
    val frames = Seq(
      Multimodal.syntheticImage(1L, 4, 3),
      Multimodal.syntheticImage(2L, 9, 7),
      Multimodal.syntheticImage(3L, 2, 2))
    val stream = Codecs.encodePpmStream(frames)
    val dec = Codecs.decodePpmStream(stream)
    assert(dec.isDefined && dec.get.length == 3)
    dec.get.zip(frames).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(a.rgb.sameElements(b.rgb))
    }
    // empty stream = zero frames (a valid, if dull, video)
    assert(Codecs.decodePpmStream(Array.emptyByteArray).contains(Vector()))
    // truncation mid-raster and trailing garbage both fail loudly
    assert(Codecs.decodePpmStream(stream.dropRight(1)).isEmpty)
    assert(Codecs.decodePpmStream(stream :+ 'X'.toByte).isEmpty)
    // a corrupt magic in the SECOND frame fails the whole stream
    val f0len = Codecs.encodePpm(frames.head).length
    val corrupt = stream.clone(); corrupt(f0len) = 'Q'.toByte
    assert(Codecs.decodePpmStream(corrupt).isEmpty)
  }

  test("WAV round trip is sample-exact and chunk-walker skips extra chunks") {
    val audio = Multimodal.syntheticAudio(11L, 16000, 500)
    val bytes = Codecs.encodeWav(audio)
    val decoded = Codecs.decodeWav(bytes)
    assert(decoded.exists(a => a.sampleRateHz == 16000 && a.samples.sameElements(audio.samples)))
    // splice a LIST chunk between fmt and data; parser must skip it
    val head = bytes.slice(0, 36)
    val tail = bytes.drop(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = head ++ listChunk ++ tail
    // fix riff size field (+12)
    val riff = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.putInt(4, riff.getInt(4) + 12)
    assert(Codecs.decodeWav(spliced).exists(_.samples.sameElements(audio.samples)))
  }

  test("WAV rejects stereo/non-PCM/truncated input") {
    val good = Codecs.encodeWav(Multimodal.syntheticAudio(1L, 8000, 100))
    val stereo = good.clone()
    stereo(22) = 2 // channel count
    assert(Codecs.decodeWav(stereo).isEmpty)
    assert(Codecs.decodeWav(good.take(40)).isEmpty)
    // fmt chunk declaring size 4 as the file's last 12 bytes: the PCM
    // header read would underflow — must be None, not a throw
    val truncFmt = good.take(12) ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 0, 1, 0)
    assert(Codecs.decodeWav(truncFmt).isEmpty)
  }

  test("resizeImage is a real nearest-neighbor resample") {
    val img = Multimodal.syntheticImage(5L, 16, 16)
    val small = Codecs.resizeImage(img, 4, 4)
    assert(small.width == 4 && small.height == 4 && small.rgb.length == 48)
    // corner pixel maps to source corner pixel
    assert(small.rgb(0) == img.rgb(0))
  }

  test("distributed extractFeatures runs the REAL decoders on real payloads") {
    import spark.implicits._
    val ids = (0L until 30L).toDF("id")
    val imgFeats = Multimodal.extractFeatures(
      Multimodal.ingestImages(ids, "id", 8, 6).repartition(5), 16)
      .collect().sortBy(_.media_id)
    assert(imgFeats.length == 30)
    // 11-dim = the real image feature shape, not the 16-dim stub
    assert(imgFeats.forall(_.features.length == 11))
    val expected = Codecs.imageFeatures(Multimodal.syntheticImage(4L, 8, 6))
    assert(imgFeats(4).features.sameElements(expected))

    val audFeats = Multimodal.extractFeatures(
      Multimodal.ingestAudio(ids, "id", 16000, 400).repartition(3), 16)
      .collect().sortBy(_.media_id)
    assert(audFeats.forall(_.features.length == 8)) // real audio shape
    val expA = Codecs.audioFeatures(Multimodal.syntheticAudio(7L, 16000, 400))
    assert(audFeats(7).features.sameElements(expA))
  }

  test("non-decodable payloads fall back to the stub (pipeline is total)") {
    import spark.implicits._
    val docs = Seq((1L, "just text, not a PPM")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      Multimodal.ingest(docs, "doc_id", "text", "image"), 16).collect()
    assert(feats.head.features.length == 16) // stub dim
  }
}
