package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real, dependency-free codecs for the multimodal pipeline: binary
  * PPM (P6) images and RIFF/WAVE PCM16 audio. Both are genuine
  * interchange formats with byte-level specs, parsed here from
  * scratch — so the pipeline's decode stage is REAL for these kinds;
  * only codecs that require native libraries (JPEG, H.264, …) remain
  * behind the deterministic stub in [[Multimodal]].
  */
object Codecs {

  // ------------------------------------------------------------- PPM

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
  }

  /** Serialize as binary PPM (P6, maxval 255). */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Parse binary PPM: magic "P6", whitespace/comment-tolerant header
    * (# comments run to end of line, as the netpbm spec allows),
    * single whitespace byte after maxval, then w*h*3 raw RGB bytes.
    * Returns None on any malformed input (wrong magic, maxval ≠ 255,
    * truncated raster). */
  def decodePpm(bytes: Array[Byte]): Option[Image] =
    decodePpmAt(bytes, 0).map(_._1)

  /** One P6 frame starting at `start`; returns the image plus the
    * offset one past its raster (the next frame's start in a
    * concatenated stream). */
  private def decodePpmAt(bytes: Array[Byte], start: Int): Option[(Image, Int)] = try {
    var pos = start
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def int(): Option[Int] = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start) None
      else Some(new String(bytes, start, pos - start, StandardCharsets.US_ASCII).toInt)
    }
    if (bytes.length < start + 2 || bytes(start) != 'P' || bytes(start + 1) != '6') return None
    pos = start + 2
    for {
      w <- int()
      h <- int()
      maxval <- int()
      if maxval == 255 && w > 0 && h > 0
      // exactly one whitespace byte separates header and raster
      if pos < bytes.length && (bytes(pos) == '\n' || bytes(pos) == ' ' ||
        bytes(pos) == '\r' || bytes(pos) == '\t')
      raster = pos + 1
      // long math: w*h*3 can overflow Int for hostile headers; when it
      // fits under bytes.length (an Int) the Int product is safe
      if bytes.length.toLong - raster >= w.toLong * h * 3
    } yield (Image(w, h, java.util.Arrays.copyOfRange(bytes, raster, raster + w * h * 3)),
      raster + w * h * 3)
  } catch {
    // malformed input must yield None, never a task-killing throw
    // (oversized dimension literals overflow toInt, etc.)
    case scala.util.control.NonFatal(_) => None
  }

  // ----------------------------------------------------- PPM video stream

  /** Concatenated-P6 "video": frames laid head-to-tail, each a complete
    * binary PPM. This is the netpbm pipe form real tools consume
    * (`ffmpeg -f image2pipe -c:v ppm` reads exactly this stream), so
    * the container is a genuine interchange format, not an invented
    * one — frames may differ in size, and the only framing is each
    * header's own width×height. */
  def encodePpmStream(frames: Seq[Image]): Array[Byte] = {
    val encoded = frames.map(encodePpm)
    val out = new Array[Byte](encoded.map(_.length).sum)
    var off = 0
    encoded.foreach { e =>
      System.arraycopy(e, 0, out, off, e.length); off += e.length
    }
    out
  }

  /** Walk a concatenated-P6 stream to the end. None if any frame is
    * malformed or trailing garbage follows the last raster — a
    * truncated or corrupt stream must not silently yield a prefix. */
  def decodePpmStream(bytes: Array[Byte]): Option[Vector[Image]] = {
    var pos = 0
    val acc = Vector.newBuilder[Image]
    while (pos < bytes.length) {
      decodePpmAt(bytes, pos) match {
        case Some((img, next)) => acc += img; pos = next
        case None => return None
      }
    }
    Some(acc.result())
  }

  /** Per-channel means + 8-bin luminance histogram (L1-normalized) —
    * an 11-dim real image feature vector. */
  def imageFeatures(img: Image): Array[Float] = {
    val out = new Array[Float](11)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val b = img.rgb(3 * i + 2) & 0xff
      out(0) += r; out(1) += g; out(2) += b
      // integer BT.601-ish luma, bucketed into 8 bins
      val y = (299 * r + 587 * g + 114 * b) / 1000
      out(3 + (y >> 5)) += 1f
      i += 1
    }
    var k = 0
    while (k < 3) { out(k) /= (255f * n); k += 1 }
    while (k < 11) { out(k) /= n; k += 1 }
    out
  }

  /** Nearest-neighbor resize — a REAL image resize (not the byte
    * truncation stub): output pixel (x,y) samples the proportionally
    * scaled source pixel. */
  def resizeImage(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0)
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        val s = 3 * (sy * img.width + sx)
        val d = 3 * (y * w2 + x)
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  // ------------------------------------------------------------- WAV

  final case class Audio(sampleRateHz: Int, samples: Array[Short])

  /** Serialize as RIFF/WAVE, PCM 16-bit mono little-endian. */
  def encodeWav(audio: Audio): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(audio.sampleRateHz)
      .putInt(audio.sampleRateHz * 2)    // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits/sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse RIFF/WAVE: walks chunks (tolerating extra chunks before
    * `data`), requires PCM 16-bit mono. None on malformed input. */
  def decodeWav(bytes: Array[Byte]): Option[Audio] = try {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, StandardCharsets.US_ASCII)
    }
    if (tag() != "RIFF") return None
    buf.getInt // riff size (unchecked: testdata is well-formed by construction)
    if (tag() != "WAVE") return None
    var rate = -1
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          val codec = buf.getShort
          val channels = buf.getShort
          rate = buf.getInt
          if (codec != 1 || channels != 1) return None
          buf.getInt; buf.getShort
          if (buf.getShort != 16) return None
          buf.position(fmtEnd)
        case "data" =>
          if (rate <= 0) return None
          val n = size / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
          return Some(Audio(rate, samples))
        case _ => buf.position(buf.position() + size)
      }
    }
    None
  } catch {
    // e.g. a 'fmt ' chunk whose declared size admits fewer than the 16
    // bytes the PCM header read needs → BufferUnderflow, not a throw
    case scala.util.control.NonFatal(_) => None
  }

  /** RMS energy + zero-crossing rate + 6-bin |amplitude| histogram —
    * an 8-dim real audio feature vector. */
  def audioFeatures(audio: Audio): Array[Float] = {
    val out = new Array[Float](8)
    val n = math.max(1, audio.samples.length)
    var sumSq = 0.0
    var zc = 0
    var i = 0
    while (i < audio.samples.length) {
      val s = audio.samples(i).toInt
      sumSq += s.toDouble * s
      if (i > 0 && ((s >= 0) != (audio.samples(i - 1) >= 0))) zc += 1
      out(2 + math.min(5, math.abs(s) / 6000)) += 1f
      i += 1
    }
    out(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
    out(1) = zc.toFloat / n
    var k = 2
    while (k < 8) { out(k) /= n; k += 1 }
    out
  }
}
