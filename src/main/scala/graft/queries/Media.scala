package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Checkpoints._
import graft.Tables._
import graft.functions.ExactCols._
import graft.multimodal.Codecs

/** Multimodal queries: the relational face of the binary-payload
  * pipeline (graft.multimodal). q42 treats payloads as opaque bytes
  * (sizes, checksums, dedup state — the plan is identical for real
  * media). q117 goes through the REAL codec: per-document images are
  * rendered as genuine binary P6 PPM, decoded back by the byte-level
  * parser, and perceptually hashed from what the DECODER returns —
  * so the gate certifies the encode→decode round trip, not just the
  * hash arithmetic. */
object Media {

  /** Oracle-side replay of the [[imageNearDupPairs]] route — clone
    * collapse, 256-member clone cap, shingle-histogram raster aHash,
    * 4-block pigeonhole with the 256-rep block-bucket cap (QUALIFY
    * keep-lowest doc_id), hamming ≤ 3 verify, expansion — ending in
    * `ipairs(a_id, b_id, hamming)`. CTE names carry an `i` prefix so
    * the chain composes with Dedup.cappedPairCtes in one statement
    * (q232 cross-modality agreement); q117 gates it alone. */
  private[queries] lazy val imagePairCtes: String = s"""
      igrp AS (SELECT doc_id, text,
               min(doc_id) OVER (PARTITION BY text) gid
             FROM documents),
      imem AS (SELECT gid, doc_id FROM igrp
              QUALIFY row_number() OVER (PARTITION BY gid ORDER BY doc_id) <= 256),
      itk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
             FROM igrp WHERE doc_id = gid),
      ish AS (SELECT doc_id, list_distinct([tk[i]||' '||tk[i+1]||' '||tk[i+2]
                                           for i in generate_series(1,len(tk)-2)])
               shingles
             FROM itk WHERE len(tk) >= 3),
      iex AS (SELECT doc_id, ${sql.hmod("s")} % 63 k
             FROM (SELECT doc_id, unnest(shingles) s FROM ish)),
      icnt AS (SELECT doc_id, k, CAST(count(*) AS BIGINT) c FROM iex GROUP BY 1, 2),
      ipx AS (SELECT doc_id, k, least(255, 16*c) p FROM icnt),
      ifl AS (SELECT dg.doc_id, dg.k, COALESCE(p.p, 0) p
             FROM (SELECT d.doc_id, g.k
                   FROM (SELECT DISTINCT doc_id FROM ipx) d
                   CROSS JOIN generate_series(0,62) g(k)) dg
             LEFT JOIN ipx p ON p.doc_id = dg.doc_id AND p.k = dg.k),
      itot AS (SELECT doc_id, CAST(SUM(p) AS BIGINT) sp FROM ifl GROUP BY 1),
      ibits AS (SELECT f.doc_id,
                 CAST(SUM(CASE WHEN 63*f.p > t.sp THEN (1::BIGINT << f.k)
                          ELSE 0 END) AS BIGINT) ah
               FROM ifl f JOIN itot t USING (doc_id) GROUP BY 1),
      iblocks AS (SELECT doc_id, ah, bi, bv FROM (
                   SELECT doc_id, ah, bi,
                     CASE WHEN bi = 3 THEN (ah >> 48) & 32767
                          ELSE (ah >> (bi*16)) & 65535 END bv
                   FROM ibits, generate_series(0,3) g(bi))
                 QUALIFY row_number() OVER (PARTITION BY bi, bv
                                            ORDER BY doc_id) <= 256),
      irp AS (SELECT a_id, b_id, hamming FROM (
               SELECT DISTINCT a.doc_id a_id, b.doc_id b_id,
                 CAST(bit_count(xor(a.ah, b.ah)) AS BIGINT) hamming
               FROM iblocks a JOIN iblocks b
                 ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
             WHERE hamming <= 3),
      ipairs AS (
        SELECT least(ma.doc_id, mb.doc_id) a_id,
               greatest(ma.doc_id, mb.doc_id) b_id, irp.hamming
        FROM irp JOIN imem ma ON irp.a_id = ma.gid
                JOIN imem mb ON irp.b_id = mb.gid
        UNION ALL
        SELECT a.doc_id, b.doc_id, CAST(0 AS BIGINT)
        FROM imem a JOIN imem b ON a.gid = b.gid AND a.doc_id < b.doc_id)"""

  /** Perceptual-hash (aHash) image near-dup pairs — the image-side
    * member of the dedup family (pHash/aHash dedup is how image
    * corpora are near-deduplicated at scale; LAION's pipeline is the
    * canonical example): each record's image is reduced to a 63-bit
    * average-hash (one bit per pixel: 63·p > Σp, integer-exact), and
    * near-dups are pairs at hamming ≤ `maxHamming`, found via the
    * q26 pigeonhole design — 4 blocks (16/16/16/15 bits), hamming ≤ 3
    * forces an exact match in ≥ 1 block, so candidates come from a
    * capped equi-join on block value, never n².
    *
    * Images here are DERIVED from document content (pixel k =
    * min(255, 16·|{distinct 3-shingles hashing to bucket k}|), a 9×7
    * grayscale shingle histogram) so near-dup texts yield near-dup
    * images — planted pairs land at hamming ≤ 1 while unrelated docs
    * sit ≥ 17 (measured) — and the ORACLE can replay the pixels from
    * the shingles. The Spark side does what a real image pipeline
    * does: render genuine P6 bytes, ship them as a binary column,
    * decode with [[Codecs.decodePpm]], hash the decoded raster. Any
    * header/raster bug in either codec direction breaks the gate.
    *
    * 100 TB shape: per-record render/decode/hash is scan-stage typed
    * map work (O(bytes), no shuffle); the only shuffle is the block
    * equi-join, and every block bucket is capped (`maxBucketSize`,
    * the LshConfig discipline). The q117 oracle replays BOTH caps —
    * the 256-member clone-group cap and the 256-rep block-bucket cap
    * — as QUALIFY keep-lowest-doc_id windows (the cappedPairCtes
    * doctrine, r11), so it is exact at any scale factor;
    * CappedOracleSpec pins Spark ≡ replay on corpora where each cap
    * genuinely fires. */
  def imageNearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                        maxBucketSize: Int = 256): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole covers hamming <= 3, got $maxHamming")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // exact-clone collapse (the dedup-family doctrine): the hash is a
    // function of text alone, so render/decode/hash once per DISTINCT
    // text and expand — clones pair at hamming 0 (intra), rep pairs
    // carry their hamming verbatim (cross); both expansions ride the
    // capped member table, so output stays bounded under replication
    val withGid = docs.withColumn("gid",
      min(col("doc_id")).over(Window.partitionBy(col("text"))))
    val members = Dedup.capBuckets(withGid.select(col("gid"), col("doc_id")),
        Seq("gid"), "doc_id", maxBucketSize)
      .cut() // intra self-join sides + cross expansion
    val reps = withGid.filter(col("doc_id") === col("gid"))
      .select(col("doc_id"), col("text"))
    val counts = reps
      .select(col("doc_id"),
        explode(shingles(tokens(col("text")), 3, distinct = true)).as("s"))
      .select(col("doc_id"), (hmod(col("s")) % 63L).as("k"))
      .groupBy(col("doc_id"), col("k")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("k"), col("c"))).as("kc"))
    val hashed = counts.as[(Long, Seq[(Long, Long)])].map { case (id, kc) =>
      val px = new Array[Int](63)
      kc.foreach { case (k, c) => px(k.toInt) = math.min(255L, 16L * c).toInt }
      val rgb = new Array[Byte](63 * 3)
      var i = 0
      while (i < 63) {
        val v = px(i).toByte
        rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
        i += 1
      }
      // REAL round trip: render P6 bytes, parse them back, hash what
      // the decoder returns (grayscale = red channel of the raster)
      val payload = Codecs.encodePpm(Codecs.Image(9, 7, rgb))
      val img = Codecs.decodePpm(payload)
        .getOrElse(throw new IllegalStateException(s"codec round trip failed for $id"))
      var sp = 0L
      i = 0
      while (i < 63) { sp += (img.rgb(3 * i) & 0xff).toLong; i += 1 }
      var ah = 0L
      i = 0
      while (i < 63) {
        if (63L * (img.rgb(3 * i) & 0xff) > sp) ah |= (1L << i)
        i += 1
      }
      (id, ah)
    }.toDF("doc_id", "ah")
    val blocks = Dedup.capBuckets(
      hashed.select(col("doc_id"), col("ah"),
          explode(expr("sequence(0, 3)")).as("bi"))
        .withColumn("bv", expr(
          "CASE WHEN bi = 3 THEN shiftright(ah, 48) & 32767 " +
            "ELSE shiftright(ah, bi * 16) & 65535 END")),
      Seq("bi", "bv"), "doc_id", maxBucketSize)
    val repPairs = blocks.as("a")
      .join(blocks.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.ah").bitwiseXOR(col("b.ah"))).cast(LongType)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val intra = members.as("a")
      .join(members.as("b"),
        col("a.gid") === col("b.gid") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        lit(0L).as("hamming"))
    val cross = repPairs
      .join(members.select(col("gid").as("a_id"), col("doc_id").as("xa")), "a_id")
      .join(members.select(col("gid").as("b_id"), col("doc_id").as("xb")), "b_id")
      .select(least(col("xa"), col("xb")).as("a_id"),
        greatest(col("xa"), col("xb")).as("b_id"), col("hamming"))
    cross.unionByName(intra)
  }

  /** WAV round-trip audit — q117's codec-certification doctrine for
    * the audio side: each document's token sequence becomes a PCM16
    * waveform (sample i = hmod("au:"+tokᵢ) % 16384 − 8192 — signed,
    * sequence-ordered), serialized as a genuine RIFF/WAVE container
    * ([[Codecs.encodeWav]]), parsed back by the chunk-walking decoder,
    * and reduced to exact integer stats OF THE DECODED samples:
    * count, Σ|s|, peak, zero crossings (the audioFeatures rule in
    * exact ints) and an ORDER-SENSITIVE amplitude checksum
    * Σ (s+32768)·i mod P. The oracle replays the sample formula
    * directly — so the gate passes iff the 44-byte header, LE int16
    * packing and chunk walk are byte-perfect in both directions.
    *
    * 100 TB shape: pure scan-stage typed-map work, O(bytes) per
    * record, no shuffle at all (the output is per-record). */
  def audioRoundTripStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // exact-clone collapse: the waveform — hence every stat — is a
    // function of text alone, so the per-token MD5s and the codec
    // round trip run once per DISTINCT text and the results expand
    // through the (gid, doc_id) member table
    val withGid = docs.withColumn("gid",
      min(col("doc_id")).over(Window.partitionBy(col("text"))))
    val members = withGid.select(col("gid"), col("doc_id"))
    val reps = withGid.filter(col("doc_id") === col("gid"))
      .select(col("gid"), col("text"))
    val perRep = reps.as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val samples = toks.map(t =>
          ((hmodJvm("au:" + t) % 16384L) - 8192L).toShort)
        val payload = Codecs.encodeWav(Codecs.Audio(16000, samples))
        val dec = Codecs.decodeWav(payload)
          .getOrElse(throw new IllegalStateException(s"WAV round trip failed for $id"))
        var sumAbs = 0L
        var peak = 0L
        var zc = 0L
        var ck = 0L
        var i = 0
        while (i < dec.samples.length) {
          val s = dec.samples(i).toLong
          sumAbs += math.abs(s)
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && ((s >= 0L) != (dec.samples(i - 1).toLong >= 0L))) zc += 1L
          ck = (ck + ((s + 32768L) * (i + 1L)) % P) % P
          i += 1
        }
        (id, dec.samples.length.toLong, sumAbs, peak, zc, ck)
      }
      .toDF("gid", "n_samples", "sum_abs", "peak", "zero_cross",
        "amp_checksum")
    members.join(perRep, "gid")
      .select(col("doc_id"), col("n_samples"), col("sum_abs"), col("peak"),
        col("zero_cross"), col("amp_checksum"))
  }

  /** Video frame-sampling audit — the video-side member of the q117/
    * q118 codec-certification family, covering the three standard
    * video-pipeline steps over a REAL container: decode a multi-frame
    * stream, sample every `stride`-th frame, and detect scene cuts
    * (consecutive sampled frames whose perceptual hashes differ by
    * ≥ `sceneHamming` bits — the classic shot-boundary heuristic).
    *
    * The container is genuine: frames are rendered as independent
    * binary P6 PPMs laid head-to-tail ([[Codecs.encodePpmStream]]),
    * the exact stream `ffmpeg -f image2pipe` consumes, and the decode
    * side re-walks it frame by frame from the headers alone
    * ([[Codecs.decodePpmStream]]) — a length, header, or raster bug in
    * either direction changes every downstream number and breaks the
    * gate. Frame content derives from the document (frame j rotates
    * the q117 shingle-histogram raster by j pixels and WIPES pixels
    * k < 3j to black — a rotation alone leaves every consecutive
    * hamming equal because popcount is rotation-invariant, measured:
    * all-or-nothing scene counts; the wipe is what makes consecutive
    * frame distances genuinely vary within a doc. Frame count =
    * 4 + ntok % 5), so the ORACLE can replay each sampled frame's
    * aHash from the text with pure integer arithmetic.
    *
    * Outputs per doc: n_frames, n_sampled, n_scene_cut, and an
    * order-sensitive Σ((ahⱼ mod P)·rank) mod P checksum of the
    * sampled-frame hashes (pins both values and order).
    *
    * 100 TB shape: exact-clone collapsed (every number is a function
    * of text alone — render/decode/hash once per distinct text, expand
    * through the member table); per-rep work is scan-stage typed-map
    * O(bytes); the only shuffles are the collapse window and the
    * shingle-histogram groupBy. */
  def videoFrameSampleAudit(docs: DataFrame, stride: Int = 2,
                            sceneHamming: Int = 28): DataFrame = {
    require(stride >= 1 && sceneHamming >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val withGid = docs.withColumn("gid",
      min(col("doc_id")).over(Window.partitionBy(col("text"))))
    val members = withGid.select(col("gid"), col("doc_id"))
    val reps = withGid.filter(col("doc_id") === col("gid"))
      .select(col("gid"), col("text"))
    val nt = reps.select(col("gid"), size(tokens(col("text"))).cast(LongType).as("ntok"))
    val counts = reps
      .select(col("gid"),
        explode(shingles(tokens(col("text")), 3, distinct = true)).as("s"))
      .select(col("gid"), (hmod(col("s")) % 63L).as("k"))
      .groupBy(col("gid"), col("k")).agg(count(lit(1)).as("c"))
      .groupBy(col("gid"))
      .agg(collect_list(struct(col("k"), col("c"))).as("kc"))
    val perRep = nt.join(counts, Seq("gid"), "left")
      .as[(Long, Long, Option[Seq[(Long, Long)]])]
      .map { case (id, ntok, kcOpt) =>
        val px0 = new Array[Int](63)
        kcOpt.getOrElse(Nil).foreach { case (k, c) =>
          px0(k.toInt) = math.min(255L, 16L * c).toInt
        }
        val nf = (4L + ntok % 5L).toInt
        val frames = (0 until nf).map { j =>
          val rgb = new Array[Byte](63 * 3)
          var k = 0
          while (k < 63) {
            val v = if (k < 3 * j) 0.toByte
                    else px0(((k - j) % 63 + 63) % 63).toByte
            rgb(3 * k) = v; rgb(3 * k + 1) = v; rgb(3 * k + 2) = v
            k += 1
          }
          Codecs.Image(9, 7, rgb)
        }
        // REAL round trip: serialize the whole stream, re-walk it from
        // the headers, and hash what the DECODER returns
        val stream = Codecs.encodePpmStream(frames)
        val dec = Codecs.decodePpmStream(stream)
          .getOrElse(throw new IllegalStateException(s"PPM stream round trip failed for $id"))
        if (dec.length != nf)
          throw new IllegalStateException(s"frame count ${dec.length} != $nf for $id")
        val hashes = dec.zipWithIndex.collect { case (img, j) if j % stride == 0 =>
          var sp = 0L
          var i = 0
          while (i < 63) { sp += (img.rgb(3 * i) & 0xff).toLong; i += 1 }
          var ah = 0L
          i = 0
          while (i < 63) {
            if (63L * (img.rgb(3 * i) & 0xff) > sp) ah |= (1L << i)
            i += 1
          }
          ah
        }
        var scenes = 0L
        var ck = 0L
        var s = 0
        while (s < hashes.length) {
          ck = (ck + ((hashes(s) % P) * (s + 1L)) % P) % P
          if (s > 0 &&
            java.lang.Long.bitCount(hashes(s) ^ hashes(s - 1)) >= sceneHamming)
            scenes += 1L
          s += 1
        }
        (id, nf.toLong, hashes.length.toLong, scenes, ck)
      }
      .toDF("gid", "n_frames", "n_sampled", "n_scene_cut", "hash_checksum")
    members.join(perRep, "gid")
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        col("n_scene_cut"), col("hash_checksum"))
  }

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
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // perceptual-hash image near-dup pairs: content-derived 9×7
    // grayscale images rendered as REAL P6 bytes, decoded back by the
    // byte-level parser, aHashed from the decoded raster, paired via
    // the 4-block pigeonhole — the oracle replays the pixels straight
    // from the shingles (collapsed + both 256-caps as QUALIFY, the
    // cappedPairCtes doctrine), so the gate certifies the codec round
    // trip AND the cap semantics at any sf
    Q("q117_image_phash_pairs", (s, d) => {
      imageNearDupPairs(t(s, d, "documents"))
        .orderBy(col("a_id"), col("b_id"))
    }, Some(s"""
      WITH $imagePairCtes
      SELECT a_id, b_id, hamming FROM ipairs ORDER BY a_id, b_id""")),

    // WAV round-trip audit: token sequence → PCM16 → real RIFF/WAVE
    // encode → chunk-walking decode → exact integer stats of the
    // DECODED samples (order-sensitive checksum pins the sequence);
    // the oracle replays the sample formula — any header/endianness/
    // chunk bug in either codec direction breaks the gate
    Q("q118_audio_roundtrip", (s, d) => {
      audioRoundTripStats(t(s, d, "documents"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      sl AS (SELECT doc_id, CASE WHEN len(tk) >= 1
               THEN [{'i': i, 's': (${sql.hmod("'au:'||tk[i]")} % 16384) - 8192}
                     for i in generate_series(1, len(tk))]
               ELSE [] END ss FROM tk),
      ex AS (SELECT doc_id, u.i i, u.s s
             FROM (SELECT doc_id, unnest(ss) u FROM sl)),
      lg AS (SELECT doc_id, i, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) ps
             FROM ex),
      per AS (SELECT doc_id,
                CAST(count(*) AS BIGINT) n_samples,
                CAST(SUM(abs(s)) AS BIGINT) sum_abs,
                CAST(MAX(abs(s)) AS BIGINT) peak,
                CAST(SUM(CASE WHEN ps IS NOT NULL AND (s >= 0) <> (ps >= 0)
                         THEN 1 ELSE 0 END) AS BIGINT) zero_cross,
                CAST(SUM(((s + 32768) * i) % ${P}) % ${P} AS BIGINT) amp_checksum
              FROM lg GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(n_samples, 0) AS BIGINT) AS n_samples,
        CAST(COALESCE(sum_abs, 0) AS BIGINT) AS sum_abs,
        CAST(COALESCE(peak, 0) AS BIGINT) AS peak,
        CAST(COALESCE(zero_cross, 0) AS BIGINT) AS zero_cross,
        CAST(COALESCE(amp_checksum, 0) AS BIGINT) AS amp_checksum
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""")),

    // video frame-sampling audit: multi-frame concatenated-P6 stream
    // (the image2pipe form) rendered, re-walked frame-by-frame from
    // the headers, every 2nd frame aHashed from the DECODED raster,
    // scene cuts at hamming ≥ 28 between consecutive sampled frames —
    // the oracle replays frame pixels (rotate-by-j + wipe k<3j) and
    // hashes with pure integer arithmetic
    Q("q119_video_frame_sample", (s, d) => {
      videoFrameSampleAudit(t(s, d, "documents"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      nt AS (SELECT doc_id, CAST(len(tk) AS BIGINT) ntok FROM tk),
      sh AS (SELECT doc_id, list_distinct([tk[i]||' '||tk[i+1]||' '||tk[i+2]
                                           for i in generate_series(1,len(tk)-2)])
               shingles
             FROM tk WHERE len(tk) >= 3),
      ex AS (SELECT doc_id, ${sql.hmod("s")} % 63 k
             FROM (SELECT doc_id, unnest(shingles) s FROM sh)),
      cnt AS (SELECT doc_id, k, CAST(count(*) AS BIGINT) c FROM ex GROUP BY 1, 2),
      px AS (SELECT doc_id, k, least(255, 16*c) p FROM cnt),
      fl AS (SELECT dg.doc_id, dg.k, COALESCE(p.p, 0) p
             FROM (SELECT d.doc_id, g.k
                   FROM (SELECT DISTINCT doc_id FROM px) d
                   CROSS JOIN generate_series(0,62) g(k)) dg
             LEFT JOIN px p ON p.doc_id = dg.doc_id AND p.k = dg.k),
      fr AS (SELECT doc_id, ntok, 4 + (ntok % 5) nf FROM nt),
      fj AS (SELECT doc_id, nf, unnest(generate_series(0, nf-1)) j FROM fr),
      pxj AS (SELECT f.doc_id, f.nf, f.j, (fl.k + f.j) % 63 k,
                CASE WHEN (fl.k + f.j) % 63 < 3*f.j THEN 0 ELSE fl.p END p
              FROM fj f JOIN fl ON fl.doc_id = f.doc_id),
      totj AS (SELECT doc_id, j, CAST(SUM(p) AS BIGINT) sp
               FROM pxj GROUP BY 1, 2),
      fb0 AS (SELECT p.doc_id, p.j,
                CAST(SUM(CASE WHEN 63*p.p > t.sp
                         THEN (1::BIGINT << CAST(p.k AS INT)) ELSE 0 END) AS BIGINT) ahj
              FROM pxj p JOIN totj t ON t.doc_id = p.doc_id AND t.j = p.j
              GROUP BY 1, 2),
      fb AS (SELECT f.doc_id, f.nf, f.j, COALESCE(b.ahj, 0) ahj
             FROM fj f LEFT JOIN fb0 b ON b.doc_id = f.doc_id AND b.j = f.j),
      sampled AS (SELECT doc_id, nf, j, ahj,
                    row_number() OVER (PARTITION BY doc_id ORDER BY j) rn,
                    lag(ahj) OVER (PARTITION BY doc_id ORDER BY j) pa
                  FROM fb WHERE j % 2 = 0),
      per AS (SELECT doc_id, CAST(MAX(nf) AS BIGINT) n_frames,
                CAST(count(*) AS BIGINT) n_sampled,
                CAST(SUM(CASE WHEN pa IS NOT NULL
                              AND bit_count(xor(ahj, pa)) >= 28
                         THEN 1 ELSE 0 END) AS BIGINT) n_scene_cut,
                CAST(SUM(((ahj % ${P}) * rn) % ${P}) % ${P} AS BIGINT) hash_checksum
              FROM sampled GROUP BY 1)
      SELECT doc_id, n_frames, n_sampled, n_scene_cut, hash_checksum
      FROM per ORDER BY doc_id""")),

    // loudness-normalization card (the audio-prep staple: before
    // training on speech/audio, every source is gain-normalized to a
    // common full-scale peak, and the gain table is computed corpus-
    // wide per source): q118's waveform synth + REAL RIFF/WAVE
    // round trip per distinct text, per-source rollup of the DECODED
    // samples — max peak, mean-square amplitude, and the full-scale
    // gain ⌊8192·10⁶ / peak⌋ ppm a normalizer would apply. Every
    // number is integer-exact: msq is the floor ratio
    // ⌊1000·Σs² / Σn⌋, peak/gain pure int64. r12 OVERFLOW AUDIT: s²
    // ≤ 8192² = 6.7·10⁷ and per-doc energy ≤ 3.5·10¹⁰ at 512 tokens
    // (int64-safe per doc); the SOURCE sum crosses int64 at ~10⁸
    // docs/source, so it rides DECIMAL(38,0) (exact to 10³⁰ docs),
    // the ≤|sources| rows collect (q134/q174 driver-scalar rule) and
    // the msq division runs in BigInt — outputs are all bounded
    // (msq ≤ 6.7·10¹⁰, gain ≤ 8.2·10⁹).
    // 100 TB shape: exact-clone collapsed scan-stage typed-map work
    // (encode→decode once per distinct text), one O(docs) expansion
    // join, one |sources|-row aggregate.
    Q("q224_audio_normalization", (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val withGid = docs.withColumn("gid",
        min(col("doc_id")).over(Window.partitionBy(col("text"))))
      val members = withGid.select(col("gid"), col("doc_id"), col("source"))
      val reps = withGid.filter(col("doc_id") === col("gid"))
        .select(col("gid"), col("text"))
      val perRep = reps.as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty)
          val samples = toks.map(tk =>
            ((hmodJvm("au:" + tk) % 16384L) - 8192L).toShort)
          val payload = Codecs.encodeWav(Codecs.Audio(16000, samples))
          val dec = Codecs.decodeWav(payload)
            .getOrElse(throw new IllegalStateException(
              s"WAV round trip failed for $id"))
          var peak = 0L
          var energy = 0L
          var i = 0
          while (i < dec.samples.length) {
            val sm = dec.samples(i).toLong
            if (math.abs(sm) > peak) peak = math.abs(sm)
            energy += sm * sm
            i += 1
          }
          (id, dec.samples.length.toLong, peak, energy)
        }
        .toDF("gid", "n", "peak", "energy")
      val perSrc = members.join(perRep, "gid")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("n_samples"),
          max(col("peak")).as("peak"),
          sum(col("energy").cast(DecimalType(38, 0))).as("energy"))
        .collect()
      perSrc.toSeq.map { r =>
        val nS = if (r.isNullAt(2)) 0L else r.getLong(2)
        val pk = if (r.isNullAt(3)) 0L else r.getLong(3)
        val en = if (r.isNullAt(4)) BigInt(0)
                 else BigInt(r.getDecimal(4).toBigInteger)
        val msq = if (nS == 0L) -1L else (BigInt(1000) * en / nS).toLong
        val gain = if (pk == 0L) -1L else 8192000000L / pk
        (r.getString(0), r.getLong(1), nS, pk, msq, gain)
      }.toDF("source", "n_docs", "n_samples", "peak", "msq_milli", "gain_ppm")
        .orderBy(col("source"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, source,
                    list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      sl AS (SELECT doc_id, source, CASE WHEN len(tk) >= 1
               THEN [(${sql.hmod("'au:'||tk[i]")} % 16384) - 8192
                     for i in generate_series(1, len(tk))]
               ELSE [] END ss FROM tk),
      per AS (SELECT doc_id, source,
                CAST(len(ss) AS BIGINT) n,
                CAST(COALESCE(list_max([abs(s) for s in ss]), 0) AS BIGINT) peak,
                CAST(COALESCE(list_sum([s*s for s in ss]), 0) AS BIGINT) energy
              FROM sl),
      src AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
                CAST(SUM(n) AS BIGINT) n_samples,
                CAST(MAX(peak) AS BIGINT) peak,
                SUM(CAST(energy AS HUGEINT)) energy
              FROM per GROUP BY 1)
      SELECT source, n_docs, n_samples, peak,
        CAST(CASE WHEN n_samples = 0 THEN -1
             ELSE (1000 * energy) // n_samples END AS BIGINT) AS msq_milli,
        CAST(CASE WHEN peak = 0 THEN -1
             ELSE 8192000000 // peak END AS BIGINT) AS gain_ppm
      FROM src ORDER BY source""")),

    // cross-MODALITY dedup-route agreement (q123's route matrix
    // extended across modalities: does the image-side aHash route see
    // the same duplicate structure as the text-side MinHash route? —
    // the consistency check a multimodal corpus pipeline publishes
    // before trusting either side alone): q24's capped text pairs vs
    // q117's capped image pairs as a 3-row text-only / image-only /
    // both card with counts + pair checksums. Pair sets are unique by
    // construction on both routes (one gid per doc), so anti/inner
    // joins here ≡ the oracle's EXCEPT/INTERSECT. 100 TB shape: both
    // pair surfaces are the audited capped routes, cut() once each;
    // the agreement is two anti joins + one inner join on the narrow
    // (a_id, b_id) tables. The oracle composes BOTH full replay
    // chains (cappedPairCtes + imagePairCtes) in one statement.
    Q("q232_modality_route_agreement", (s, d) => {
      val docs = t(s, d, "documents")
      val tp = graft.queries.Dedup.nearDupPairs(docs)
        .select(col("a_id"), col("b_id")).cut()
      val ip = imageNearDupPairs(docs)
        .select(col("a_id"), col("b_id")).cut()
      def card(df: DataFrame, label: String): DataFrame =
        df.agg(count(lit(1)).as("n_pairs"),
          (coalesce(sum(hmod(concat(col("a_id").cast("string"), lit(":"),
            col("b_id").cast("string")))), lit(0L)) % P).as("pair_checksum"))
          .select(lit(label).as("route"), col("n_pairs"), col("pair_checksum"))
      card(tp.join(ip, Seq("a_id", "b_id"), "left_anti"), "1_text_only")
        .unionByName(
          card(ip.join(tp, Seq("a_id", "b_id"), "left_anti"), "2_image_only"))
        .unionByName(card(tp.join(ip, Seq("a_id", "b_id")), "3_both"))
        .orderBy(col("route"))
    }, Some {
      val ck = sql.hmod("CAST(a_id AS VARCHAR)||':'||CAST(b_id AS VARCHAR)")
      s"""
      WITH ${graft.queries.Dedup.cappedPairCtes},
      $imagePairCtes,
      tp AS (SELECT a_id, b_id FROM pairs),
      ip AS (SELECT a_id, b_id FROM ipairs),
      res AS (
        SELECT '1_text_only' AS route, CAST(count(*) AS BIGINT) n_pairs,
          CAST(COALESCE(SUM($ck), 0) % $P AS BIGINT) pair_checksum
        FROM (SELECT * FROM tp EXCEPT SELECT * FROM ip)
        UNION ALL
        SELECT '2_image_only', CAST(count(*) AS BIGINT),
          CAST(COALESCE(SUM($ck), 0) % $P AS BIGINT)
        FROM (SELECT * FROM ip EXCEPT SELECT * FROM tp)
        UNION ALL
        SELECT '3_both', CAST(count(*) AS BIGINT),
          CAST(COALESCE(SUM($ck), 0) % $P AS BIGINT)
        FROM (SELECT * FROM tp INTERSECT SELECT * FROM ip))
      SELECT route, n_pairs, pair_checksum FROM res ORDER BY route"""
    })
  )
}
