package graft

import graft.functions.MediaHeaders
import graft.operators.Multimodal

/** Real header parsing against REAL fixture bytes (a genuine 1×1 PNG
  * file, a JPEG stream with a COM segment before a progressive SOF2, a
  * canonical 44-byte WAV header) plus the malformed-input contract and
  * the construct → parse round trip of [[Multimodal.syntheticMedia]].
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: a real 1x1 PNG file parses to its IHDR dimensions") {
    // a complete, valid 1x1 RGBA PNG (the canonical transparent pixel)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val m = MediaHeaders.parse(png)
    assert(m === MediaHeaders.Meta("png", Some(1), Some(1), None, Some(8)))
  }

  test("JPEG: marker walk skips COM segment and reads SOF2 dimensions") {
    // SOI + COM(len 5, "abc") + SOF2: precision 8, height 256, width 320
    val jpeg = hexBytes(
      "FFD8" + "FFFE0005616263" + "FFC20011" + "08" + "0100" + "0140" +
        "03011100021101031101")
    val m = MediaHeaders.parse(jpeg)
    assert(m === MediaHeaders.Meta("jpeg", Some(320), Some(256), None, Some(8)))
  }

  test("WAV: canonical 44-byte header parses sample rate and bit depth") {
    // RIFF/WAVE, fmt: PCM mono 44100 Hz 16-bit, then a data chunk header
    val wav = hexBytes(
      "52494646" + "24080000" + "57415645" + "666D7420" + "10000000" +
        "0100" + "0100" + "44AC0000" + "88580100" + "0200" + "1000" +
        "64617461" + "00080000")
    val m = MediaHeaders.parse(wav)
    assert(m === MediaHeaders.Meta("wav", None, None, Some(44100), Some(16)))
  }

  test("malformed input never throws: unknown format, null fields") {
    assert(MediaHeaders.parse(Array.emptyByteArray).format === "unknown")
    assert(MediaHeaders.parse("just some text".getBytes("UTF-8")).format
      === "unknown")
    // bare PNG signature, truncated before IHDR -> too short to parse
    assert(MediaHeaders.parse(hexBytes("89504E470D0A1A0A")).format === "unknown")
    // JPEG SOI with EOI and no frame header: format detected, no dims
    assert(MediaHeaders.parse(hexBytes("FFD8FFD9")) ===
      MediaHeaders.Meta("jpeg", None, None, None, None))
    // RIFF/WAVE with no fmt chunk
    assert(MediaHeaders.parse(hexBytes("524946460400000057415645")) ===
      MediaHeaders.Meta("wav", None, None, None, None))
  }

  test("binary payload plumbing: payload stays binary, media kind by id") {
    val docs = Seq((2L, "abcd"), (3L, "xy")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val kinds = media.select("media_id", "kind")
      .as[(Long, String)].collect().toMap
    assert(kinds === Map(2L -> "image", 3L -> "audio"))
  }

  test("syntheticMedia construct -> decodeMeta parse round trip") {
    val docs = (0L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.decodeMeta(Multimodal.syntheticMedia(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 0: PNG 1x1 (0 % 640 + 1); doc 6: PNG 7x7
    assert(out(0L).getString(3) === "png")
    assert(out(0L).getInt(4) === 1 && out(0L).getInt(5) === 1)
    assert(out(6L).getInt(4) === 7 && out(6L).getInt(5) === 7)
    // doc 1: JPEG 2x2; doc 7: JPEG 8x8
    assert(out(1L).getString(3) === "jpeg")
    assert(out(7L).getInt(4) === 8 && out(7L).getInt(5) === 8)
    // doc 2: WAV, rate index (2 % 5) + 1 = 3rd entry = 22050
    assert(out(2L).getString(3) === "wav")
    assert(out(2L).getInt(6) === 22050 && out(2L).getInt(7) === 16)
    // doc 5: WAV, (5 % 5) + 1 = 1st entry = 8000
    assert(out(5L).getInt(6) === 8000)
    // format recovered from bytes always matches the intended kind
    assert(out.values.forall(r => r.getString(1) === r.getString(3)))
  }

  test("parse_media is callable from SQL via GraftExtensions") {
    val f = spark.sql("SELECT parse_media(unhex('FFD8FFD9')).format AS f")
      .collect().head.getString(0)
    assert(f === "jpeg")
  }

  test("pixel/sample media functions are callable from SQL") {
    import graft.functions.ImageKernels
    val png = ImageKernels.synthPng(6L)
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(png)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.BinaryType))))
      .createOrReplaceTempView("media_sql_t")
    val r = spark.sql(
      """SELECT image_dhash(p).dhash AS dh,
        |       image_dhash(image_resize(p, 10, 9)).width AS rw,
        |       audio_stats(p) IS NULL AS not_audio,
        |       video_frames(p) IS NULL AS not_video
        |FROM media_sql_t""".stripMargin).collect().head
    assert(r.getLong(0) === ImageKernels.dhash64(
      ImageKernels.decodePng(png)).longValue)
    assert(r.getInt(1) === 10)
    assert(r.getBoolean(2) && r.getBoolean(3)) // wrong-format → null in-band
  }

  test("batched feature extraction is invariant to batch size and the " +
    "decode step is REAL pixels") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => Tuple1(i)).toDF("doc_id")
    val media = Multimodal.imageMedia(docs)
    def run(bs: Int) = Multimodal.featureExtractBatches(media, batchSize = bs)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    // a batch boundary mid-partition must not drop, duplicate, or
    // reorder values — the batch size is purely a memory knob
    val small = run(3)
    assert(small === run(1000))
    assert(small.size === 10)
    // features are the exact closed-form pixel statistics (the decode
    // is real — the r14 md5 stub is gone): check one image end to end
    val id = 4L
    val w = graft.functions.ImageKernels.synthWidth(id)
    val h = graft.functions.ImageKernels.synthHeight(id)
    val pix = graft.functions.ImageKernels.synthPix(id) _
    val lums = for (y <- 0 until h; x <- 0 until w) yield (x, y, pix(x, y))
    val expected = Seq(
      w.toLong * h, lums.map(_._3.toLong).sum,
      lums.map(_._3).min.toLong, lums.map(_._3).max.toLong,
      lums.filter(_._1 < w / 2).map(_._3.toLong).sum,
      lums.filter(_._2 < h / 2).map(_._3.toLong).sum,
      lums.count(_._3 > 128).toLong,
      lums.count { case (x, y, v) => x + 1 < w && pix(x + 1, y) > v }.toLong)
    assert(small(id).drop(1) === expected)
    // a NULL/undecodable payload yields NULL features in-band, never a
    // task-killing NPE
    val bad = Seq((1L, graft.functions.ImageKernels.synthPng(1L)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val nf = Multimodal.featureExtractBatches(bad)
      .select("media_id", "f0").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nf === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("PNG codec round-trips closed-form pixels through every color " +
    "type and all five scanline filters") {
    import graft.functions.ImageKernels
    for (colorType <- Seq(0, 2, 4, 6)) {
      val w = 13; val h = 11 // h > 5 → filters None/Sub/Up/Avg/Paeth all hit
      def pix(x: Int, y: Int) = (x * 31 + y * 57 + colorType * 7) % 256
      val png = ImageKernels.encodePng(w, h, colorType, pix)
      val img = ImageKernels.decodePng(png)
      assert(img != null, s"colorType $colorType failed to decode")
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.lum(y * w + x) === pix(x, y),
          s"pixel ($x,$y) colorType $colorType")
    }
  }

  test("dHash: invariant to uniform brightness, sensitive to content; " +
    "small/undecodable images degrade in-band") {
    import spark.implicits._
    import graft.functions.ImageKernels
    // the planted pairs: 2k vs 2k+1 differ by +20 brightness → equal hash
    val media = Multimodal.imageMedia((0L to 9L).map(Tuple1(_)).toDF("doc_id"))
    val hs = Multimodal.imageDhashes(media)
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    (0L to 8L by 2).foreach(k =>
      assert(hs(k) === hs(k + 1), s"pair ($k,${k + 1}) should collide"))
    // distinct groups produce distinct hashes somewhere in the fixture
    assert(hs.values.toSet.size > 1)
    // near-dup operator finds every planted pair at hamming 0
    val pairs = Multimodal.imageNearDups(media)
      .filter(org.apache.spark.sql.functions.col("hamming") === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L to 8L by 2).foreach(k => assert(pairs.contains((k, k + 1))))
    // 8×8 decodes (dimensions real) but is too small for the 9×8 grid →
    // null hash; garbage bytes → all-null row
    val edge = Seq(
      (1L, ImageKernels.encodePng(8, 8, 0, (x, y) => x + y)),
      (2L, "notapng".getBytes))
      .toDF("media_id", "payload")
    val rows = Multimodal.imageDhashes(edge).collect()
      .map(r => r.getLong(0) ->
        ((r.isNullAt(1), if (r.isNullAt(1)) 0 else r.getInt(1),
          r.isNullAt(3)))).toMap
    assert(rows(1L) === ((false, 8, true)))
    assert(rows(2L)._1 === true)
  }

  test("palette (color type 3) PNGs decode through PLTE; bad indices " +
    "and a missing palette degrade in-band") {
    import graft.functions.ImageKernels
    def build(plte: Array[Byte], indices: Array[Array[Byte]],
              withPlte: Boolean = true): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      def chunk(t: String, data: Array[Byte]): Unit = {
        val len = data.length
        out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
          (len >>> 8).toByte, len.toByte))
        out.write(t.getBytes("US-ASCII")); out.write(data)
        out.write(Array[Byte](0, 0, 0, 0)) // CRC unchecked
      }
      val w = indices.head.length; val h = indices.length
      chunk("IHDR", Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte,
        8, 3, 0, 0, 0))
      if (withPlte) chunk("PLTE", plte)
      val raw = indices.flatMap(row => 0.toByte +: row) // filter 0 rows
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
      d.end()
      chunk("IDAT", comp.toByteArray)
      chunk("IEND", Array.empty)
      out.toByteArray
    }
    // palette: red/green/blue/gray → luminances 76/150/27/128 under the
    // 77/151/28 integer weights
    val plte = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 128.toByte, 128.toByte, 128.toByte)
    val img = ImageKernels.decodePng(build(plte,
      Array(Array[Byte](0, 1, 2), Array[Byte](3, 0, 1))))
    assert(img != null && img.width === 3 && img.height === 2)
    assert(img.lum.toSeq === Seq(76, 150, 27, 128, 76, 150))
    // an index past the palette, or a palette-less type-3 file → null
    assert(ImageKernels.decodePng(build(plte,
      Array(Array[Byte](0, 9, 2), Array[Byte](3, 0, 1)))) == null)
    assert(ImageKernels.decodePng(build(plte,
      Array(Array[Byte](0, 1, 2), Array[Byte](3, 0, 1)),
      withPlte = false)) == null)
  }

  test("streaming image dedup flags exact perceptual dups against a " +
    "static corpus index, batch ≡ stream") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.functions.ImageKernels
    // known corpus: images 0 and 2 (by their even-id base form)
    val known = Seq(0L, 2L).map(id => (id,
      ImageKernels.dhash64(ImageKernels.decodePng(
        ImageKernels.synthPng(id))).longValue))
      .toDF("known_id", "hash")
    // arriving: 1 (brightness twin of 0 → dup), 2 (exact → dup),
    // 5 (twin of known-absent 4 → new), garbage (null hash → not a dup)
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (ts("2024-01-01 00:00:01"), 1L, ImageKernels.synthPng(1L)),
      (ts("2024-01-01 00:00:02"), 2L, ImageKernels.synthPng(2L)),
      (ts("2024-01-01 00:00:03"), 5L, ImageKernels.synthPng(5L)),
      (ts("2024-01-01 00:00:04"), 9L, "junk".getBytes))
    val batch = graft.streaming.StreamingMedia
      .imageDedupStream(rows.toDF("ts", "media_id", "payload"), known)
      .select("media_id", "dup_of", "is_dup").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))))
      .toMap
    assert(batch === Map(1L -> ((Some(0L), 1)), 2L -> ((Some(2L), 1)),
      5L -> ((None, 0)), 9L -> ((None, 0))))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Array[Byte])]
    val name = s"imgdedup_${System.nanoTime()}"
    val q = graft.streaming.StreamingMedia.imageDedupStream(
        input.toDF().toDF("ts", "media_id", "payload"), known)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table(name)
        .select("media_id", "dup_of", "is_dup").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))))
        .toMap
      assert(got === batch) // stateless projection+join: batch ≡ stream
    } finally q.stop()
  }

  test("streaming FUZZY near-dup (hamming <= t) rides the hamming-join " +
    "rewrite: batch ≡ stream, micro-batch plan is equi-join shaped") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.functions.ImageKernels
    // corpus hashes planted at controlled hamming distances from the
    // arriving images' dHashes: 0, 1, 2, and 4 bit flips
    def dh(id: Long): Long =
      ImageKernels.dhash64(ImageKernels.decodePng(
        ImageKernels.synthPng(id))).longValue
    val known = Seq(
      (100L, dh(0L)),                               // hamming 0 of image 0
      (101L, dh(0L) ^ (1L << 17)),                  // hamming 1 of image 0
      (102L, dh(2L) ^ (1L << 63) ^ 1L),             // hamming 2 of image 2
      (103L, dh(4L) ^ 0xf0L))                       // hamming 4 of image 4
      .toDF("known_id", "hash")
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (ts("2024-01-01 00:00:01"), 0L, ImageKernels.synthPng(0L)),
      (ts("2024-01-01 00:00:02"), 2L, ImageKernels.synthPng(2L)),
      (ts("2024-01-01 00:00:03"), 4L, ImageKernels.synthPng(4L)),
      (ts("2024-01-01 00:00:04"), 9L, "junk".getBytes))
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "known_id", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val batch = collectPairs(graft.streaming.StreamingMedia
      .nearDupPairsStream(rows.toDF("ts", "media_id", "payload"), known,
        maxHamming = 2))
    // image 0 matches 100 (h0) and 101 (h1); image 2 matches 102 (h2 —
    // incl. a sign-bit flip); image 4's only neighbor is at h4 → out;
    // junk decodes to null → never matches
    assert(batch === Seq((0L, 100L, 0), (0L, 101L, 1), (2L, 102L, 2)))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Array[Byte])]
    val name = s"imgneardup_${System.nanoTime()}"
    val q = graft.streaming.StreamingMedia.nearDupPairsStream(
        input.toDF().toDF("ts", "media_id", "payload"), known,
        maxHamming = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      assert(collectPairs(spark.table(name)) === batch)
      // the micro-batch physical plan must be the rewritten shape:
      // block explodes + hash join, never a per-arrival corpus NLJ
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
      val plan = baos.toString
      assert(plan.contains("Generate"), plan.take(400))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(400))
    } finally q.stop()
  }

  test("decodePng returns null (no hang) on an FDICT zlib stream, and " +
    "a malformed video keeps its id as one null row") {
    import graft.functions.ImageKernels
    // hand-build: signature + IHDR(1x1 gray) + IDAT whose zlib header
    // sets the preset-dictionary flag (0x78 0xBB) — inflate then yields
    // zero bytes with needsDictionary(); the old needsInput-only guard
    // spun forever here (review r15)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(t: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      out.write(t.getBytes("US-ASCII")); out.write(data)
      out.write(Array[Byte](0, 0, 0, 0)) // CRC unchecked by the decoder
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0))
    chunk("IDAT", Array(0x78, 0xBB, 0x11, 0x22, 0x33).map(_.toByte))
    chunk("IEND", Array.empty)
    assert(ImageKernels.decodePng(out.toByteArray) == null)
    // malformed GVID through the operator: the video_id survives as a
    // single all-null row (in-band), never silently vanishes
    import spark.implicits._
    val bad = Seq((5L, "GVIDjunk!".getBytes))
      .toDF("media_id", "payload")
    val rows = Multimodal.videoFrameSample(bad).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 5L && rows(0).isNullAt(1) &&
      rows(0).isNullAt(4))
  }

  test("resize: area-average means exact, re-encode round-trips, " +
    "upscale refuses in-band") {
    import graft.functions.ImageKernels
    // 4×2 → 2×1: cells are the quadrant pairs; integer means exact
    val img = new ImageKernels.GrayImage(4, 2,
      Array(10, 20, 30, 40,
            50, 60, 70, 81))
    val r = ImageKernels.resizeGray(img, 2, 1)
    assert(r.width === 2 && r.height === 1)
    assert(r.lum.toSeq === Seq((10 + 20 + 50 + 60) / 4,
      (30 + 40 + 70 + 81) / 4)) // floor division: 55
    // upscale refuses (null), as does a degenerate target
    assert(ImageKernels.resizeGray(img, 8, 2) == null)
    assert(ImageKernels.resizeGray(img, 4, 3) == null)
    // the expression path: resize → re-encode → decode reproduces the
    // kernel's pixels exactly (the PNG round trip loses nothing)
    import spark.implicits._
    val df = Seq((7L, ImageKernels.synthPng(7L))).toDF("media_id", "payload")
    val thumb = Multimodal.resizeMedia(df, 5, 4).collect()(0)
      .getAs[Array[Byte]]("payload")
    val dec = ImageKernels.decodePng(thumb)
    val src = ImageKernels.decodePng(ImageKernels.synthPng(7L))
    val expect = ImageKernels.resizeGray(src, 5, 4)
    assert(dec.width === 5 && dec.height === 4)
    assert(dec.lum.toSeq === expect.lum.toSeq)
    // grayscale re-encode: half the bytes of an RGBA original's class
    assert(thumb.length < ImageKernels.synthPng(7L).length)
  }

  test("video container round-trips frames; sampling keeps every " +
    "stride-th; malformed payloads degrade in-band") {
    import spark.implicits._
    import graft.functions.ImageKernels
    val frames = Array.tabulate(5)(f => ImageKernels.synthPng(100L + f))
    val vid = ImageKernels.encodeVideo(frames)
    val back = ImageKernels.decodeVideo(vid)
    assert(back.length === 5)
    frames.indices.foreach(f => assert(back(f).toSeq === frames(f).toSeq))
    assert(ImageKernels.decodeVideo("AVI?junk".getBytes) == null)
    assert(ImageKernels.decodeVideo(vid.take(20)) == null) // truncated
    // operator: stride-2 sampling of the synthetic corpus keeps frames
    // 0,2,4,... and each sampled frame's dhash equals the dhash of its
    // closed-form seed image
    val vm = Multimodal.videoMedia(Seq(3L).toDF("doc_id")) // 4+3%4 = 7 frames
    val out = Multimodal.videoFrameSample(vm, stride = 2)
      .select("video_id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(0, 2, 4, 6))
    out.foreach { case (_, f, dh) =>
      val seed = ImageKernels.decodePng(ImageKernels.synthPng(3L * 31 + f))
      assert(dh === ImageKernels.dhash64(seed).longValue, s"frame $f")
    }
  }

  test("WAV codec round-trips samples; stereo mixes down (l+r)>>1; " +
    "malformed and short clips degrade in-band") {
    import graft.functions.AudioKernels
    val samples = Array.tabulate(200)(t => (t * 37 % 4001) - 2000)
    val clip = AudioKernels.decodeWav(AudioKernels.encodeWav(22050, samples))
    assert(clip != null && clip.sampleRate === 22050)
    assert(clip.samples.toSeq === samples.toSeq)
    // stereo: hand-build a 2-channel file (encodeWav is mono-only) and
    // pin the exact (l+r)>>1 mixdown incl. a negative odd sum (floor)
    val l = Array(100, -101, 32000); val r = Array(50, -100, 32000)
    val mono = AudioKernels.encodeWav(8000, Array(0, 0, 0))
    val stereo = mono.clone()
    def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    }
    putLe16(stereo, 22, 2)          // channels = 2
    putLe16(stereo, 32, 4)          // block align = 4
    putLe16(stereo, 28, 8000 * 4)   // byte rate (low half is enough here)
    val data = new Array[Byte](44 + 12)
    System.arraycopy(stereo, 0, data, 0, 44)
    putLe16(data, 40, 12)           // data size = 3 frames × 4 bytes
    for (i <- 0 until 3) {
      putLe16(data, 44 + i * 4, l(i) & 0xffff)
      putLe16(data, 44 + i * 4 + 2, r(i) & 0xffff)
    }
    putLe16(data, 4, 36 + 12)       // RIFF size (low half)
    val st = AudioKernels.decodeWav(data)
    assert(st != null)
    assert(st.samples.toSeq === l.zip(r).map(p => (p._1 + p._2) >> 1).toSeq)
    // malformed bytes and a sub-65-sample clip degrade in-band
    assert(AudioKernels.decodeWav("noise".getBytes) == null)
    val short = AudioKernels.decodeWav(
      AudioKernels.encodeWav(8000, Array.fill(64)(1)))
    assert(short != null &&
      AudioKernels.audioFingerprint(short) == null)
  }

  test("audio fingerprint is amplitude-scale invariant; near-dup finds " +
    "the planted pairs; stats match the closed form") {
    import spark.implicits._
    import graft.functions.AudioKernels
    val media = Multimodal.audioMedia((0L to 9L).map(Tuple1(_)).toDF("doc_id"))
    val an = Multimodal.audioAnalysis(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // pairs 2k/2k+1: ×2 amplitude → identical fingerprint, 2× sums
    (0L to 8L by 2).foreach { k =>
      assert(an(k).getLong(3) === an(k + 1).getLong(3),
        s"pair ($k,${k + 1}) fingerprints differ")
      assert(an(k + 1).getLong(4) === 2 * an(k).getLong(4)) // sum_abs
      assert(an(k + 1).getLong(5) === 2 * an(k).getLong(5)) // max_abs
    }
    // one clip's stats against the closed form
    val id = 3L
    val n = AudioKernels.synthLen(id)
    val ss = Array.tabulate(n)(AudioKernels.synthSample(id))
    assert(an(id).getInt(1) === AudioKernels.synthRate(id))
    assert(an(id).getInt(2) === n)
    assert(an(id).getLong(4) === ss.map(s => math.abs(s).toLong).sum)
    assert(an(id).getLong(6) ===
      (1 until n).count(t => (ss(t) >= 0) != (ss(t - 1) >= 0)).toLong)
    assert(an(id).getLong(9) === ss.map(_.toLong).sum)
    // near-dup operator recovers every planted pair at hamming 0
    val pairs = Multimodal.audioNearDups(media)
      .filter(org.apache.spark.sql.functions.col("hamming") === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L to 8L by 2).foreach(k => assert(pairs.contains((k, k + 1))))
  }
}
