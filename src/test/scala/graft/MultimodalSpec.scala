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

  test("batched feature extraction is invariant to batch size and bounded") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"payload number $i"))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    def run(bs: Int) = Multimodal.featureExtractBatches(media, batchSize = bs)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    // a batch boundary mid-partition must not drop, duplicate, or
    // reorder values — the batch size is purely a memory knob
    val small = run(3)
    assert(small === run(1000))
    assert(small.size === 10)
    val feats = Multimodal.featureExtractBatches(media)
      .select((0 until Multimodal.FeatureDim)
        .map(i => org.apache.spark.sql.functions.col(s"f$i")): _*)
      .collect().flatMap(_.toSeq.map(_.asInstanceOf[Double]))
    assert(feats.forall(v => v >= 0.0 && v <= 1.0))
    // a NULL payload yields NULL features (matching md5(NULL) in SQL),
    // never a task-killing NPE
    val withNull = Seq((1L, "x"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nf = Multimodal.featureExtractBatches(
        Multimodal.mediaFromDocuments(withNull))
      .select("media_id", "f0").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nf === Map(1L -> false, 2L -> true))
  }
}
