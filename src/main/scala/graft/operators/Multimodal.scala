package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MediaFunctions.parse_media

/** Multimodal-column operators: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, and metadata extraction is
  * REAL pure-JVM header parsing ([[graft.functions.MediaHeaders]] — PNG
  * IHDR dimensions, JPEG SOF marker walk, WAV fmt sample rate) as a
  * Catalyst expression. No codec library is involved: container headers
  * are plain byte layouts, so the decode-to-pixels step is the only thing
  * a production deployment still plugs in (as another expression or a
  * `mapInPandas`-style batch stage over the same binary column).
  *
  * Scale notes: header parsing is a narrow per-row projection (no
  * shuffle); payload columns stay binary end-to-end (never stringified);
  * metadata-only queries never touch the payload column thanks to parquet
  * column pruning — that's the entire point of splitting metadata from
  * payload.
  */
object Multimodal {

  /** Build a media table from the documents table (text bytes standing in
    * for encoded payloads — the driver testdata ships no real media).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      col("text").cast("binary").as("payload"))

  private def hex8(c: Column) = lpad(hex(c), 8, "0")
  private def hex4(c: Column) = lpad(hex(c), 4, "0")
  /** Little-endian byte order of a u32, as hex (WAV fields are LE). */
  private def le32hex(c: Column) = {
    val h = hex8(c)
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2),
      substring(h, 1, 2))
  }

  /** Synthetic media table carrying REAL file headers: each payload is a
    * spec-conformant PNG signature+IHDR, JFIF APP0+SOF0 prefix, or
    * RIFF/WAVE fmt header, built from codegen'd builtins
    * (`unhex`/`concat`/`lpad`/`hex`) with the geometry/sample-rate a
    * closed form of `doc_id` — so the construct → [[decodeMeta]] round
    * trip is verifiable by an oracle that computes the closed form
    * directly (q68). The testdata ships no real media files; real headers
    * built byte-for-byte to the container specs are the next best
    * gate-able thing.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    // PNG: signature + IHDR(len 13): width, height (u32 BE), bit depth 8,
    // color type 6 (RGBA), compression/filter/interlace 0
    val png = concat(
      lit("89504E470D0A1A0A0000000D49484452"),
      hex8(id % 640 + 1), hex8(id % 480 + 1), lit("0806000000"))
    // JPEG: SOI + JFIF APP0(len 16) + SOF0(len 17): precision 8,
    // height/width (u16 BE), 3 components
    val jpeg = concat(
      lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      hex4(id % 768 + 1), hex4(id % 1024 + 1), lit("03011100021101031101"))
    // WAV: RIFF/WAVE + fmt(len 16): PCM, 2 channels, sample rate and
    // byte rate (u32 LE), block align 4, 16 bits/sample
    val rate = element_at(
      array(lit(8000L), lit(16000L), lit(22050L), lit(44100L), lit(48000L)),
      (id % 5 + 1).cast("int"))
    val wav = concat(
      lit("524946462400000057415645666D742010000000" + "0100" + "0200"),
      le32hex(rate), le32hex(rate * 4), lit("04001000"))
    docs.select(
      id.as("media_id"),
      when(id % 3 === 0, lit("png"))
        .when(id % 3 === 1, lit("jpeg"))
        .otherwise(lit("wav")).as("kind"),
      unhex(when(id % 3 === 0, png).when(id % 3 === 1, jpeg).otherwise(wav))
        .as("payload"))
  }

  /** Metadata decode: `parse_media` over the binary payload, flattened to
    * typed columns. One narrow projection — fuses with the scan; malformed
    * payloads yield `format = 'unknown'` + nulls, never an error.
    */
  def decodeMeta(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        parse_media(col("payload")).as("m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("m.format").as("format"), col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bit_depth").as("bit_depth"))

  val FeatureDim = 8

  /** Batched feature extraction over binary payloads — the
    * `mapInPandas`-shaped escape-hatch stage (Scala analog:
    * `mapPartitions` over grouped row batches) a production pipeline uses
    * for model-based embedding of images/audio. The plumbing is REAL and
    * gated: per-partition iteration in bounded `batchSize` groups (one
    * batch in memory at a time — the exact memory contract of an arrow
    * batch UDF), typed input/output rows, features as scalar columns.
    * The decode-to-pixels step is the documented STUB: a real deployment
    * replaces `stubDecodeFeature` with the codec + model call; the
    * deterministic stand-in hashes the payload so the whole stage stays
    * oracle-replayable — which is what proves the batch plumbing neither
    * drops, duplicates, nor reorders values.
    */
  def featureExtractBatches(media: DataFrame,
                            batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
    val feats = ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // production: decode `batch` payloads + run the model ONCE per
        // batch; here the per-item stub keeps values deterministic.
        // NULL payloads yield NULL features (matching md5(NULL) in the
        // oracle), never a task-killing NPE
        batch.iterator.map { case (id, kind, payload) =>
          (id, kind,
            if (payload == null) null else stubDecodeFeature(payload))
        }
      }
    }.toDF("media_id", "kind", "feat")
    feats.select(
      Seq(col("media_id"), col("kind")) ++
        (0 until FeatureDim).map(i => col("feat")(i).as(s"f$i")): _*)
  }

  /** STUB decode (the production plug-in point): 16 md5 bytes of the
    * payload as [[FeatureDim]] doubles in [0, 1], rounded for
    * cross-engine comparison.
    */
  private def stubDecodeFeature(payload: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(FeatureDim) { i =>
      val v = ((md(2 * i) & 0xff) << 8 | (md(2 * i + 1) & 0xff)).toDouble / 65535.0
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }
}
