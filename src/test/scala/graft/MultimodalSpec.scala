package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("binary payload plumbing + partition-batched decode stub") {
    val docs = Seq((2L, "abcd"), (3L, "xy")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    // payload stays binary end-to-end
    assert(media.schema("payload").dataType.typeName === "binary")

    val feats = Multimodal.decodeFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(2L).kind === "image")        // even id
    assert(feats(3L).kind === "audio")        // odd id
    assert(feats(2L).n_bytes === 4)
    assert(feats(2L).header === "61626364")   // "abcd" utf-8 hex
    // deterministic rolling checksum: ((('a'*31+'b')*31+'c')*31+'d') & 0x7fffffff
    val expected = "abcd".getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
    assert(feats(2L).checksum === expected)
  }
}
