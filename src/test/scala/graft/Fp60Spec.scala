package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fp60_long

/** Pins the r19 fused [[graft.functions.Fp60]] kernel against the
  * spelling it replaces — `conv(substring(md5(x), 1, 15), 16, 10)` cast
  * to long — on random ASCII, multi-byte, empty, and null inputs, in
  * both codegen and interpreted evaluation.
  */
class Fp60Spec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(60)
  private val pieces = Vector("word", "sh", "été", "züge", "😀", " ",
    "0123456789", "a|b", "")

  test("fp60 kernel ≡ conv(substring(md5, 1, 15), 16, 10)::long") {
    val rows = (0 until 500).map { _ =>
      Seq.fill(rnd.nextInt(6))(pieces(rnd.nextInt(pieces.length))).mkString
    } :+ ""
    val df = rows.toDF("s").select(
      fp60_long(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
    assert(df.filter(col("fast") < 0).count() === 0) // 60-bit: non-negative
  }

  test("null input yields null, like the conv spelling") {
    val out = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(fp60_long(col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }
}
