package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hll_reg
import graft.operators.Sketches

/** Pins the r20 fused [[graft.functions.HllReg]] kernel against the
  * conv/substring/greatest spelling it replaces in
  * [[Sketches.registerUpdates]]: bucket = first 2 md5 hex digits, rho =
  * leading zeros of the next 52 bits + 1 (via the 53-way shiftright
  * chain), on random ASCII, multi-byte, empty, and null inputs.
  * (The v = 0 branch — rho = 53 — is unreachable by hashing real inputs
  * at probability 2^-52; it equals the old chain's greatest() = 0 case
  * by inspection.)
  */
class HllRegSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(157)
  private val pieces = Vector("tok", "word", "été", "züge", "😀", " ",
    "0123456789", "a|b", "", "the", "and")

  private def refRho(v: org.apache.spark.sql.Column) = {
    val h = greatest((0 until 53).map(j =>
      when(shiftright(v, j) > 0, lit(j + 1)).otherwise(lit(0))): _*)
    (lit(53) - h).cast("int")
  }

  test("hll_reg ≡ conv-spelling bucket and rho") {
    val rows = (0 until 2000).map { _ =>
      Seq.fill(1 + rnd.nextInt(5))(pieces(rnd.nextInt(pieces.length))).mkString
    } :+ ""
    val df = rows.toDF("s").select(
      shiftright(hll_reg(col("s")), 6).as("bucket_fast"),
      hll_reg(col("s")).bitwiseAND(lit(63)).as("rho_fast"),
      conv(substring(md5(col("s")), 1, 2), 16, 10).cast("int").as("bucket_ref"),
      refRho(conv(substring(md5(col("s")), 3, 13), 16, 10).cast("long"))
        .as("rho_ref"))
    assert(df.filter(col("bucket_fast") =!= col("bucket_ref") ||
      col("rho_fast") =!= col("rho_ref")).count() === 0)
    // rho ∈ [1, 53], bucket ∈ [0, 255] by construction
    assert(df.filter(col("rho_fast") < 1 || col("rho_fast") > 53 ||
      col("bucket_fast") < 0 || col("bucket_fast") > 255).count() === 0)
  }

  test("registerUpdates: fused projection matches the ref spelling end to end") {
    val docs = (0 until 300).map(i =>
      (s"src${i % 4}", s"tok$i word${i % 17} été$i")).toDF("source", "text")
    val toks = docs.select(col("source"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val fused = Sketches.registerUpdates(toks, col("source"), col("tok"))
    val ref = toks.select(col("source").as("g"),
      conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("int").as("bucket"),
      refRho(conv(substring(md5(col("tok")), 3, 13), 16, 10).cast("long"))
        .as("rho"))
    assert(fused.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(fused).count() === 0)
    // names and types pinned; the fused kernel is strictly tighter on
    // nullability (non-null input ⇒ non-null register, where conv was
    // conservatively nullable)
    assert(fused.schema.map(f => (f.name, f.dataType)) ===
      ref.schema.map(f => (f.name, f.dataType)))
  }

  test("null value yields a null register row field, like the conv spelling") {
    val out = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(hll_reg(col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 2), 16, 10).cast("int").as("ref"))
      .collect()
    out.foreach { r => assert(r.isNullAt(0) === r.isNullAt(1)) }
  }
}
