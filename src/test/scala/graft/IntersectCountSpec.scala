package graft

import org.apache.spark.sql.functions._

import graft.functions.SetFunctions.set_intersect_count

/** Pins `set_intersect_count(a, b)` ≡ `size(array_intersect(a, b))` —
  * the r19 count-only kernel that replaced the materializing form on the
  * exact-similarity verify paths (q11/q119 shingle strings, q154/q158
  * fingerprint longs). Random fixtures sweep duplicates, disjoint and
  * identical sets, empties, null elements, and null arrays for both
  * element types.
  */
class IntersectCountSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260817)

  test("long arrays: kernel count equals size(array_intersect) on a " +
    "random sweep with duplicates and empties") {
    val rows = (0 until 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong)
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(set_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
    // non-vacuous: some rows intersect, some don't
    assert(df.filter(col("ref") > 0).count() > 0)
    assert(df.filter(col("ref") === 0).count() > 0)
  }

  test("string arrays: kernel count equals size(array_intersect) on a " +
    "random sweep") {
    val words = Vector("a", "bb", "ccc", "dd", "e", "ffff", "gg", "hhh",
      "éé", "x y", "")
    val rows = (0 until 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length)))
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(set_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("null elements and null arrays follow array_intersect exactly") {
    val df = Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])](
      (Some(Seq(Some(1L), None, Some(2L))), Some(Seq(None, Some(2L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L)))),   // null only left
      (Some(Seq(None, None)), Some(Seq(None))),           // null both, dup
      (Some(Seq.empty), Some(Seq(Some(1L)))),
      (None, Some(Seq(Some(1L)))),                        // null array
      (Some(Seq(Some(3L))), None)
    ).toDF("a", "b")
      .select(set_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), s"count: $r")
    }
  }

  test("interpreted eval matches codegen (filter pushes the expression " +
    "into a non-codegen context)") {
    val rows = (0 until 100).map { i =>
      (Seq.fill(10)(rnd.nextInt(8).toLong), Seq.fill(10)(rnd.nextInt(8).toLong))
    }
    val df = rows.toDF("a", "b")
    val viaEval = df.filter(
      set_intersect_count(col("a"), col("b")) >= 3).count()
    val viaRef = df.filter(
      size(array_intersect(col("a"), col("b"))) >= 3).count()
    assert(viaEval === viaRef)
  }
}
