package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.min_hash_sig

/** Pins the r19 byte-compare minHashSig kernel against the definition it
  * optimizes: per permutation j, the lexicographic MIN of
  * `md5Hex(j + "|" + shingle)` over the shingle set (the hex-string
  * compare the kernel now performs on raw digest bytes).
  */
class MinHashSigSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  test("kernel signature ≡ per-permutation min of md5 hex strings") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "ε", "züge",
      "x y z", "0", "longer shingle text here")
    val rows = (0 until 40).map { _ =>
      Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.length)))
    }
    val k = 6
    val got = rows.toDF("sh")
      .select(min_hash_sig(col("sh"), k).as("mh"))
      .as[Seq[String]].collect()
    rows.zip(got).foreach { case (sh, sig) =>
      val ref = (0 until k).map(j => sh.map(s => md5Hex(s"$j|$s")).min)
      assert(sig === ref)
    }
  }

  test("empty shingle array yields null") {
    val out = Seq(Seq.empty[String]).toDF("sh")
      .select(min_hash_sig(col("sh"), 4)).collect()(0)
    assert(out.isNullAt(0))
  }
}
