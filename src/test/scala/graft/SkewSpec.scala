package graft

import graft.operators.Skew

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toDouble))
      .toDF("k", "v")
    val dim = (0 to 7).map(i => (i.toLong, s"d$i")).toDF("k", "name")

    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)

    assert(salted.count() === plain.count())
    val a = plain.select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val b = salted.select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(a === b)
  }

  test("salt is deterministic and spreads the hot key") {
    val fact = (1 to 400).map(i => (1L, i.toDouble)).toDF("k", "v")
    val salts = fact.select(Skew.salt(8, $"v").as("s")).as[Long].collect()
    assert(salts.toSet.size > 4)          // hot key spread over many buckets
    val salts2 = fact.select(Skew.salt(8, $"v").as("s")).as[Long].collect()
    assert(salts.toSeq === salts2.toSeq)  // reproducible
  }
}
