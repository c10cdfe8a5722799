package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.SetFunctions.set_intersect_count

/** r19 microbench: `size(array_intersect(a,b))` vs the count-only
  * [[graft.functions.SetIntersectCount]] kernel, long and string element
  * types, same data, min-of-5 in one warm JVM — the controlled A/B the
  * whole-query numbers are too noisy for on this host.
  */
object ProbeIntersect {
  private def timeMin(label: String)(f: => Unit): Unit = {
    f // warm
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBEINT $label%-28s min=${ts.min}%6.3f s " +
      s"samples=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("graft-probe-intersect")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nPairs = 200000
    val setLen = 400
    // deterministic pseudo-random long sets with ~50% overlap between a/b
    val longs = spark.range(nPairs).select(col("id"),
      transform(sequence(lit(0), lit(setLen - 1)),
        i => xxhash64(col("id") % 512, i)).as("a"),
      transform(sequence(lit(0), lit(setLen - 1)),
        i => xxhash64((col("id") + 1) % 512, i + 200)).as("b"))
      .persist()
    longs.count()

    timeMin("long  array_intersect") {
      longs.select(sum(size(array_intersect(col("a"), col("b")))))
        .collect(); ()
    }
    timeMin("long  kernel") {
      longs.select(sum(set_intersect_count(col("a"), col("b"))))
        .collect(); ()
    }

    longs.unpersist()
    val nStrPairs = 50000
    val strs = spark.range(nStrPairs).select(col("id"),
      transform(sequence(lit(0), lit(setLen - 1)),
        i => concat(lit("shingle word piece "),
          (xxhash64(col("id") % 512, i) % 1000).cast("string"))).as("a"),
      transform(sequence(lit(0), lit(setLen - 1)),
        i => concat(lit("shingle word piece "),
          (xxhash64((col("id") + 1) % 512, i + 200) % 1000).cast("string"))).as("b"))
      .persist()
    strs.count()

    timeMin("string array_intersect") {
      strs.select(sum(size(array_intersect(col("a"), col("b")))))
        .collect(); ()
    }
    timeMin("string kernel") {
      strs.select(sum(set_intersect_count(col("a"), col("b"))))
        .collect(); ()
    }
    spark.stop()
  }
}
