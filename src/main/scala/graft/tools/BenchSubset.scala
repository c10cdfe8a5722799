package graft.tools

import scala.util.control.NonFatal

/** Focused re-bench for regression triage: runs ONLY the named gated
  * queries (comma-separated in args(0)) against `SPARK_GRAFT_SF_DIR`,
  * one warmup each at sf0.001 then min/median of 5 timed runs — the
  * follow-up `diff_vs_prev` asks for when a bench round flags an
  * envelope-escaping mover: a cluster of adjacent query names moving
  * together is this host's multi-minute stall window, not a regression,
  * and a clean-room subset run settles it in two minutes instead of a
  * full 199-query round.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchSubset
  * q93_dedup_savings,q98_bpe_train"`.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchSubset q1,q2,...")
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.builder("graft-bench-subset")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = {
      val d = new java.io.File("/root/testdata/sf0.001")
      if (d.isDirectory) d.getPath else sfDir
    }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { graft.SparkEntry.queries(n)(spark, sfDir).count(); true }
        catch { case NonFatal(_) => false }
        spark.catalog.clearCache()
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // failure markers (-1.0) must not pose as a fast min or skew the
      // median — report them as an explicit fail count instead
      val ok = ts.filter(_ >= 0)
      val fails = ts.size - ok.size
      val minS = if (ok.isEmpty) "   FAIL" else f"${ok.min}%7.3f"
      val medS = if (ok.isEmpty) "   FAIL"
        else f"${ok.sorted.apply(ok.size / 2)}%7.3f"
      println(f"SUBSET $n%-28s min=$minS med=$medS fails=$fails " +
        f"samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
