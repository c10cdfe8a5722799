package graft.tools

import graft.{Engine, SparkEntry}

/** Ad-hoc per-query profiler: run named queries N times under the same
  * session config as [[graft.Bench]] and print per-run wall seconds.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <repeats> <query>[,<query>...]
  * Env: SPARK_GRAFT_CPUS (local[n] + shuffle partitions, default 4).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val repeats = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.builder("graft-profile")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- names; i <- 1 to repeats) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"PROFILE $name run=$i rows=$n sec=$dt%.3f")
    }
    spark.stop()
  }
}
