package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a list of queries into one file per
  * query — the r19 plan-evidence capture (`plans/r19/<query>_<tag>.txt`).
  * Uses the bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, AQE on) so the audited plans are the benched plans.
  *
  * Usage: runMain graft.tools.ExplainAll <outDir> <tag> <q1,q2,...> [sfDir]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.builder("graft-explain-all")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // initial plan (AQE isFinalPlan=false) — deterministic, judgeable
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"EXPLAINED $name -> $outDir/${name}_$tag.txt " +
        s"(${plan.count(_ == '\n')} lines)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
