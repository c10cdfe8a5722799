package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: smoke `SparkEntry.entry` and print the formatted physical plan
  * of one or all queries, to audit broadcasts / shuffles / pushdown.
  *
  * Usage: runMain graft.tools.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q08_flagship_anomalies")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // Engine.builder, not a bare session: the audit must see the plans
    // the engine actually runs — with GraftExtensions' optimizer rules
    // (HammingJoinRewrite/BandJoinRewrite) injected, exactly like
    // Verify/Bench/tests
    val spark = graft.Engine.builder("graft-explain")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entry = graft.SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${entry.count()}")
    println(s"ENTRY_COLS=${entry.schema.map(_.name).mkString(",")}")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"== $name on $sfDir: rows=${df.count()} ==")
    df.explain("formatted")
    spark.stop()
  }
}
