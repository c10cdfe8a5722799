package graft.tools

/** Splits a query's per-run cost into PLANNING (analyze + optimize +
  * codegen of a freshly built DataFrame) vs EXECUTION (re-running the
  * same DataFrame whose QueryExecution is already materialized) — the
  * r19 q08 adjudication needs to know which side the exact-meanQ
  * respelling is paying on. Usage: `ProbePlanCost <queryName> [sfDir]`.
  */
object ProbePlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Engine.builder("graft-probe-plancost")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm: code paths + the sf-dir memos
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries(name)(spark, sfDir).count()

    def stats(label: String, ts: Seq[Double]): Unit =
      println(f"PLANCOST $name $label%-14s min=${ts.min}%6.3f " +
        f"med=${ts.sorted.apply(ts.size / 2)}%6.3f " +
        s"samples=${ts.map(t => f"$t%.3f").mkString(",")}")

    // same-DF reruns: planning already done, pure execution
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    stats("execute-only", (1 to 8).map { _ =>
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    })
    // fresh DF per run: planning + execution (the bench shape)
    stats("plan+execute", (1 to 8).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    })
    spark.stop()
  }
}
