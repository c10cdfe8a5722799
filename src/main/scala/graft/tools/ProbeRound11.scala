package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.QualityModel
import graft.sources.Tables

/** Round-11 probes.
  *
  * `weights [sfDir]` — reproduce the [[QualityModel.DefaultWeights]]
  * artifact: train the curated-source logistic on the given corpus
  * (default sf0.01, the artifact's provenance) and print the raw and
  * 6-decimal-rounded weight vectors plus train-set accuracy under the
  * rounded weights.
  */
object ProbeRound11 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("graft-probe11")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("weights") match {
      case "weights" =>
        val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
        val docs = Tables.documents(spark, sfDir)
        val t0 = System.nanoTime()
        val w = QualityModel.train(docs)
        val dt = (System.nanoTime() - t0) / 1e9
        val rounded = w.map(x =>
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        println(s"TRAIN_SECONDS $dt")
        println("RAW_WEIGHTS " + w.mkString(", "))
        println("ARTIFACT Array(" + rounded.mkString(", ") + ")")
        // accuracy of the ROUNDED artifact against the training labels
        import org.apache.spark.sql.functions._
        val scored = QualityModel.scoreDocs(docs, rounded.toSeq)
          .join(docs.select(col("doc_id"),
            QualityModel.labelHeuristic().cast("int").as("y")), "doc_id")
        val acc = scored.agg(
          avg(when(col("accept") === col("y"), 1.0).otherwise(0.0))).head().getDouble(0)
        println(s"TRAIN_ACCURACY $acc")
      case other =>
        System.err.println(s"unknown probe '$other'")
    }
    spark.stop()
  }
}
