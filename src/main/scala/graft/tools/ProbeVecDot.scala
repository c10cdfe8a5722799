package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.VectorFunctions.vec_dot
import graft.operators.Similarity

/** Micro-isolation for the round-9 ANN probe anomaly: the IVF/SRP probes
  * each cost ~1,300 s at 1M vectors regardless of candidate volume, so
  * the fixed cost sits in the corpus-side projection. Candidate causes,
  * timed one variable at a time on the same 1M-row persisted corpus:
  * column⋅column dot, column⋅literal dot (the centroid/plane shape), the
  * 64-plane SRP signature, and the k-cell argmin assignment expression.
  */
object ProbeVecDot {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-vecdot").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = ScaleProbe.syntheticEmbeddings(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    embs.count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name out=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }

    val plane: Seq[Double] = Similarity.srpPlanes(0).toSeq

    time("dot_col_col_1m") {
      embs.select(vec_dot(col("embedding"), col("embedding")).as("d"))
        .agg(sum(col("d"))).collect()(0).getDouble(0).round
    }
    time("dot_col_lit_1m") {
      embs.select(vec_dot(col("embedding"), typedlit(plane)).as("d"))
        .agg(sum(col("d"))).collect()(0).getDouble(0).round
    }
    time("srp_64_signatures_1m") {
      val bits = (0 until 64).map { b =>
        (vec_dot(col("embedding"), typedlit(Similarity.srpPlanes(b).toSeq)) >= 0)
          .cast("int")
      }
      embs.select(bits.reduce(_ + _).as("d"))
        .agg(sum(col("d"))).collect()(0).getLong(0)
    }
    time("kmeans_argmin_4cells_1m") {
      val cells = Similarity.kmeansCells(embs, k = 4, iters = 1)
      cells.agg(sum(col("cell"))).collect()(0).getLong(0)
    }

    // ---- stage audit: where does the residual fixed cost of the 1M ANN
    // probes live? Per-stage (tasks, total runtime, max task runtime) via
    // listener — a >5 s stage with 1 task is the straggler to explain.
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages.add((sc.stageInfo.stageId, sc.stageInfo.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L))
      }
    })
    def audit(name: String)(f: => Long): Unit = {
      stages.clear()
      time(name)(f)
      org.apache.spark.sql.graftbridge.Bridge.waitForListeners(spark.sparkContext)
      stages.forEach { case (id, n, run, cpu) =>
        if (run > 5000)
          println(f"PROBE ${name}_stage id=$id tasks=$n run_ms=$run cpu_ms=$cpu")
      }
    }
    def querySample(df: org.apache.spark.sql.DataFrame) =
      df.filter(pmod(col("vec_id"), lit(15625L)) === 0)
    audit("srp_topk_1m_stage_audit") {
      Similarity.srpTopK(embs, querySample(embs), k = 10, bits = 64, bands = 4)
        .count()
    }
    audit("ivf_k64_p2_1m_stage_audit") {
      Similarity.ivfTopKMultiProbe(embs, querySample, k = 10,
        kCells = 64, iters = 2, nProbe = 2).count()
    }
    spark.stop()
  }
}
