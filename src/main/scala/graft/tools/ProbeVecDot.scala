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
    spark.stop()
  }
}
