package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.operators.Relational

/** Continuously-maintained materialized summary — the streaming leg of
  * the q188/q189 story: an append STREAM of base rows folds into the
  * stored summary artifact per micro-batch via
  * [[Relational.summaryApplyDelta]] (the same exact merge laws q189
  * hash-gates), so the artifact the MvRewrite rule answers dashboards
  * from is never more than one trigger behind the stream.
  *
  * Versioned-artifact protocol (the SnapshotStore discipline applied to
  * a summary): each batch writes `v<N+1>` then atomically rewrites the
  * `_HEAD` marker `"<version> <batchId>"`. Restarted/replayed batches
  * (foreachBatch is at-least-once) are IDEMPOTENT: a batch whose id is
  * ≤ the recorded one is skipped, so a retry after the marker moved
  * cannot double-apply a delta — the classic streaming-MERGE hazard.
  * Readers always resolve through `_HEAD`, so they see a complete old
  * version or a complete new one, never a partial write.
  *
  * One store, ONE maintenance stream: batch ids are meaningful within a
  * single query lineage, so a resume must reuse the checkpoint location
  * (a fresh checkpoint restarts ids at 0 and its batches would be
  * skipped as replays — the spec pins exactly that behavior).
  */
object StreamingSummary {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, lastAppliedBatchId) from the `_HEAD` marker; (0, -1) for
    * an empty store.
    */
  def head(spark: SparkSession, root: String): (Long, Long) = {
    val f = fs(spark, root)
    val p = new Path(root, "_HEAD")
    if (!f.exists(p)) (0L, -1L)
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      val parts = txt.split(" ")
      (parts(0).toLong, parts(1).toLong)
    }
  }

  private def writeHead(spark: SparkSession, root: String, v: Long,
                        batchId: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, "_HEAD.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$v $batchId".getBytes("UTF-8")) finally out.close()
    f.delete(new Path(root, "_HEAD"), false)
    if (!f.rename(tmp, new Path(root, "_HEAD")))
      throw new java.io.IOException(s"cannot publish _HEAD in $root")
  }

  def summaryPath(root: String, v: Long): String = s"$root/v$v"

  /** Bootstrap the store from an initial summary relation (may be an
    * empty-grouped frame for a from-scratch stream).
    */
  def init(spark: SparkSession, root: String, summary: DataFrame): Unit = {
    summary.write.mode("overwrite").parquet(summaryPath(root, 1L))
    writeHead(spark, root, 1L, -1L)
  }

  /** Current summary relation through the `_HEAD` indirection. */
  def current(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(summaryPath(root, head(spark, root)._1))

  /** Wire an append stream of base rows into the maintained artifact.
    * Caller starts the returned writer (and owns checkpointing).
    */
  def maintain(deltaStream: DataFrame, root: String,
               groupCols: Seq[String], cntCol: String,
               sumCols: Map[String, String],
               minCols: Map[String, String] = Map.empty,
               maxCols: Map[String, String] = Map.empty): DataStreamWriter[Row] =
    deltaStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (v, lastId) = head(spark, root)
        if (batchId > lastId) { // replay of an applied batch: skip
          val cur = spark.read.parquet(summaryPath(root, v))
          Relational.summaryApplyDelta(cur, batch, groupCols, cntCol,
              sumCols, minCols, maxCols)
            .write.mode("overwrite").parquet(summaryPath(root, v + 1))
          writeHead(spark, root, v + 1, batchId)
        }
    }
}
