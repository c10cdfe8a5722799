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

  private def readMarker(f: org.apache.hadoop.fs.FileSystem,
                         p: Path): (Long, Long) = {
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString.trim
    finally in.close()
    val parts = txt.split(" ")
    (parts(0).toLong, parts(1).toLong)
  }

  /** (version, lastAppliedBatchId) from the `_HEAD` marker; (0, -1) for
    * an empty store. If `_HEAD` is missing but version directories exist
    * (a crash between publish steps on a filesystem without overwrite-
    * rename, or manual damage), recovers from the highest version whose
    * in-directory `_GRAFT_META` twin is present — `_GRAFT_META` is
    * written after the parquet data and carries the same
    * `"<version> <batchId>"` payload, so recovery restores BOTH the
    * readable version and the replay-dedup cursor.
    */
  def head(spark: SparkSession, root: String): (Long, Long) = {
    val f = fs(spark, root)
    val p = new Path(root, "_HEAD")
    if (f.exists(p)) readMarker(f, p)
    else {
      val rootP = new Path(root)
      if (!f.exists(rootP)) (0L, -1L)
      else {
        val versions = f.listStatus(rootP).iterator.collect {
          case s if s.isDirectory &&
              s.getPath.getName.matches("v\\d+") &&
              f.exists(new Path(s.getPath, "_GRAFT_META")) =>
            s.getPath.getName.drop(1).toLong
        }.toSeq
        if (versions.isEmpty) (0L, -1L)
        else readMarker(f, new Path(s"$root/v${versions.max}", "_GRAFT_META"))
      }
    }
  }

  /** Publish `v<N>` as current. Ordering makes every crash point safe:
    * (1) `_GRAFT_META` lands inside the (already complete) version dir —
    * a crash before step 2 leaves the old `_HEAD`, and recovery-by-scan
    * would find the new complete version, both valid; (2) `_HEAD` is
    * replaced via rename-with-OVERWRITE (atomic on local and HDFS
    * filesystems), so a reader never observes a missing or partial
    * marker on the happy path — the scan in [[head]] is belt and braces
    * for stores written by older code or object stores without atomic
    * rename.
    */
  private def writeHead(spark: SparkSession, root: String, v: Long,
                        batchId: Long): Unit = {
    val f = fs(spark, root)
    val payload = s"$v $batchId".getBytes("UTF-8")
    val meta = new Path(summaryPath(root, v), "_GRAFT_META")
    val mOut = f.create(meta, true)
    try mOut.write(payload) finally mOut.close()
    val tmp = new Path(root, "_HEAD.tmp")
    val out = f.create(tmp, true)
    try out.write(payload) finally out.close()
    val headP = new Path(root, "_HEAD")
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        headP.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, headP, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        // filesystem without overwrite-rename: fall back to
        // delete+rename; the _GRAFT_META twin written above makes the
        // non-atomic window recoverable via the scan in head()
        f.delete(headP, false)
        if (!f.rename(tmp, headP))
          throw new java.io.IOException(s"cannot publish _HEAD in $root")
    }
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
