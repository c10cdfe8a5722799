package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage layouts for the 100 TB posture. The reference's only "storage"
  * is Kafka topics + RocksDB state; a batch engine at scale lives or dies
  * by layout:
  *
  *  - [[writeEventsPartitioned]]: hive-style partitioning by event-time
  *    date. Time-bounded queries prune whole directories at planning time
  *    (`PartitionFilters` in the scan) — on a year of telemetry, a one-day
  *    query reads 1/365th of the bytes.
  *  - [[writeBucketed]]: pre-shuffled bucket layout on the join/group key.
  *    Two tables bucketed the same way join with NO exchange on either
  *    side — the shuffle is paid once at write time instead of per query.
  *    This is how the module↔panel joins (or lineitem↔orders) co-locate
  *    on a real cluster.
  */
object Writers {

  /** Date-partitioned event layout (adds `event_date` from `ts`). */
  def writeEventsPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

  /** Bucketed + bucket-sorted table on `bucketCol` (bucketed writes go
    * through the catalog, hence saveAsTable).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite").saveAsTable(table)

  /** Compressed JSON-Lines corpus interchange — the format pretraining
    * datasets actually ship in (one JSON document per line, gzip'd
    * shards). Write splits into `shards` files via a doc_id hash
    * repartition (deterministic shard membership, no global sort); read
    * applies the schema explicitly so the scan never pays the
    * infer-schema pass, and gzip (non-splittable) parallelism comes from
    * the shard count — which is why the shard count is a writer
    * parameter, not an afterthought.
    */
  def writeJsonl(docs: DataFrame, path: String, shards: Int = 8): Unit =
    docs.repartition(shards, col("doc_id"))
      .write.mode("overwrite").option("compression", "gzip").json(path)

  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Small-file compaction of a hive-partitioned parquet layout — the
    * standing maintenance job of a 100 TB lakehouse: streaming ingest and
    * fine-grained batch writes leave hundreds of small files per
    * partition, and scan cost degrades with file COUNT (task scheduling,
    * footer reads, open/close) long before it degrades with bytes.
    *
    * Rewrite shape: one shuffle keyed on `(partitionCol, salt)` where the
    * salt is a deterministic xxhash64 of the data columns modulo
    * `filesPerPartition` — each partition directory lands in at most
    * `filesPerPartition` write tasks (exactly one when 1, the default),
    * and `maxRecordsPerFile` still splits a pathologically large
    * partition so one giant date cannot produce one giant file. No RNG
    * (the engine's determinism discipline): rewriting twice produces the
    * same file membership. The rewrite goes to a temp sibling and swaps
    * in rename-aside (ADVICE r12: original → `.compact-old`, tmp →
    * target, then delete the old dir — at every instant at least one
    * complete copy exists, where the earlier delete-then-rename form had
    * a crash window that destroyed the dataset); a production deployment
    * with readers in flight swaps a manifest/table pointer instead
    * (Delta/Iceberg-style) — the data-plane job is identical.
    *
    * Returns the per-partition report (files/bytes before and after) —
    * the numbers an operator alerts on. Listing is driver-side over the
    * partition directories (#partitions + #files entries — compaction is
    * a control-plane job; parallelize the listing itself only when a
    * layout has millions of files).
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         path: String, partitionCol: String,
                         filesPerPartition: Int = 1,
                         maxRecordsPerFile: Long = 5000000L): DataFrame = {
    require(filesPerPartition >= 1, "need at least one file per partition")
    val before = partitionFileStats(spark, path)
    // an empty layout (job ran, nothing arrived) compacts to an empty
    // report — not a schema-inference failure from read.parquet
    if (before.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("partition", "files_before", "bytes_before",
          "files_after", "bytes_after")
    }
    val df = spark.read.parquet(path)
    val dataCols = df.columns.filterNot(_ == partitionCol).map(col).toSeq
    val salt = pmod(xxhash64(dataCols: _*), lit(filesPerPartition.toLong))
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    df.repartition(col(partitionCol), salt)
      .write.partitionBy(partitionCol).mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(tmp.toString)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rename-aside swap: no instant where the target has neither copy. A
    // crash after step 1 leaves the data at .compact-old (manual rename
    // restores); a crash after step 2 leaves the new layout live with a
    // stale .compact-old sibling the next run clears.
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.delete(old, true) // clear a stale sibling from a prior crash
    require(fs.rename(target, old), s"compaction swap failed: $target -> $old")
    if (!fs.rename(tmp, target)) {
      // roll back so the original layout stays live before failing
      fs.rename(old, target)
      throw new IllegalStateException(s"compaction swap failed: $tmp -> $target")
    }
    fs.delete(old, true)
    val after = partitionFileStats(spark, path)
    import spark.implicits._
    before.toSeq.map { case (p, (f, b)) => (p, f, b) }
      .toDF("partition", "files_before", "bytes_before")
      .join(after.toSeq.map { case (p, (f, b)) => (p, f, b) }
        .toDF("partition", "files_after", "bytes_after"),
        Seq("partition"), "full")
  }

  /** Per-partition (dir name → data-file count, bytes) for a hive layout;
    * hidden/metadata files (`_SUCCESS`, `.crc`) are not data.
    */
  private def partitionFileStats(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Map[String, (Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { d =>
        val files = fs.listStatus(d.getPath).toSeq.filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        d.getPath.getName ->
          (files.size.toLong, files.map(_.getLen).sum)
      }.toMap
  }
}
