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

  /** Bits per dimension for the Z-order layout: 2^3 = 8 buckets per
    * column, 64 Morton cells = 64 directories. Mirrored literally in the
    * q135 oracle.
    */
  val ZOrderBits = 3

  /** Z-order (Morton-curve) layout over two numeric columns — the
    * multi-column data-skipping organization (Delta Lake's `OPTIMIZE
    * ZORDER BY` shape; the reference has no batch storage at all): each
    * column is bucketed equi-width into 2^bits cells between its global
    * min/max, the two bucket ids are bit-interleaved into a Morton key,
    * and the key becomes the hive partition column `z_file`. Every
    * directory then covers an axis-aligned BOX in (a, b) space, so a
    * stats-based reader skips whole directories for predicates on
    * EITHER OR BOTH columns — where a single-column sort gives tight
    * file ranges on that column and useless ones on the other
    * (WritersSpec measures the gap on a 2-D box predicate).
    *
    * Determinism (what makes the layout hash-gateable): buckets derive
    * from the global min/max — one cheap aggregate carried as a
    * broadcast 1-row relation, never a driver round trip — plus per-row
    * closed-form IEEE-754 arithmetic replayed term-for-term in the
    * oracle. Deliberately NOT `repartitionByRange(zkey)`: its boundaries
    * come from reservoir samples, so the file assignment would not be
    * replayable (and on restart, not stable). Equi-width is the
    * bucketing this demo ships; production swaps in equi-depth
    * boundaries from the q87 two-pass quantile machinery — interleave
    * and layout unchanged.
    *
    * Scale shape: one 4-scalar aggregate + one shuffle on a bounded
    * domain (4^bits values) + a partitioned write. Directory count is a
    * constant picked for target file size, independent of data volume;
    * skew across cells is bounded by the equi-width assumption (or
    * eliminated by the equi-depth variant).
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, bits: Int = ZOrderBits): Unit =
    zOrderKeyed(df, colA, colB, bits)
      .repartition(col("z_file"))
      .sortWithinPartitions(col("z_file"))
      .write.partitionBy("z_file").mode("overwrite").parquet(path)

  /** `df` + the Morton `z_file` column (the writer's key derivation,
    * exposed so specs and simulated-baseline comparisons share it).
    */
  def zOrderKeyed(df: DataFrame, colA: String, colB: String,
                  bits: Int = ZOrderBits): DataFrame = {
    val rng = df.agg(
      min(col(colA).cast("double")).as("zo_amn"),
      max(col(colA).cast("double")).as("zo_amx"),
      min(col(colB).cast("double")).as("zo_bmn"),
      max(col(colB).cast("double")).as("zo_bmx"))
    val n = (1 << bits).toDouble
    def bucket(x: org.apache.spark.sql.Column, mn: org.apache.spark.sql.Column,
               mx: org.apache.spark.sql.Column) =
      least(greatest(floor((x - mn) /
          when(mx > mn, mx - mn).otherwise(lit(1.0)) * lit(n)),
        lit(0.0)), lit(n - 1.0)).cast("int")
    df.crossJoin(broadcast(rng))
      .withColumn("z_file", morton(
        bucket(col(colA).cast("double"), col("zo_amn"), col("zo_amx")),
        bucket(col(colB).cast("double"), col("zo_bmn"), col("zo_bmx")),
        bits))
      .drop("zo_amn", "zo_amx", "zo_bmn", "zo_bmx")
  }

  /** Bit-interleave two `bits`-wide ints: `a` takes even bit positions,
    * `b` odd — bit j of a lands at 2j (shift left by j), bit j of b at
    * 2j+1 (shift left by j+1).
    */
  private def morton(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column, bits: Int) =
    (0 until bits).map { j =>
      shiftleft(a.bitwiseAND(lit(1 << j)), j)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1 << j)), j + 1))
    }.reduce(_ bitwiseOR _)

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

  /** Schema-evolution read across layout GENERATIONS — the lakehouse
    * reality that a long-lived table's files were written by different
    * pipeline releases: later generations add columns, earlier files
    * simply lack them. `mergeSchema` unions the footers' schemas at
    * planning time and NULL-fills absent columns per file — so one
    * logical table spans every generation without a rewrite (the
    * parquet analog of DuckDB's `union_by_name`). Scale note: footer
    * merging is metadata-only (driver-side, one footer per file — pair
    * with [[compactPartitioned]] to keep file counts sane); the data
    * path stays a plain pruned columnar scan, and columns missing from
    * a file cost ZERO bytes there. Incompatible type changes across
    * generations fail loudly at plan time — that is a table REWRITE
    * (or a cast view), not an evolution, and silently coercing it would
    * corrupt the narrower files' values.
    */
  def readEvolved(spark: org.apache.spark.sql.SparkSession,
                  paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Column-level diff of two schema generations: one row per column
    * that was `added`, `removed`, or `type_changed` between `from` and
    * `to` — the review artifact a schema-evolution commit gate (q163's
    * promotion step) would attach. Name-keyed, order-insensitive
    * (column ORDER is presentation, not schema identity in parquet).
    */
  def schemaDiff(spark: org.apache.spark.sql.SparkSession,
                 from: org.apache.spark.sql.types.StructType,
                 to: org.apache.spark.sql.types.StructType): DataFrame = {
    val f = from.fields.map(x => x.name -> x.dataType.sql).toMap
    val t = to.fields.map(x => x.name -> x.dataType.sql).toMap
    val rows =
      t.keySet.diff(f.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, t(c))) ++
      f.keySet.diff(t.keySet).toSeq.sorted.map(c =>
        (c, "removed", f(c), null: String)) ++
      f.keySet.intersect(t.keySet).toSeq.sorted
        .filter(c => f(c) != t(c))
        .map(c => (c, "type_changed", f(c), t(c)))
    import spark.implicits._
    rows.toDF("column", "status", "from_type", "to_type")
  }

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
