package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned corpus-snapshot store — the lakehouse chapter the
  * incremental merge (q128) is one step away from: each daily
  * [[graft.operators.Curation.mergeCorpusIncremental]] output commits as
  * a VERSION, any historical membership is reconstructable
  * ([[corpusAsOf]] — Delta/Iceberg time travel, expressed engine-side),
  * and a retention/compaction pass bounds the chain without losing the
  * versions that remain.
  *
  * Layout under one root (all plain parquet, Hive-style `v=N` dirs so a
  * read of the parent discovers `v` as a partition column):
  *   - `feeds/v=N/` — version N's DELTA only: `(doc_id, fp)` of the
  *     insert/rewrite rows. Refresh/carry rows are deliberately absent —
  *     they change no fp, so replay reconstructs them from older
  *     versions; this is what keeps a version's storage proportional to
  *     its CHANGE, not the corpus (the q128 incremental-artifact
  *     argument applied to history).
  *   - `base/v=N/` — optional compacted FULL membership at N (written by
  *     [[compact]]); the replay's starting point when present.
  *   - `manifest/v=N/` — one row per committed version: parent, change-
  *     class counts, total docs, and a membership checksum
  *     (`bit_xor(xxhash64(doc_id, fp))` — order-independent, so the
  *     verifier can recompute it from any replay plan). The manifest row
  *     IS the commit point: a feed directory without its manifest row is
  *     an uncommitted orphan every reader ignores, and a crashed commit
  *     re-runs by overwriting it — a duplication window, never a loss
  *     window (the WARC V2 / compactPartitioned publish-first
  *     discipline).
  *
  * Scale shape: [[commit]] adds one aggregate pass over the merge output
  * the caller already computed (map-side combined to one row) plus a
  * delta-sized write. [[corpusAsOf]] is a union of base + the needed
  * deltas followed by ONE `max_by` aggregate keyed on the 8-byte doc_id
  * — never a window, never a text column; cost is bounded by corpus +
  * retained-change size, and after compaction by corpus + post-base
  * changes only.
  */
object SnapshotStore {

  /** One committed version's manifest row. */
  final case class Manifest(v: Long, parent: Long, nInsert: Long,
                            nRewrite: Long, nRefresh: Long, nCarry: Long,
                            nDocs: Long, checksum: Long)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh root). */
  def manifests(spark: SparkSession, root: String): Seq[Manifest] = {
    val dir = new Path(root, "manifest")
    if (!fs(spark, root).exists(dir)) return Seq.empty
    import spark.implicits._
    spark.read.parquet(dir.toString)
      .select("v", "parent", "n_insert", "n_rewrite", "n_refresh",
        "n_carry", "n_docs", "checksum")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
      .map(t => Manifest(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8))
  }

  /** Newest committed version, 0 for a fresh root. */
  def headVersion(spark: SparkSession, root: String): Long =
    manifests(spark, root).lastOption.map(_.v).getOrElse(0L)

  /** Commit a merge output (`(doc_id, fp, change)` — the
    * `mergeCorpusIncremental` relation, which IS full membership at the
    * new version) as version `version`. Versions are strictly
    * sequential: `version` must be head + 1, so a concurrent/duplicate
    * committer fails loudly instead of forking history.
    */
  def commit(spark: SparkSession, root: String, version: Long,
             merged: DataFrame): Manifest = {
    val head = headVersion(spark, root)
    require(version == head + 1,
      s"commit must be sequential: head=$head, got version=$version")
    // one pass: class counts + total + membership checksum (sums
    // coalesced — a zero-row merge output, e.g. an empty bootstrap or
    // an empty daily batch over an empty corpus, must commit an empty
    // version, not NPE on null aggregates; review r15)
    val row = merged.agg(
      coalesce(sum(when(col("change") === "insert", 1L).otherwise(0L)),
        lit(0L)).as("i"),
      coalesce(sum(when(col("change") === "rewrite", 1L).otherwise(0L)),
        lit(0L)).as("rw"),
      coalesce(sum(when(col("change") === "refresh", 1L).otherwise(0L)),
        lit(0L)).as("rf"),
      coalesce(sum(when(col("change") === "carry", 1L).otherwise(0L)),
        lit(0L)).as("c"),
      count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(doc_id, fp))").as("ck")).head()
    val m = Manifest(version, head, row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4),
      if (row.isNullAt(5)) 0L else row.getLong(5))
    // delta feed first (overwrite: a crashed earlier attempt left at most
    // an uncommitted orphan here), manifest row last = the commit point
    merged.filter(col("change").isin("insert", "rewrite"))
      .select(col("doc_id"), col("fp"))
      .write.mode("overwrite").parquet(s"$root/feeds/v=$version")
    import spark.implicits._
    Seq((m.parent, m.nInsert, m.nRewrite, m.nRefresh, m.nCarry, m.nDocs,
        m.checksum))
      .toDF("parent", "n_insert", "n_rewrite", "n_refresh", "n_carry",
        "n_docs", "checksum")
      .write.mode("overwrite").parquet(s"$root/manifest/v=$version")
    m
  }

  /** Compacted base versions present on disk, ascending. */
  private def baseVersions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, "base")
    val f = fs(spark, root)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
  }

  /** Full corpus membership `(doc_id, fp)` as of committed version `v` —
    * time travel over the chain: the newest base ≤ v (or nothing, before
    * any compaction) unioned with the delta feeds in (base, v], then
    * last-writer-wins per doc via one `max_by` aggregate. Refuses a
    * version beyond head (never committed) or below the oldest base
    * (retention removed its history) rather than answering wrong.
    */
  def corpusAsOf(spark: SparkSession, root: String, v: Long): DataFrame = {
    val head = headVersion(spark, root)
    require(v >= 1 && v <= head, s"version $v not committed (head=$head)")
    val bases = baseVersions(spark, root)
    val base = bases.filter(_ <= v).lastOption
    require(base.isDefined || bases.isEmpty,
      s"version $v predates the retention horizon (oldest base=${bases.head})")
    val feedsDir = new Path(root, "feeds")
    val haveFeeds = fs(spark, root).exists(feedsDir) &&
      fs(spark, root).listStatus(feedsDir).nonEmpty
    val deltas =
      if (!haveFeeds) None
      else Some(spark.read.parquet(feedsDir.toString)
        .filter(col("v") > base.getOrElse(0L) && col("v") <= v)
        .select(col("doc_id"), col("fp"), col("v").cast("long").as("v")))
    val baseRows = base.map(bv =>
      spark.read.parquet(s"$root/base/v=$bv")
        .select(col("doc_id"), col("fp"), lit(bv).as("v")))
    val all = (baseRows.toSeq ++ deltas.toSeq).reduce(_.unionByName(_))
    all.groupBy(col("doc_id"))
      .agg(max_by(col("fp"), col("v")).as("fp"))
  }

  /** Recompute version `v`'s membership checksum and doc count from the
    * chain and compare against its manifest row — the audit a nightly
    * job runs to prove the stored history still replays to what was
    * committed.
    */
  def verify(spark: SparkSession, root: String, v: Long): Boolean = {
    val m = manifests(spark, root).find(_.v == v)
      .getOrElse(return false)
    val row = corpusAsOf(spark, root, v).agg(
      count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(doc_id, fp))").as("ck")).head()
    row.getLong(0) == m.nDocs &&
      (if (row.isNullAt(1)) 0L else row.getLong(1)) == m.checksum
  }

  /** Retention/compaction: materialize full membership at `upTo` as a
    * base snapshot, then drop the delta feeds ≤ `upTo`. Publish-first:
    * the base lands (temp dir + rename — readers never see a partial
    * base) before any feed is deleted, so a crash leaves redundant
    * feeds that [[corpusAsOf]] simply ignores, never a hole. After
    * compaction, versions < `upTo` are intentionally unreachable
    * (that is the retention) and [[corpusAsOf]] refuses them loudly.
    */
  def compact(spark: SparkSession, root: String, upTo: Long): Unit = {
    val head = headVersion(spark, root)
    require(upTo >= 1 && upTo <= head,
      s"compact target $upTo not committed (head=$head)")
    val f = fs(spark, root)
    val tmp = new Path(root, s"base/.tmp-v=$upTo")
    val dst = new Path(root, s"base/v=$upTo")
    corpusAsOf(spark, root, upTo).select("doc_id", "fp")
      .write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    require(f.rename(tmp, dst), s"publish rename failed: $tmp -> $dst")
    // retention: drop superseded feeds and older bases (publish-first —
    // everything deleted here is re-derivable from the new base)
    val feedsDir = new Path(root, "feeds")
    if (f.exists(feedsDir))
      f.listStatus(feedsDir).map(_.getPath)
        .filter(p => p.getName.startsWith("v=") &&
          p.getName.stripPrefix("v=").toLong <= upTo)
        .foreach(f.delete(_, true))
    baseVersions(spark, root).filter(_ < upTo)
      .foreach(bv => f.delete(new Path(root, s"base/v=$bv"), true))
  }
}
