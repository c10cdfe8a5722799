package graft.sources.v2

import java.util
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{SerializableHadoopConf, Warc}

/** DataSource V2 surface for the WARC corpus-interchange format — the
  * WRITE-side twin of the `solar-sim` read connector, demonstrating the
  * full V2 batch write protocol the repo's connector depth was missing:
  * `WriteBuilder → BatchWrite → DataWriterFactory → DataWriter` with
  * task-level commit messages, driver-side commit (temp-file rename —
  * readers never observe a half-written shard), abort cleanup, and
  * `SupportsTruncate` for overwrite mode.
  *
  * `df.write.format("warc").option("compress", true).mode("overwrite")
  * .save(path)` / `spark.read.format("warc").load(path)`.
  *
  * Interop is part of the contract: layouts written here are readable by
  * [[graft.sources.Warc.readWarc]] and vice versa (same record grammar,
  * same shard glob — WarcV2Spec pins both directions). The V2 read path
  * plans ONE InputPartition PER SHARD FILE (the WET segment convention:
  * a shard is the parallelism unit) and stream-parses records off a
  * Hadoop `FileSystem` stream in constant memory, exactly the
  * [[graft.sources.Warc]] reader discipline.
  *
  * Commit protocol: each task writes `_tmp-<uuid>` in the target
  * directory and reports it in its commit message; the driver renames
  * every temp to its final `part-<job>-NNNNN.warc[.wet.gz]` name at
  * commit (after deleting the prior layout iff truncate), or deletes the
  * temps on abort. A crash mid-job leaves only `_tmp-*` files, which the
  * shard glob (`*.warc*`) never matches — readers are isolated from
  * failures without a manifest.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Warc.ReadSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

private[v2] class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("warc source needs a path"))
  private val compress = options.getBoolean("compress", false)

  override def name(): String = s"warc($path)"
  override def schema(): StructType = Warc.ReadSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScan(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WarcWriteBuilder(path, compress, info.schema())
}

// ---------------------------------------------------------------------
// read side: one InputPartition per shard file
// ---------------------------------------------------------------------

private[v2] class WarcScan(path: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = Warc.ReadSchema
  override def toBatch: Batch = this
  override def description(): String = s"warc shards at $path"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val pattern = new Path(s"$path/*.warc*")
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(pattern)).getOrElse(Array.empty)
      .map(s => WarcShardPartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    WarcReaderFactory(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }
}

private[v2] case class WarcShardPartition(file: String) extends InputPartition

private[v2] case class WarcReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WarcShardPartition].file
    val p = new Path(file)
    val raw = p.getFileSystem(conf.value).open(p)
    val in: java.io.InputStream =
      if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    val it = Warc.recordIterator(file, in)
    new PartitionReader[InternalRow] {
      private var row: org.apache.spark.sql.Row = _
      override def next(): Boolean = {
        if (it.hasNext) { row = it.next(); true } else false
      }
      override def get(): InternalRow = InternalRow(
        row.getLong(0),
        UTF8String.fromString(row.getString(1)),
        Option(row.getString(2)).map(UTF8String.fromString).orNull,
        Option(row.getString(3)).map(UTF8String.fromString).orNull)
      override def close(): Unit = in.close()
    }
  }
}

// ---------------------------------------------------------------------
// write side: the full V2 batch write protocol
// ---------------------------------------------------------------------

private[v2] class WarcWriteBuilder(path: String, compress: Boolean,
    schema: StructType) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val spark = org.apache.spark.sql.SparkSession.active
      // the writer consumes (doc_id, text, lang, source) by NAME — a
      // projection/reorder upstream must not silently shift columns
      val idx = Seq("doc_id", "text", "lang", "source").map { c =>
        val i = schema.fieldIndex(c)
        require(i >= 0); i
      }
      new WarcBatchWrite(path, compress, doTruncate, idx,
        new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    }
  }
}

private[v2] class WarcBatchWrite(path: String, compress: Boolean,
    truncate: Boolean, fieldIdx: Seq[Int],
    conf: SerializableHadoopConf) extends BatchWrite {

  private val jobId = UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(path, compress, fieldIdx, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    val suffix = if (compress) ".warc.wet.gz" else ".warc"
    // publish FIRST — job-unique names cannot collide with the prior
    // layout, so there is no instant where the directory holds NEITHER
    // copy (the compactPartitioned rename-aside discipline adapted to a
    // flat shard glob; review r13: the earlier delete-then-publish order
    // had a crash window that destroyed the prior layout). A crash
    // mid-commit leaves old+new both visible — for truncate jobs a
    // DUPLICATION window recovered by re-running the overwrite, never a
    // loss window. Production replaces the glob with a manifest swap
    // (same caveat compactPartitioned documents).
    val committed = messages
      .collect { case m: WarcCommitMessage if m.tmpFile != null => m }
      .map { m =>
        val target = new Path(path, f"part-$jobId-${m.partitionId}%05d$suffix")
        require(fs.rename(new Path(m.tmpFile), target),
          s"warc commit failed: ${m.tmpFile} -> $target")
        target.getName
      }.toSet
    if (truncate) {
      // drop the prior layout only AFTER the new one is fully visible
      Option(fs.globStatus(new Path(s"$path/*.warc*")))
        .getOrElse(Array.empty)
        .filterNot(s => committed.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
      // reclaim temps orphaned by CRASHED earlier jobs (their abort never
      // ran) — only under truncate, which declares exclusive ownership of
      // the directory; an append commit must not race a concurrent append
      // job's live temps
      Option(fs.globStatus(new Path(s"$path/_tmp-*")))
        .getOrElse(Array.empty)
        .foreach(s => fs.delete(s.getPath, false))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case m: WarcCommitMessage if m.tmpFile != null => m }
      .foreach(m => fs.delete(new Path(m.tmpFile), false))
  }
}

private[v2] case class WarcCommitMessage(partitionId: Int, tmpFile: String)
    extends WriterCommitMessage

private[v2] case class WarcWriterFactory(path: String, compress: Boolean,
    fieldIdx: Seq[Int], conf: SerializableHadoopConf) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import java.nio.charset.StandardCharsets.UTF_8
      private var out: java.io.OutputStream = _
      private var tmp: Path = _
      private val Seq(idI, txtI, langI, srcI) = fieldIdx

      private def ensureOpen(): Unit = if (out == null) {
        tmp = new Path(path, s"_tmp-${UUID.randomUUID()}")
        val fs = tmp.getFileSystem(conf.value)
        fs.mkdirs(new Path(path))
        val raw = fs.create(tmp, true)
        out = new java.io.BufferedOutputStream(
          if (compress) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
          else raw, 1 << 16)
      }

      override def write(r: InternalRow): Unit = {
        ensureOpen() // empty partitions produce no file (writeWarc parity)
        // ONE shared record serializer with the function-style writer —
        // the grammar cannot drift between the two paths
        graft.sources.Warc.writeRecord(out, r.getLong(idI),
          if (r.isNullAt(txtI)) null else r.getUTF8String(txtI).toString,
          if (r.isNullAt(langI)) null else r.getUTF8String(langI).toString,
          if (r.isNullAt(srcI)) null else r.getUTF8String(srcI).toString)
      }

      override def commit(): WriterCommitMessage = {
        if (out != null) { out.close(); WarcCommitMessage(partitionId, tmp.toString) }
        else WarcCommitMessage(partitionId, null)
      }

      override def abort(): Unit = if (out != null) {
        out.close()
        tmp.getFileSystem(conf.value).delete(tmp, false)
        ()
      }

      override def close(): Unit = ()
    }
}
