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
}
