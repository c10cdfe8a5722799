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
}
