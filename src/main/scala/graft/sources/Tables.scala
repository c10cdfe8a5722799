package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a driver-generated scale-factor directory
  * (`/root/testdata/sf*`). The reference's only source is a Kafka topic of
  * JSON records (`SolarConsumer.java:97-99`); the batch twin here is a
  * columnar parquet scan, which Catalyst prunes and pushes filters into —
  * at 100 TB this is the difference between reading 3 columns and reading
  * the world. Streaming twins live in [[graft.streaming]].
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped in two physical forms
    * across testdata generations: TIMESTAMP(NANOS) — which Spark 4.x
    * does not read natively (PARQUET_TYPE_ILLEGAL), so nanos come in as
    * long and convert losslessly by integer floor-division — and plain
    * microsecond timestamps (read as NTZ, cast to the session-UTC
    * TimestampType every downstream window/oracle computes against).
    * Dispatch on the loaded schema so either generation works unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
