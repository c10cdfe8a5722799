package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. Spark already covers the common cases — map-side
  * partial aggregation absorbs skewed groupBy sums, and AQE splits skewed
  * sort-merge join partitions at runtime — so reach for manual salting
  * only where those don't apply: shuffle joins whose dim side is too big
  * to broadcast but small enough to replicate `salts` times, and
  * buffer-building aggregations (collect_list/distinct) with hot keys.
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from the row content of
    * `cols` — reproducible across runs (no rand()).
    */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong))

  /** Salted equi-join: the skewed fact side is split into `salts` buckets
    * per key; the dim side is replicated once per bucket, so a hot key's
    * rows land on `salts` reducers instead of one. Result is identical to
    * `fact.join(dim, key)` — only the partitioning changes.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltCols = fact.columns.filter(_ != key).map(col).toSeq
    val saltedFact = fact.withColumn("_salt", salt(salts, saltCols: _*))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
