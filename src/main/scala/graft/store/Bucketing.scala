package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for the graph tables — the co-location strategy
  * for a deployment where expand/closure joins dominate (SURVEY.md §4):
  * writing nodes bucketed by `full_name` and edges bucketed by `src` (or
  * `dst`) lets every key-equi join between them run with ZERO exchanges —
  * both sides arrive pre-partitioned and pre-sorted on disk, so a
  * 100 TB expand is a per-bucket sort-merge with no shuffle at all.
  *
  * `bucketBy` requires the table-catalog write path (`saveAsTable`); the
  * snapshot directory layout ([[Snapshot]]) stays the portable default,
  * and this is the opt-in cluster deployment layout. BucketingSpec
  * asserts the no-exchange plan shape.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `key` into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
