package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs with zero
  * exchanges (Spark reads each bucket as a co-located partition). At
  * 100 TB this converts the recurring lineitem⋈orders shuffle into a
  * one-time layout cost — the single biggest lever for repeated
  * star-join workloads. Verified shuffle-free in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
