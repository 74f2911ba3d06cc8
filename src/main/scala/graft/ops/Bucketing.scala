package graft.ops

import org.apache.spark.sql.DataFrame

/** Co-located joins via bucketing (SURVEY §4 O5/O6 analog + the
  * "pre-partitioning for co-located joins" scale lever): writing both
  * join sides bucketed AND sorted by the join key lets sort-merge joins
  * run with NO exchange and NO sort — at warehouse scale this converts
  * the recurring fact-fact join (e.g. lineitem ⋈ orders) from a full
  * shuffle each query into a one-time layout cost.
  *
  * Bucket counts should match between tables (or divide evenly) and be
  * sized so a bucket fits an executor's memory at the target SF.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
