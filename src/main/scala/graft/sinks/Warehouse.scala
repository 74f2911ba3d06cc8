package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** K1/A2: the warehouse sink — an append-oriented columnar table with
  * last-writer-wins dedup semantics, i.e. the ReplacingMergeTree(
  * event_ts) ORDER BY event_id contract of the reference
  * (/root/reference/sql/clickhouse-init.sql:7–23) on parquet:
  *
  *  - `append` lands micro-batches partitioned by event month (the
  *    reference's toYYYYMM partitioning, clickhouse-init.sql:28) — an
  *    at-least-once sink, duplicates tolerated on write;
  *  - `compact` is the merge-time dedup (ClickHouse OPTIMIZE analog):
  *    per event_id keep the max-(event_ts, processed_ts) row. Run per
  *    partition — compaction never touches more than one month;
  *  - `read` applies the same LWW window on read for exact results over
  *    possibly-uncompacted data (ClickHouse `FINAL` analog).
  *
  * On a real deployment the transactional variant of this is a Delta /
  * Iceberg MERGE keyed on event_id; the predicates here are exactly
  * that MERGE's WHEN MATCHED clause.
  */
object Warehouse {

  /** Append a batch, partitioned by event month for pruning + bounded
    * compaction scope. */
  def append(batch: DataFrame, path: String): Unit =
    batch
      .withColumn("event_month", date_format(col("event_ts"), "yyyyMM"))
      .withColumn("processed_ts", current_timestamp())
      .write.mode("append").partitionBy("event_month").parquet(path)

  /** Exact read: LWW per event_id (FINAL analog). */
  def read(spark: SparkSession, path: String): DataFrame =
    Dedup.lww(spark.read.parquet(path),
      Seq(col("event_id")), col("event_ts"), col("processed_ts"))

  /** Merge-time dedup: rewrite the table (or one month partition) with
    * duplicates collapsed. */
  def compact(spark: SparkSession, path: String, month: Option[String] = None): Unit = {
    val src = spark.read.parquet(path)
    val scoped = month.fold(src)(m => src.filter(col("event_month") === m))
    val deduped = Dedup.lww(scoped,
      Seq(col("event_id")), col("event_ts"), col("processed_ts"))
    val tmp = path + "_compact_tmp"
    deduped.write.mode("overwrite").partitionBy("event_month").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    month match {
      case None =>
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
      case Some(m) =>
        val part = new org.apache.hadoop.fs.Path(s"$path/event_month=$m")
        fs.delete(part, true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/event_month=$m"), part)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
  }
}
