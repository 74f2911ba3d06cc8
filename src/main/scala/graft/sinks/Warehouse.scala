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
    * compaction scope. A null event_ts is substituted with the
    * processing timestamp rather than dropped, matching the reference's
    * sink fallback (EnhancedEngagementStreamingJob.java:536–540).
    * Committed through [[SnapshotStore]], so the batch's files become
    * visible to readers all-at-once (at-least-once delivery is still
    * possible across restarts — the LWW read/compact absorbs it — but
    * a reader never sees a torn batch). */
  def append(batch: DataFrame, path: String): Unit =
    appendTagged(batch, path, tag = None)

  /** Idempotent streaming append: pass the micro-batch id and a replay
    * of an already-committed batch becomes a no-op (the tag travels in
    * the manifest, same atomic publish as the data, and is carried
    * forward across later commits — the window is SnapshotStore.MaxTags
    * batches) — exactly-once landing instead of LWW-absorbed
    * duplicates. Every 16th batch also vacuums, so the manifest log
    * stays bounded on a long-running stream without waiting for a
    * compaction pass. */
  def appendOnce(batch: DataFrame, path: String, batchId: Long): Unit = {
    appendTagged(batch, path, Some(s"batch=$batchId"))
    if (batchId % 16 == 0)
      SnapshotStore.vacuum(batch.sparkSession, path, keepManifests = 2)
  }

  private def appendTagged(batch: DataFrame, path: String, tag: Option[String]): Unit = {
    val stamped = batch
      .withColumn("processed_ts", current_timestamp())
      .withColumn("event_ts", coalesce(col("event_ts"), col("processed_ts")))
      .withColumn("event_month", date_format(col("event_ts"), "yyyyMM"))
    SnapshotStore.commitAppend(batch.sparkSession, path, stamped,
      partitionBy = Seq("event_month"), tag = tag)
  }

  /** Exact read: LWW per event_id (FINAL analog) over the live
    * snapshot. */
  def read(spark: SparkSession, path: String): DataFrame =
    Dedup.lww(
      SnapshotStore.read(spark, path).getOrElse(
        throw new IllegalStateException(s"no warehouse snapshot at $path")),
      Seq(col("event_id")), col("event_ts"), col("processed_ts"))

  /** Merge-time dedup (ClickHouse OPTIMIZE analog): rewrite the table —
    * or just one month partition — with duplicates collapsed, committed
    * atomically via the manifest pointer. Month-scoped compaction only
    * rewrites that month's files; the rest of the table is carried by
    * manifest reference, which is what keeps compaction O(partition)
    * instead of O(table) at 100 TB (target closed months, like the
    * reference compacts sealed ClickHouse parts). Assumes the writer is
    * quiesced for the targeted scope (single-writer log). */
  def compact(spark: SparkSession, path: String, month: Option[String] = None): Unit = {
    val src = SnapshotStore.read(spark, path).getOrElse(return)
    month match {
      case None =>
        val deduped = Dedup.lww(src,
          Seq(col("event_id")), col("event_ts"), col("processed_ts"))
        SnapshotStore.commitReplace(spark, path, deduped, Seq("event_month"))
      case Some(m) =>
        val deduped = Dedup.lww(src.filter(col("event_month") === m),
          Seq(col("event_id")), col("event_ts"), col("processed_ts"))
        SnapshotStore.commitReplacePartition(spark, path, deduped, "event_month", m)
    }
    SnapshotStore.vacuum(spark, path, keepManifests = 2)
  }
}
