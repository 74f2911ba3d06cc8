package graft.dim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutable-dimension maintenance (SURVEY.md §2.4 J1 / §3.2): the
  * content table is a tiny, slowly-changing dimension updated by a CDC
  * stream of upserts and delete tombstones.
  *
  * Design (SURVEY §7.4 #1): a snapshot table maintained per micro-batch
  * via foreachBatch — the engagement stream then broadcast-left-joins
  * the snapshot, giving the reference's as-of-processing-time join
  * semantics (events never retro-enrich; deletes stop enrichment from
  * the next batch on). The snapshot stays small (one row per live key),
  * so the join side is always broadcastable regardless of fact volume.
  */
object ContentDim {

  /** Collapse a batch of change records (columns: id, …, is_delete,
    * change_seq) to latest-state-per-key, dropping keys whose latest
    * change is a delete. Deterministic: (change_seq, is_delete) ordering
    * with delete winning ties (a delete in the same source ts beats the
    * stale upsert). */
  def latestState(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("change_seq").desc, col("is_delete").desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("is_delete"))
      .drop("__rn", "is_delete", "change_seq")
  }

  /** SCD Type-2 history from the same change stream [[latestState]]
    * folds to Type-1: every upsert opens a version valid from its
    * change_seq until the NEXT change of the key (upsert or delete);
    * deletes close the prior version without opening one; the open
    * version (valid_to_seq IS NULL) is current. One lead() window
    * partitioned by key — state per group is bounded by that key's
    * change count, never corpus-wide. */
  def scd2History(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("change_seq"), col("is_delete"))
    changes
      .withColumn("valid_to_seq", lead(col("change_seq"), 1).over(w))
      .filter(!col("is_delete"))
      .withColumn("is_current", col("valid_to_seq").isNull)
      .withColumnRenamed("change_seq", "valid_from_seq")
      .drop("is_delete")
  }

  /** Merge a change batch into an existing snapshot (both keyed by id):
    * new upserts replace, deletes remove, untouched rows carry over.
    * This is the foreachBatch MERGE body for streaming maintenance. */
  def merge(snapshot: DataFrame, changes: DataFrame): DataFrame = {
    val delta = latestState(changes)
    val deletedOrReplaced = changes.select(col("id")).distinct()
    snapshot.join(deletedOrReplaced, Seq("id"), "left_anti")
      .unionByName(delta)
  }

  /** Streaming maintenance: apply each micro-batch of content changes
    * to the snapshot table at `path`, committed transactionally through
    * [[graft.sinks.SnapshotStore]] (new snapshot dir + atomic pointer
    * flip — the ClickHouse-part-swap atomicity rebuilt on a plain FS).
    * A concurrent enrichment batch resolves either the old or the new
    * snapshot, never a missing or half-replaced one; data files are
    * immutable, so an already-planned reader survives the next
    * keepManifests-1 commits (retention of 4 here = three dim updates
    * of slack for a long-running enrich batch — size it to reader
    * latency, it is a knob not a proof). */
  def applyBatch(spark: SparkSession, path: String, changes: DataFrame): Unit = {
    val next = graft.sinks.SnapshotStore.read(spark, path) match {
      case Some(snap) => merge(snap, changes)
      case None       => latestState(changes)
    }
    graft.sinks.SnapshotStore.commitReplace(spark, path, next.coalesce(1))
    graft.sinks.SnapshotStore.vacuum(spark, path, keepManifests = 4)
  }

  /** The live snapshot (empty dim before the first commit). */
  def snapshot(spark: SparkSession, path: String): DataFrame =
    graft.sinks.SnapshotStore.read(spark, path).getOrElse(emptyDim(spark))

  /** Schema-correct empty dimension (pre-first-change state). */
  def emptyDim(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", StringType),
        StructField("slug", StringType),
        StructField("title", StringType),
        StructField("content_type", StringType),
        StructField("length_seconds", IntegerType),
        StructField("publish_ts", StringType))))
  }
}
