package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SummingMergeTree analog: incrementally-maintained additive
  * materialized views. The reference's hourly rollup is a ClickHouse MV
  * feeding an aggregating table (/root/reference/sql/clickhouse-init
  * .sql:26–38) whose parts merge by SUMMING; this is that contract on
  * the [[SnapshotStore]] manifest log:
  *
  *  - [[maintain]] drains ONLY the source commits since the last run
  *    ([[SnapshotStore.processNew]]), partial-aggregates just those
  *    rows, and lands the result as one more additive PART — tagged
  *    with the drained version, so a crash-replay of the same drain is
  *    a no-op (exactly-once maintenance on an at-least-once drain);
  *  - [[read]] is the FINAL analog: one hash aggregate re-sums the
  *    parts per key — parts tables hold one row per (key, drain), so
  *    this aggregates MV-cardinality data, never the source;
  *  - [[compact]] is the OPTIMIZE analog: rewrite the parts as one.
  *
  * Additive measures must be EXACT types (LONG counts, DECIMAL sums —
  * [[graft.ops.Rollups.decSum]]'s input form): part-merge order then
  * cannot change results, the same reason the engine's double sums go
  * through decimals everywhere. The view stays correct under any
  * interleaving of maintenance, reads, and compactions because every
  * step is an atomic manifest commit.
  */
object SummingStore {

  /** Land one additive part (a partial aggregate keyed like the view). */
  def appendDelta(delta: DataFrame, path: String, tag: Option[String] = None): Unit =
    SnapshotStore.commitAppend(delta.sparkSession, path, delta, tag = tag)

  /** FINAL analog: merge-on-read — re-sum every additive column per
    * key over the live parts. None before the first part lands. */
  def read(spark: SparkSession, path: String, keys: Seq[String],
      addCols: Seq[String]): Option[DataFrame] = {
    require(keys.nonEmpty && addCols.nonEmpty)
    SnapshotStore.read(spark, path).map { parts =>
      val sums = addCols.map(c => sum(col(c)).as(c))
      parts.groupBy(keys.map(col): _*).agg(sums.head, sums.tail: _*)
    }
  }

  /** OPTIMIZE analog: collapse the parts to one, atomically. */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
      addCols: Seq[String]): Unit =
    read(spark, path, keys, addCols)
      .foreach(m => SnapshotStore.commitReplace(spark, path, m))

  /** Incremental maintenance: drain source commits since the last run,
    * partial-aggregate only them via `partialAgg`, append as a tagged
    * part. Returns the drained version, or None when up to date.
    * Exactly-once: a crash between the part landing and the checkpoint
    * advance replays the SAME drain interval (the source version is
    * unchanged), and the version tag makes the duplicate part a no-op.
    * Deleting the checkpoint after FURTHER source commits is a reset —
    * out of contract, exactly as in Structured Streaming. */
  def maintain(spark: SparkSession, sourceBase: String, checkpointFile: String,
      mvPath: String)(partialAgg: DataFrame => DataFrame): Option[Long] =
    SnapshotStore.processNew(spark, sourceBase, checkpointFile) { (delta, v) =>
      appendDelta(partialAgg(delta), mvPath, tag = Some(s"mv-v$v"))
    }
}
