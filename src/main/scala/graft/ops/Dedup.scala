package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `lww` is the batch analog of the reference's ReplacingMergeTree
  * (/root/reference/sql/clickhouse-init.sql:21–22): rows sharing a key
  * collapse to the highest-version row (latest event_ts wins; explicit
  * tiebreak makes it total, unlike ClickHouse's insert-order tie).
  *
  * `exactDups` is content-addressed exact dedup (hash-groupBy on a
  * digest of the payload) — the first rung of the near-dup ladder used
  * by training-data pipelines. One shuffle on the digest; digest is
  * computed map-side so only (digest, id) wide rows shuffle if callers
  * project first.
  */
object Dedup {

  /** Last-writer-wins dedup: keep one row per key, max (version, tiebreak). */
  def lww(df: DataFrame, keys: Seq[Column], version: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(version.desc, tiebreak.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** CollapsingMergeTree FINAL analog (the third MergeTree engine of
    * the reference's warehouse family, after Replacing → [[lww]] and
    * Summing → graft.sinks.SummingStore): rows carry sign ∈ {+1, -1}
    * (state row / cancel of a previously-written state row). Per key,
    * the highest-version +1 row survives iff sum(sign) > 0; fully
    * cancelled keys vanish. ONE partial+final aggregate keyed by
    * `keys` — an exact integer sign sum plus max_by over the +1 rows —
    * no windows and no second shuffle. The struct-valued max_by buffer
    * is not fixed-width, so Spark plans this as partial+final
    * SortAggregate rather than HashAggregate; the property that
    * matters at 100 TB survives: the map-side partial collapses each
    * partition to ONE row per key before the shuffle (the alternative
    * row_number-window form would shuffle every raw row). `version`
    * must be totally ordered per key (pass a struct with a tiebreak). */
  def collapse(df: DataFrame, keys: Seq[Column], sign: Column,
      version: Column): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(keys: _*)
      .agg(sum(sign).as("__net"),
        max_by(payload, when(sign > 0, version)).as("__p"))
      .filter(col("__net") > 0)
      .select(col("__p.*"))
  }

  /** Exact duplicate groups by md5 of a column: (digest, keep_id = min id,
    * dup_cnt). Groups with dup_cnt > 1 are duplicate clusters. */
  def exactGroups(df: DataFrame, payload: Column, id: Column): DataFrame =
    df.groupBy(md5(payload).as("digest"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Exact-dedup survivor set: one row (the min-id row) per distinct payload. */
  def exactDedup(df: DataFrame, payload: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(md5(payload)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
