package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** AggregatingMergeTree analog: incrementally-maintained materialized
  * views whose columns are MERGEABLE PARTIAL STATES, not finished
  * values — ClickHouse's `sumState`/`uniqState` → `sumMerge`/
  * `uniqMerge` contract (the reference's MV layer, clickhouse-init
  * .sql:26–38, uses the Summing special case; this is the general
  * engine) on the [[SnapshotStore]] manifest log.
  *
  * Per view key, one part row carries:
  *  - `cnt_state`    LONG          — additive;
  *  - `sum_state`    DECIMAL(28,4) — additive, exact (order-free);
  *  - `min_state` / `max_state` DOUBLE — merge by min / max;
  *  - `hll_state`    ARRAY<LONG>   — m HyperLogLog registers (the
  *    [[graft.ops.Sketches.hllDistinct]] md5 family), merge by
  *    element-wise max; null element = empty register.
  *
  * Every state merges by a COMMUTATIVE, ASSOCIATIVE op, so any part
  * order, any maintenance batching, and any compaction schedule yield
  * bit-identical reads — which is exactly what the DuckDB oracle
  * checks: an incrementally-maintained view read back equals the
  * from-scratch aggregate of the raw table, estimate included.
  *
  * Scale: a part holds one row per (view key, drain) — MV-cardinality,
  * never source-cardinality. [[read]] is one hash aggregate over parts
  * rows; the register merge is m per-element max aggregates (m = 64
  * longs per key), all map-side combinable. No explode, no join, no
  * driver state.
  */
object AggregatingStore {

  /** Registers per HLL state; must match reader and writer. */
  val M = 64

  private def rhoOf(h2: Column): Column =
    when(h2 === 0L, lit(32L)).otherwise(least(
      bit_count(h2.bitwiseAND(-h2) - 1).cast("long") + 1L, lit(32L)))

  /** Partial-state rows for one batch of raw data: the `-State`
    * combinator. `value` feeds cnt/sum/min/max; `distinctKey` feeds
    * the HLL registers. Distinct-within-batch keys are NOT collapsed —
    * HLL registers absorb duplicates by construction (max of equal
    * rhos), so no pre-distinct shuffle is needed. */
  def partialState(df: DataFrame, keys: Seq[Column], value: Column,
      distinctKey: Column, m: Int = M): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")
    val k = distinctKey.cast("string")
    val withH = df.select((keys :+ value.as("__v") :+
      pmod(TextFunctions.md5Long(k), lit(m.toLong)).as("__bucket") :+
      pmod(TextFunctions.md5Long(concat(lit("r:"), k)), lit(4294967296L)).as("__h2")): _*)
    val keyNames = withH.columns.dropRight(3).toSeq
    val regAggs = (0 until m).map(j =>
      max(when(col("__bucket") === j, rhoOf(col("__h2")))).as(s"__r$j"))
    val aggs = Seq(
      count(lit(1)).as("cnt_state"),
      // pinned to DECIMAL(38,4): Spark widens a decimal SUM to (38,4),
      // so a compacted part would otherwise carry a different parquet
      // decimal type than a fresh part and the parts-union read would
      // face a mixed schema — every part must share one state type
      sum(col("__v").cast(DecimalType(28, 4))).cast(DecimalType(38, 4))
        .as("sum_state"),
      min(col("__v")).as("min_state"),
      max(col("__v")).as("max_state")) ++ regAggs
    withH.groupBy(keyNames.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keyNames.map(col) ++ Seq(col("cnt_state"), col("sum_state"),
        col("min_state"), col("max_state"),
        array((0 until m).map(j => col(s"__r$j")): _*).as("hll_state"))): _*)
  }

  /** Land one part of partial states. */
  def appendDelta(delta: DataFrame, path: String, tag: Option[String] = None): Unit =
    SnapshotStore.commitAppend(delta.sparkSession, path, delta, tag = tag)

  /** Merge-on-read (`-Merge` combinator): one hash aggregate combines
    * every state column across parts, per key. Returns rows still in
    * STATE form — feed to [[finalize]] for consumer values, or back to
    * a part for [[compact]]. None before the first part lands. */
  def readStates(spark: SparkSession, path: String, keys: Seq[String],
      m: Int = M): Option[DataFrame] =
    SnapshotStore.read(spark, path).map { parts =>
      val regAggs = (0 until m).map(j =>
        max(element_at(col("hll_state"), j + 1)).as(s"__r$j"))
      val aggs = Seq(
        sum(col("cnt_state")).as("cnt_state"),
        sum(col("sum_state")).cast(DecimalType(38, 4)).as("sum_state"),
        min(col("min_state")).as("min_state"),
        max(col("max_state")).as("max_state")) ++ regAggs
      parts.groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select((keys.map(col) ++ Seq(col("cnt_state"), col("sum_state"),
          col("min_state"), col("max_state"),
          array((0 until m).map(j => col(s"__r$j")): _*).as("hll_state"))): _*)
    }

  /** Finished view: counts, exact decimal sum (as double), min/max,
    * and the integer-exact raw-HLL distinct estimate (the
    * [[graft.ops.Sketches.hllDistinct]] estimator — BIGINT numerator,
    * one integer division, no float summation). */
  def finalizeView(states: DataFrame, keys: Seq[String], m: Int = M): DataFrame = {
    // null register = empty = rho 0 = contributes 2^32 to the numerator
    val numerator = expr(
      "aggregate(transform(hll_state, r -> " +
        "shiftleft(CAST(1 AS BIGINT), CAST(32 - coalesce(r, 0) AS INT))), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    states.select((keys.map(col) ++ Seq(
      col("cnt_state").as("cnt"),
      col("sum_state").cast("double").as("sum_value"),
      col("min_state").as("min_value"),
      col("max_state").as("max_value"),
      numerator.as("__num"))): _*)
      .withColumn("est_distinct",
        expr(s"CAST((${709L * m.toLong * m.toLong} * 4294967296) DIV (1000 * __num) AS BIGINT)"))
      .drop("__num")
  }

  /** OPTIMIZE analog: collapse the parts to one merged part, atomically. */
  def compact(spark: SparkSession, path: String, keys: Seq[String], m: Int = M): Unit =
    readStates(spark, path, keys, m)
      .foreach(s => SnapshotStore.commitReplace(spark, path, s))

  /** Incremental maintenance off a source [[SnapshotStore]]: drain the
    * commits since the last run, partial-state ONLY those rows, land as
    * a tagged part (replay-safe, same contract as
    * [[SummingStore.maintain]]). */
  def maintain(spark: SparkSession, sourceBase: String, checkpointFile: String,
      mvPath: String, keys: Seq[String], value: Column, distinctKey: Column,
      m: Int = M): Option[Long] =
    SnapshotStore.processNew(spark, sourceBase, checkpointFile) { (delta, v) =>
      appendDelta(partialState(delta, keys.map(col), value, distinctKey, m),
        mvPath, tag = Some(s"aggmv-v$v"))
    }
}
