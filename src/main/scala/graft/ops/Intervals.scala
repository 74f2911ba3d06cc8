package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `maxIntersections` / `maxIntersectionsPosition` analog:
  * the peak number of simultaneously-open intervals and the earliest
  * instant at which the peak is reached (peak concurrency — the classic
  * "max concurrent sessions" dashboard statistic over the reference's
  * engagement events; each event opens an interval of its engagement
  * duration).
  *
  * Semantics: intervals are half-open [start, end); at equal instants
  * the −1 (close) delta orders before the +1 (open), so an interval
  * ending exactly when another starts never overlaps it. The running
  * sum is prefix-INCLUSIVE, and the position is the `t` of the first
  * delta row where the running sum attains the global maximum.
  *
  * Scale shape — a TWO-PHASE sweep line, never a global window:
  *  1. each event explodes to two delta rows (+1 at start, −1 at end);
  *     phase one partitions the sweep by calendar day of `t` and runs
  *     the running-sum window INSIDE each day (day-partitioned sort,
  *     spillable, parallel across days), reducing every day to one row:
  *     (net delta, in-day max prefix, earliest t attaining it);
  *  2. phase two windows over the per-day table — |days| rows, tiny by
  *     construction (a century is ~37k rows) — to accumulate each day's
  *     carry-in offset, then takes the global argmax.
  * An interval SPANNING a day boundary contributes +1 to its start
  * day's net delta, which reaches every later day through the carry —
  * the in-day prefix plus carry equals the true global prefix at every
  * row, so the two-phase max is exact. This is the same
  * two-phase-prefix-sum discipline as Corpus.packSequences /
  * q_shuffle_order: the only single-partition window runs on the
  * bucket-cardinality table.
  *
  * Output: one row — (max_concurrent BIGINT, at_ts STRING µs-formatted).
  */
object Intervals {

  /** @param bucket monotone non-decreasing time bucketing for phase 1
    *   (default: calendar day). Granularity is the scale dial: per-task
    *   sort volume is one bucket's delta rows, the phase-2 carry table
    *   is |buckets| rows — pick hours (or minutes) when a day of events
    *   outgrows a task, the carry table stays tiny either way (~88k
    *   rows for a decade of hours). */
  def maxIntersections(df: DataFrame, start: Column, endCol: Column,
                       bucket: Column => Column = to_date(_)): DataFrame = {
    val deltas = df.select(start.as("t"), lit(1L).as("delta"))
      .unionAll(df.select(endCol.as("t"), lit(-1L).as("delta")))

    val day = bucket(col("t"))
    val inDay = Window.partitionBy(day).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = deltas.select(day.as("d"), col("t"), col("delta"),
      sum(col("delta")).over(inDay).as("run"))

    // one row per day: net delta, in-day peak, earliest t at the peak
    // (day_max materialized per row first — window functions cannot
    // nest inside aggregates)
    val withDayMax = run.withColumn("day_max",
      max(col("run")).over(Window.partitionBy(col("d"))))
    val perDay = withDayMax.groupBy(col("d")).agg(
      sum(col("delta")).as("net"),
      max(col("day_max")).as("day_max"),
      min(when(col("run") === col("day_max"), col("t"))).as("day_max_t"))

    // carry-in = sum of PRECEDING days' nets; |days| rows, one partition
    val carry = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val adj = perDay.select(col("d"), col("day_max_t"),
      (coalesce(sum(col("net")).over(carry), lit(0L)) + col("day_max")).as("g"))

    adj.crossJoin(broadcast(adj.agg(max(col("g")).as("gmax"))))
      .filter(col("g") === col("gmax"))
      .groupBy(col("gmax").as("max_concurrent"))
      .agg(date_format(min(col("day_max_t")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("at_ts"))
  }

  /** DuckDB replica over `events` with interval [ts, ts + value·1e6 µs):
    * the oracle may use the straight global window — it IS the spec the
    * two-phase plan must reproduce. */
  val maxIntersectionsOracleSql: String =
    """WITH deltas AS (
  SELECT ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT ts + CAST(round(value*1000000,0) AS BIGINT) * INTERVAL 1 MICROSECOND AS t, -1 AS delta FROM events),
r AS (SELECT t, sum(delta) OVER (ORDER BY t, delta ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM deltas),
m AS (SELECT max(run) AS gmax FROM r)
SELECT CAST(gmax AS BIGINT) AS max_concurrent,
       strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS at_ts
FROM r, m WHERE run = gmax GROUP BY gmax"""
}
