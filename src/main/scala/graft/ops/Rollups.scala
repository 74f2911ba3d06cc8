package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch analogs of the reference's serving/warehouse aggregations
  * (SURVEY.md §2.5: A1 hourly MV, A3/A4 running scores, A5 per-minute
  * top-k, A6 counters, A7 last-event-per-key). Streaming variants live
  * in graft.streaming.
  *
  * All aggregations are hash-based with map-side partial aggregation
  * (Spark HashAggregateExec partial+final — the same split ClickHouse's
  * SummingMergeTree performs at merge time, see
  * /root/reference/sql/clickhouse-init.sql:26–38).
  *
  * Sums of doubles go through a DecimalType cast so the result is exact
  * and independent of partitioning / aggregation order — at 1000
  * executors a plain double sum is nondeterministic run to run.
  */
object Rollups {

  /** Order-independent exact sum of a double column: cast each value to
    * decimal(28, scale), sum, return double. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** A1: tumbling-hour rollup. Dimension columns + count + exact score
    * sum. Equivalent of the ClickHouse hourly MV
    * (clickhouse-init.sql:26–38) as a batch groupBy. */
  def hourlyRollup(df: DataFrame, ts: Column, dims: Seq[Column], score: Column): DataFrame =
    df.groupBy((date_format(date_trunc("hour", ts), "yyyy-MM-dd HH:mm:ss").as("hour_ts") +: dims): _*)
      .agg(count(lit(1)).as("cnt"), decSum(score).as("score_sum"))

  /** A1 as a materialized view: same rollup but with a timestamp-typed
    * hour_ts so graft.plans.MvRouting can substitute it for the base
    * aggregation (the query's date_trunc output type must match). */
  def hourlyRollupMv(df: DataFrame, ts: Column, dims: Seq[Column], score: Column): DataFrame =
    df.groupBy((date_trunc("hour", ts).as("hour_ts") +: dims): _*)
      .agg(count(lit(1)).as("cnt"), decSum(score).as("score_sum"),
        // non-null score count: MvRouting's avg rewrite divides by
        // Σ score_cnt (avg ignores nulls; cnt is count(*) and would
        // silently diverge on a nullable score column)
        count(score).as("score_cnt"))

  /** A5: per-minute top-k keys by score sum. Minute bucket uses the
    * reference's yyyyMMddHHmm key shape
    * (EnhancedEngagementStreamingJob.java:430–436). Deterministic: ties
    * broken by key ascending. */
  def minuteTopK(df: DataFrame, ts: Column, key: Column, score: Column, k: Int): DataFrame = {
    val bucketed = df
      .groupBy(date_format(ts, "yyyyMMddHHmm").as("minute_bucket"), key.as("key"))
      .agg(decSum(score).as("score_sum"))
    val w = Window.partitionBy(col("minute_bucket"))
      .orderBy(col("score_sum").desc, col("key").asc)
    bucketed.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** A3/A4: cumulative score per (grouping keys). */
  def runningScores(df: DataFrame, keys: Seq[Column], score: Column): DataFrame =
    df.groupBy(keys: _*).agg(decSum(score).as("score_sum"), count(lit(1)).as("events"))

  /** A6: per-key event counters. */
  def counters(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))

  /** Sessionization: gap-based session windows per key (a new session
    * starts when the gap since the previous event reaches `gap`).
    * Batch form of Spark's session_window; works in streaming too. */
  def sessionize(df: DataFrame, ts: Column, key: Column, gap: String): DataFrame =
    df.groupBy(session_window(ts, gap).as("sw"), key)
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("value_sum"))
      .select(
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        key, col("cnt"), col("value_sum"))

  /** Skew-resistant two-stage sum (SURVEY §7.4 #6): rows are salted into
    * `buckets` sub-groups, partially aggregated, then re-aggregated on
    * the true key. Decimal-exact, so the result equals the direct sum;
    * at 1000 executors this is what keeps one hot key from pinning a
    * single reducer. `saltSrc` should be a high-cardinality column. */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column,
      saltSrc: Column, buckets: Int = 16, scale: Int = 2): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value.cast(DecimalType(28, scale))).as("__partial"),
        count(lit(1)).as("__cnt"))
    stage1.groupBy(keys: _*)
      .agg(sum(col("__partial")).cast("double").as("value_sum"),
        sum(col("__cnt")).as("cnt"))
  }

  /** A7: latest row per key — the same contract as last-writer-wins
    * dedup with (version = ts), so it delegates to the single
    * formulation in [[Dedup.lww]] (one shuffle on the key, no
    * driver-side state). */
  def lastPerKey(df: DataFrame, keys: Seq[Column], ts: Column, tiebreak: Column): DataFrame =
    Dedup.lww(df, keys, ts, tiebreak)

  /** Time-decayed score rollup (ClickHouse's exponentialMovingAverage /
    * Redis decay-counter serving pattern): each event contributes
    * score · 2^(-age/halflife) toward its key's total, evaluated at the
    * stream's frontier (the global max ts — deterministic, so replays
    * agree). The decay is EXACT-INTEGER: age quantizes to whole
    * halflives k = floor(age_sec / halflifeSec), each contribution is
    * the BIGINT centi_score · 2^(horizon - k) (a left shift), and the
    * rollup sums longs — order-independent, engine-exact, replayable.
    * Contributions older than `horizon` halflives are exactly 0 (<1%
    * weight left by k=7; horizon=30 keeps the shift budget safe:
    * centi ≤ ~750 · 2^30 per term, << 2^63 across any corpus).
    *
    * Scale: the frontier is a one-row aggregate broadcast back (the
    * BM25 stats shape); the rollup is one hash aggregate with map-side
    * combine — no window, no sort, and the quantized-decay form is
    * exactly what an incremental maintainer needs (a SummingStore MV
    * over (key, k) buckets re-weights by shifting, never re-scans). */
  def decayedScore(df: DataFrame, key: Column, ts: Column,
      scoreCenti: Column, halflifeSec: Long = 86400L,
      horizon: Int = 30): DataFrame = {
    require(halflifeSec > 0 && horizon >= 1 && horizon <= 40)
    val frontier = df.agg(max(ts).as("__t_max"))
    df.select(key.as("key"), ts.as("__ts"), scoreCenti.as("__sc"))
      .crossJoin(broadcast(frontier))
      // integer micros end to end: Spark's unix_timestamp floors to
      // seconds while DuckDB's epoch() keeps the fraction — micros are
      // the shared exact currency (unix_micros / epoch_us)
      .withColumn("__k",
        expr(s"(unix_micros(__t_max) - unix_micros(__ts)) DIV " +
          s"${halflifeSec * 1000000L}"))
      .withColumn("__w", when(col("__k") < horizon,
        expr(s"shiftleft(CAST(__sc AS BIGINT), CAST($horizon - __k AS INT))"))
        .otherwise(lit(0L)))
      .groupBy(col("key"))
      .agg(sum(col("__w")).as(s"decayed_q$horizon"),
        count(lit(1)).as("events"))
  }

  /** DuckDB replica of [[decayedScore]] with `keySql`/`scoreCentiSql`
    * over table `events` (ts column `ts`). */
  def decayedScoreOracleSql(keySql: String, scoreCentiSql: String,
      halflifeSec: Long = 86400L, horizon: Int = 30): String =
    s"""WITH f AS (SELECT max(ts) AS t_max FROM events),
terms AS (SELECT $keySql AS key, CAST((epoch_us(t_max) - epoch_us(ts)) // ${halflifeSec * 1000000L} AS BIGINT) AS k, CAST($scoreCentiSql AS BIGINT) AS sc FROM events, f)
SELECT key, CAST(sum(CASE WHEN k < $horizon THEN sc << CAST($horizon - k AS INTEGER) ELSE 0 END) AS BIGINT) AS decayed_q$horizon, count(*) AS events FROM terms GROUP BY 1"""
}
