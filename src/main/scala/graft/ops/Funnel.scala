package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse-style behavioral analytics: `windowFunnel` and `retention`
  * — the two signature aggregate combinators of the reference's target
  * warehouse (the reference's ClickHouse schema is the natural home for
  * them; see /root/reference/sql/clickhouse-init.sql for the events
  * table they'd run over).
  *
  * Both are expressed as chained RELATIONAL stages rather than a
  * per-user collected-array UDAF: every stage is a key-partitioned
  * aggregation or join on `user`, so Spark plans partial+final hash
  * aggregates and reuses the user-hash partitioning across stages —
  * no per-group sort, no unbounded per-group state, no driver-side
  * anything. At 100 TB the shuffled volume is bounded by
  * |users matching step 1| (funnel) / |users| x |active days| (retention),
  * both far below event volume after the map-side combine.
  *
  * windowFunnel semantics (matching ClickHouse's default, strict-order
  * relaxed to first-match chaining): t1 = first step-1 event; t_k =
  * first step-k event AFTER t_{k-1} and within `window` of t1; a user's
  * level = length of the non-null t_k prefix.
  */
object Funnel {

  /** Per-user funnel level, then the classic funnel report: one row per
    * step with the number of users whose level reaches that step
    * (cumulative by construction). `steps` are ordered predicates.
    * Output: (step BIGINT 1-based, users BIGINT). */
  def windowFunnel(events: DataFrame, user: Column, ts: Column,
                   steps: Seq[Column], window: String): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val win = expr(s"INTERVAL $window")
    val e = events.select(Seq(user.as("u"), ts.as("ts")) ++
      steps.zipWithIndex.map { case (p, i) => p.as(s"is_s${i + 1}") }: _*)

    // stage 1: first step-1 event per user; stage k: first step-k event
    // after t_{k-1}, inside t1 + window. Each stage's survivor set only
    // ever shrinks, and each is a user-keyed partial+final hash agg.
    // survivor tables are |users matching step 1|-cardinality — corpus-
    // derived, so every stage join carries the sort-merge pin (the same
    // mis-broadcast exposure as SCALE.md findings one/four/five)
    var cur = e.filter(col("is_s1")).groupBy(col("u")).agg(min(col("ts")).as("t1"))
    var lv = cur.select(col("u"), lit(1).as("level"))
    for (k <- 2 to steps.size) {
      cur = e.filter(col(s"is_s$k")).join(Joins.corpusSide(cur), "u")
        .filter(col("ts") > col(s"t${k - 1}") && col("ts") <= col("t1") + win)
        .groupBy(col("u"))
        .agg(min(col("ts")).as(s"t$k"),
          (1 until k).map(j => min(col(s"t$j")).as(s"t$j")): _*)
      lv = lv.join(Joins.corpusSide(
          cur.select(col("u"), lit(1).as(s"hit$k"))), Seq("u"), "left")
        .select(col("u"),
          (col("level") + when(col(s"hit$k").isNotNull, 1).otherwise(0)).as("level"))
    }
    lv.select(explode(sequence(lit(1L), col("level").cast("long"))).as("step"))
      .groupBy(col("step")).agg(count(lit(1)).as("users"))
  }

  /** DuckDB replica of a 3-step windowFunnel over `events` with the
    * given per-step event_type values. */
  def windowFunnelOracleSql(s1: String, s2: String, s3: String,
                            windowSql: String): String =
    s"""WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type='$s1' GROUP BY 1),
f2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1) AS t1 FROM events e JOIN f1 USING(user_id) WHERE e.event_type='$s2' AND e.ts > t1 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
f3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE e.event_type='$s3' AND e.ts > t2 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
lv AS (SELECT f1.user_id, 1 + CAST(f2.user_id IS NOT NULL AS INT) + CAST(f3.user_id IS NOT NULL AS INT) AS level FROM f1 LEFT JOIN f2 ON f1.user_id = f2.user_id LEFT JOIN f3 ON f1.user_id = f3.user_id)
SELECT step, count(*) AS users FROM (SELECT unnest(range(1, level + 1)) AS step FROM lv) GROUP BY 1"""

  /** ClickHouse `retention`-style cohort table: cohort = calendar day of
    * a user's first event; for each cohort day, how many users were
    * active again exactly `offsets` days later. Output: (cohort_date
    * STRING, cohort_size BIGINT, d<off> BIGINT per offset).
    *
    * Two aggregations: per-user first day (user-partitioned), then
    * distinct (user, day) activity joined back on user and rolled up by
    * cohort day — shuffle volume is active-user-days, not events. */
  def retention(events: DataFrame, user: Column, ts: Column,
                offsets: Seq[Int]): DataFrame = {
    val first = events.groupBy(user.as("u"))
      .agg(min(to_date(ts)).as("d0"))
    val act = events.select(user.as("u"), to_date(ts).as("d")).distinct()
    val offCols = offsets.map(o =>
      count_distinct(when(col("d") === date_add(col("d0"), o), col("u")))
        .as(s"d$o"))
    first.join(Joins.corpusSide(act), "u")
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_date"))
      .agg(count_distinct(col("u")).as("cohort_size"), offCols: _*)
  }

  /** DuckDB replica of [[retention]] over `events`. */
  def retentionOracleSql(offsets: Seq[Int]): String = {
    val offSql = offsets.map(o =>
      s"count(DISTINCT CASE WHEN d = d0 + $o THEN act.user_id END) AS d$o").mkString(", ")
    s"""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT strftime(d0, '%Y-%m-%d') AS cohort_date, count(DISTINCT f.user_id) AS cohort_size, $offSql FROM f JOIN act ON f.user_id = act.user_id GROUP BY d0"""
  }
}
