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
    * Output: (step BIGINT 1-based, users BIGINT).
    *
    * `strictOrder` = ClickHouse's `'strict_order'` mode: an
    * INTERPOSING event — any event strictly between t_{k-1} and the
    * step-k candidate that does NOT satisfy step k (repeats of earlier
    * steps included) — breaks the chain at level k−1. An event tied
    * with the candidate's timestamp does not break (equal timestamps
    * carry no order; ClickHouse leaves ties unspecified — this is the
    * deterministic reading), and events at exactly t_{k-1} are not
    * "between". The check is one extra user-keyed min-aggregate join
    * per stage over the survivors' events — same scale class as the
    * stage itself.
    *
    * `strictDedup` = ClickHouse's `'strict_dedup'`: only a REPEAT of
    * an already-matched condition (steps 1..k−1) interrupts; events
    * matching no condition pass freely, and an event that also matches
    * step k advances rather than interrupts. Same tie rule, same plan
    * shape. The two modes are mutually exclusive by construction here
    * (strictOrder wins if both are set — it subsumes the dedup
    * breakers). */
  def windowFunnel(events: DataFrame, user: Column, ts: Column,
                   steps: Seq[Column], window: String,
                   strictOrder: Boolean = false,
                   strictDedup: Boolean = false,
                   allowTies: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    require(!allowTies || (!strictOrder && !strictDedup),
      "allowTies (the ClickHouse default mode) and the strict modes are exclusive")
    val win = expr(s"INTERVAL $window")
    // default chaining is STRICT increase (t_k > t_{k-1} — ClickHouse
    // 'strict_increase'); allowTies switches to >= (the ClickHouse
    // DEFAULT, where same-timestamp events may chain consecutive
    // steps). With disjoint step predicates a single event can never
    // satisfy two steps; overlapping predicates could chain one event
    // into itself under ties — the relational chain tracks timestamps,
    // not event identity (documented divergence).
    def after(a: Column, b: Column): Column =
      if (allowTies) a >= b else a > b
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
      val prev = cur
      cur = e.filter(col(s"is_s$k")).join(Joins.corpusSide(prev), "u")
        .filter(after(col("ts"), col(s"t${k - 1}")) &&
          col("ts") <= col("t1") + win)
        .groupBy(col("u"))
        .agg(min(col("ts")).as(s"t$k"),
          (1 until k).map(j => min(col(s"t$j")).as(s"t$j")): _*)
      // breaker events for the two strict modes — both reduce to "the
      // first event of class C after t_{k-1} must not strictly precede
      // the step-k candidate":
      //   strict_order: C = everything that is not a step-k match
      //   strict_dedup: C = repeats of the ALREADY-matched conditions
      //     1..k−1 (a condition-free event passes; an event that also
      //     matches step k advances rather than interrupts)
      val breakerPred: Option[Column] =
        if (strictOrder) Some(!coalesce(col(s"is_s$k"), lit(false)))
        else if (strictDedup) Some(
          (1 until k).map(j => coalesce(col(s"is_s$j"), lit(false)))
            .reduce(_ || _) && !coalesce(col(s"is_s$k"), lit(false)))
        else None
      breakerPred.foreach { p =>
        val interp = e.filter(p)
          .join(Joins.corpusSide(prev.select(col("u"), col(s"t${k - 1}"))), "u")
          .filter(col("ts") > col(s"t${k - 1}"))
          .groupBy(col("u")).agg(min(col("ts")).as("__m"))
        cur = cur.join(interp, Seq("u"), "left")
          .filter(col("__m").isNull || col(s"t$k") <= col("__m"))
          .drop("__m")
      }
      lv = lv.join(Joins.corpusSide(
          cur.select(col("u"), lit(1).as(s"hit$k"))), Seq("u"), "left")
        .select(col("u"),
          (col("level") + when(col(s"hit$k").isNotNull, 1).otherwise(0)).as("level"))
    }
    lv.select(explode(sequence(lit(1L), col("level").cast("long"))).as("step"))
      .groupBy(col("step")).agg(count(lit(1)).as("users"))
  }

  /** DuckDB replica of a 3-step windowFunnel over `events` with the
    * given per-step event_type values. `op` is the chaining
    * comparison: ">" (strict increase, the engine default) or ">="
    * (ClickHouse's tie-chaining default mode). */
  def windowFunnelOracleSql(s1: String, s2: String, s3: String,
                            windowSql: String, op: String = ">"): String =
    s"""WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type='$s1' GROUP BY 1),
f2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1) AS t1 FROM events e JOIN f1 USING(user_id) WHERE e.event_type='$s2' AND e.ts $op t1 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
f3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE e.event_type='$s3' AND e.ts $op t2 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
lv AS (SELECT f1.user_id, 1 + CAST(f2.user_id IS NOT NULL AS INT) + CAST(f3.user_id IS NOT NULL AS INT) AS level FROM f1 LEFT JOIN f2 ON f1.user_id = f2.user_id LEFT JOIN f3 ON f1.user_id = f3.user_id)
SELECT step, count(*) AS users FROM (SELECT unnest(range(1, level + 1)) AS step FROM lv) GROUP BY 1"""

  /** DuckDB replica of the 3-step STRICT-ORDER windowFunnel: each
    * stage k additionally computes m_k = the first non-step-k event
    * after t_{k-1}; the candidate survives only if t_k ≤ m_k. A null
    * event_type never matches a step, so it interposes (the Spark
    * side's coalesce-to-false reading). */
  def windowFunnelStrictOracleSql(s1: String, s2: String, s3: String,
                                  windowSql: String): String =
    s"""WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type='$s1' GROUP BY 1),
c2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1) AS t1 FROM events e JOIN f1 USING(user_id) WHERE e.event_type='$s2' AND e.ts > t1 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
m2 AS (SELECT e.user_id, min(e.ts) AS m FROM events e JOIN f1 USING(user_id) WHERE (e.event_type <> '$s2' OR e.event_type IS NULL) AND e.ts > t1 GROUP BY 1),
f2 AS (SELECT c2.user_id, c2.t2, c2.t1 FROM c2 LEFT JOIN m2 ON c2.user_id = m2.user_id WHERE m2.m IS NULL OR c2.t2 <= m2.m),
c3 AS (SELECT e.user_id, min(e.ts) AS t3, min(t2) AS t2 FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE e.event_type='$s3' AND e.ts > t2 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
m3 AS (SELECT e.user_id, min(e.ts) AS m FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE (e.event_type <> '$s3' OR e.event_type IS NULL) AND e.ts > f2.t2 GROUP BY 1),
f3 AS (SELECT c3.user_id FROM c3 LEFT JOIN m3 ON c3.user_id = m3.user_id WHERE m3.m IS NULL OR c3.t3 <= m3.m),
lv AS (SELECT f1.user_id, 1 + CAST(f2.user_id IS NOT NULL AS INT) + CAST(f3.user_id IS NOT NULL AS INT) AS level FROM f1 LEFT JOIN f2 ON f1.user_id = f2.user_id LEFT JOIN f3 ON f1.user_id = f3.user_id)
SELECT step, count(*) AS users FROM (SELECT unnest(range(1, level + 1)) AS step FROM lv) GROUP BY 1"""

  /** DuckDB replica of the 3-step STRICT-DEDUP windowFunnel: stage-k
    * breakers are repeats of the already-matched conditions (step-1
    * types at stage 2; step-1-or-2 types at stage 3), never
    * condition-free events. */
  def windowFunnelDedupOracleSql(s1: String, s2: String, s3: String,
                                 windowSql: String): String =
    s"""WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type='$s1' GROUP BY 1),
c2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1) AS t1 FROM events e JOIN f1 USING(user_id) WHERE e.event_type='$s2' AND e.ts > t1 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
m2 AS (SELECT e.user_id, min(e.ts) AS m FROM events e JOIN f1 USING(user_id) WHERE e.event_type='$s1' AND e.ts > t1 GROUP BY 1),
f2 AS (SELECT c2.user_id, c2.t2, c2.t1 FROM c2 LEFT JOIN m2 ON c2.user_id = m2.user_id WHERE m2.m IS NULL OR c2.t2 <= m2.m),
c3 AS (SELECT e.user_id, min(e.ts) AS t3, min(t2) AS t2 FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE e.event_type='$s3' AND e.ts > t2 AND e.ts <= t1 + INTERVAL $windowSql GROUP BY 1),
m3 AS (SELECT e.user_id, min(e.ts) AS m FROM events e JOIN f2 ON e.user_id = f2.user_id WHERE e.event_type IN ('$s1', '$s2') AND e.ts > f2.t2 GROUP BY 1),
f3 AS (SELECT c3.user_id FROM c3 LEFT JOIN m3 ON c3.user_id = m3.user_id WHERE m3.m IS NULL OR c3.t3 <= m3.m),
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
