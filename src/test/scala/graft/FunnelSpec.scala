package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** Semantics of the windowFunnel / retention analogs on planted
  * fixtures: step ordering, window bound from the FIRST step, users
  * missing step 1 excluded, retention cohort/offset counting. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowFunnel chains first-match steps inside the window of step 1") {
    val events = Seq(
      // u1: clean view -> click -> purchase chain, all inside 1 hour
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:10:00"), "click"),
      (1L, ts("2024-01-01 00:20:00"), "purchase"),
      // u2: purchase BEFORE the first click — must not count as step 3
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:05:00"), "purchase"),
      (2L, ts("2024-01-01 00:10:00"), "click"),
      // u3: click falls outside the 1-hour window of the first view
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 02:00:00"), "click"),
      // u4: no view at all — not part of the funnel population
      (4L, ts("2024-01-01 00:00:00"), "click"),
      (4L, ts("2024-01-01 00:01:00"), "purchase"),
      // u5: click ok, purchase at +65min — past the window anchored at t1
      (5L, ts("2024-01-01 00:00:00"), "view"),
      (5L, ts("2024-01-01 00:30:00"), "click"),
      (5L, ts("2024-01-01 01:05:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val out = Funnel.windowFunnel(events, col("user_id"), col("ts"),
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"), window = "1 HOUR")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(out === Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("windowFunnel strict_order: interposers break, ties don't") {
    val events = Seq(
      // u1: clean chain — unaffected by strict order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:10:00"), "click"),
      (1L, ts("2024-01-01 00:20:00"), "purchase"),
      // u2: a SECOND view interposes before the click → breaks at 1
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:05:00"), "view"),
      (2L, ts("2024-01-01 00:10:00"), "click"),
      // u3: view interposes between click and purchase → breaks at 2
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:10:00"), "click"),
      (3L, ts("2024-01-01 00:15:00"), "view"),
      (3L, ts("2024-01-01 00:20:00"), "purchase"),
      // u4: a view TIED with the click's timestamp — no order between
      // equals, chain survives to 2
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-01 00:10:00"), "view"),
      (4L, ts("2024-01-01 00:10:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    def run(strict: Boolean) = Funnel.windowFunnel(events,
      col("user_id"), col("ts"),
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"),
      window = "1 HOUR", strictOrder = strict)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // default mode ignores interposers entirely
    assert(run(strict = false) === Map(1L -> 4L, 2L -> 4L, 3L -> 2L))
    // strict: u1 full (3), u2 breaks at 1, u3 breaks at 2, u4 keeps 2
    // (its interposing view is tied with t2, so it does not precede it)
    assert(run(strict = true) === Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("windowFunnel allowTies: same-timestamp events chain (ClickHouse default mode)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:00:00"), "click"), // tied with the view
      (1L, ts("2024-01-01 00:10:00"), "purchase"),
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:10:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq(col("event_type") === "view",
      col("event_type") === "click", col("event_type") === "purchase")
    def run(ties: Boolean) = Funnel.windowFunnel(events, col("user_id"),
      col("ts"), steps, window = "1 HOUR", allowTies = ties)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // strict increase (default): u1's tied click cannot chain → only
    // u2 reaches step 2
    assert(run(ties = false) === Map(1L -> 2L, 2L -> 1L))
    // ties allowed: u1 walks view=click@t0 -> purchase
    assert(run(ties = true) === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(events, col("user_id"), col("ts"), steps,
        window = "1 HOUR", allowTies = true, strictOrder = true)
    }
  }

  test("windowFunnel strict_dedup: repeats interrupt, condition-free events don't") {
    val events = Seq(
      // u1: a condition-FREE event (share) interposes — dedup passes,
      // strict_order would break
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:05:00"), "share"),
      (1L, ts("2024-01-01 00:10:00"), "click"),
      (1L, ts("2024-01-01 00:20:00"), "purchase"),
      // u2: a REPEATED view before the click — dedup breaks at 1
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:05:00"), "view"),
      (2L, ts("2024-01-01 00:10:00"), "click"),
      // u3: a repeated CLICK between click and purchase — breaks at 2
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:10:00"), "click"),
      (3L, ts("2024-01-01 00:15:00"), "click"),
      (3L, ts("2024-01-01 00:20:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq(col("event_type") === "view",
      col("event_type") === "click", col("event_type") === "purchase")
    val dedup = Funnel.windowFunnel(events, col("user_id"), col("ts"),
      steps, window = "1 HOUR", strictDedup = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dedup === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // contrast: strict_order breaks u1 on the share
    val so = Funnel.windowFunnel(events, col("user_id"), col("ts"),
      steps, window = "1 HOUR", strictOrder = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(so(1L) === 3L && so.getOrElse(2L, 0L) === 1L)
  }

  test("retention counts re-activity at exact day offsets per cohort") {
    val events = Seq(
      // cohort 2024-01-01: A active +1 and +3; B never returns
      (10L, ts("2024-01-01 09:00:00")), (10L, ts("2024-01-02 09:00:00")),
      (10L, ts("2024-01-04 09:00:00")),
      (11L, ts("2024-01-01 10:00:00")),
      // cohort 2024-01-02: C active +1 only
      (12L, ts("2024-01-02 12:00:00")), (12L, ts("2024-01-03 12:00:00"))
    ).toDF("user_id", "ts")

    val out = Funnel.retention(events, col("user_id"), col("ts"), Seq(1, 3))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(out === Map(
      "2024-01-01" -> ((2L, 1L, 1L)),
      "2024-01-02" -> ((1L, 1L, 0L))))
  }
}
