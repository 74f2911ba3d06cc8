package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.streaming.Pipeline

/** Streaming-state scale probe: every SCALE.md rung is batch; this one
  * measures the STATE STORE. The 100 TB question for a TTL'd serving
  * state (Pipeline.lastEventWithTTL — ST3, the Redis SETEX analog) is
  * whether state grows with LIVE keys or with keys EVER SEEN: a store
  * that never evicts dies at production key cardinality no matter how
  * clean the per-batch plan is. The probe drives the operator through
  * MemoryStream at 1× and 10× total-key cardinality with a FIXED live
  * set, and asserts from the query's own state-operator metrics
  * (numRowsTotal) that (a) state really did hold every key before the
  * TTL passed, and (b) after the watermark crosses the cold keys'
  * deadlines, state collapses to the live set — IDENTICAL at both
  * scales. 10× keys-ever-seen, 1× state: eviction works at volume.
  */
class StreamingStateProbeSpec extends SparkSpec {

  private def lastStateRows(q: StreamingQuery): Long =
    q.recentProgress.reverseIterator
      .flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal)
      .find(_ > 0L)
      .getOrElse(0L)

  /** Feed `totalKeys` distinct keys once, let their TTL deadlines pass
    * the watermark while only `liveKeys` keys stay active; returns
    * (peak state rows, final state rows). */
  private def probe(totalKeys: Int, liveKeys: Int): (Long, Long) = {
    import spark.implicits._
    val ttlMs = 60000L
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val in = MemoryStream[(String, String, java.sql.Timestamp)](spark)
    val out = Pipeline.lastEventWithTTL(
      in.toDS().toDF("user_id", "content_id", "event_ts"), ttlMs,
      eventTimeTTL = true, watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("noop").start()
    try {
      // phase 1: every key appears once at t0 → state = totalKeys,
      // every deadline = t0 + 60 s
      in.addData((0 until totalKeys).map(i => (s"u$i", "c", ts(t0))))
      q.processAllAvailable()
      val peak = lastStateRows(q)
      // phase 2: only the live set speaks again, 180 s later — the
      // batch advances the watermark past every cold deadline and
      // re-arms the live keys' deadlines to t0 + 240 s
      in.addData((0 until liveKeys).map(i => (s"u$i", "c", ts(t0 + 180000L))))
      q.processAllAvailable()
      // phase 3: one more batch (a single key at t0 + 190 s — BELOW
      // the live deadlines) so the timers armed before the watermark
      // jump actually fire; event-time timeouts evaluate against the
      // watermark of the PREVIOUS batch, so eviction lands here
      in.addData(Seq(("w", "c", ts(t0 + 190000L))))
      q.processAllAvailable()
      (peak, lastStateRows(q))
    } finally q.stop()
  }

  test("TTL state tracks LIVE keys, not keys ever seen (1x vs 10x cardinality)") {
    val live = 100
    val (peak1, fin1) = probe(totalKeys = 2000, liveKeys = live)
    val (peak10, fin10) = probe(totalKeys = 20000, liveKeys = live)
    // state really held the full key space before the TTL passed —
    // the probe is measuring the store, not an empty operator
    assert(peak1 >= 2000L, s"1x peak state $peak1 — probe not loading state")
    assert(peak10 >= 20000L, s"10x peak state $peak10 — probe not loading state")
    // after eviction: live set + the phase-3 key, exactly — at BOTH
    // scales. Growth with keys-ever-seen would show ~totalKeys here.
    assert(fin1 === live + 1L,
      s"1x final state $fin1 != ${live + 1} — TTL eviction broken")
    assert(fin10 === live + 1L,
      s"10x final state $fin10 != ${live + 1} — state grew with dead keys")
  }

  /** Same question for the STREAM-STREAM interval join
    * (Pipeline.attributionJoin): both join state stores must be
    * bounded by the watermark horizon (rows still joinable), never by
    * rows ever seen — the two-sided time bound in the join condition
    * is what licenses eviction. */
  private def joinProbe(n: Int): (Long, Long) = {
    import spark.implicits._
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val clicksIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val purchIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    def shape(in: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      in.toDS().toDF("event_id", "user_id", "ts")
    val joined = Pipeline.attributionJoin(shape(clicksIn), shape(purchIn),
      "1 hour", watermark = "0 seconds")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("noop").start()
    try {
      // n clicks at t0 (n distinct users), 50 matching purchases 30 min
      // in — every click row is still joinable, so state must hold all
      clicksIn.addData((0 until n).map(i => (i.toLong, i.toLong, ts(t0))))
      purchIn.addData((0 until 50).map(i => (100000L + i, i.toLong, ts(t0 + 1800000L))))
      q.processAllAvailable()
      val peak = lastStateRows(q)
      // both watermarks jump 4 h past t0: every click's [t0, t0+1h]
      // window and every purchase's joinability horizon is closed;
      // a second tick lets the eviction land
      clicksIn.addData(Seq((900001L, 1L, ts(t0 + 14400000L))))
      purchIn.addData(Seq((900002L, 2L, ts(t0 + 14400000L))))
      q.processAllAvailable()
      clicksIn.addData(Seq((900003L, 1L, ts(t0 + 14400001L))))
      purchIn.addData(Seq((900004L, 2L, ts(t0 + 14400001L))))
      q.processAllAvailable()
      (peak, lastStateRows(q))
    } finally q.stop()
  }

  test("stream-stream join state is watermark-bounded, not rows-ever-seen (1x vs 10x)") {
    val (p1, f1) = joinProbe(2000)
    val (p10, f10) = joinProbe(20000)
    assert(p1 >= 2000L, s"1x peak join state $p1 — probe not loading state")
    assert(p10 >= 20000L, s"10x peak join state $p10 — probe not loading state")
    // after the horizon closes: only the handful of watermark-advancing
    // rows remain — identical at both scales. Growth with rows-ever-
    // seen would show ~n here.
    assert(f1 <= 10L, s"1x final join state $f1 — expired rows not evicted")
    assert(f10 <= 10L, s"10x final join state $f10 — state grew with input volume")
    assert(f1 === f10, s"final state differs across scales: $f1 vs $f10")
  }
}
