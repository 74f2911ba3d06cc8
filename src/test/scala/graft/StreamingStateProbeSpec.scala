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
}
