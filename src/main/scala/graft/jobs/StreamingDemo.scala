package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sinks.Warehouse
import graft.sources.Workload
import graft.streaming.Pipeline

/** The full §3.1/§3.2 job graph wired end-to-end on live streams — the
  * reference's deployed topology minus the external transports:
  *
  *   workload rate-stream → Debezium-shaped JSON   (stands in for Kafka)
  *     ├─ content changes → foreachBatch dim merge (snapshot parquet)
  *     └─ engagement → unwrap → broadcast enrich → fan-out:
  *          ├─ warehouse append (LWW parquet, month-partitioned)
  *          ├─ hourly rollup (watermarked, append)
  *          └─ per-type counters (update)
  *
  * `runMain graft.jobs.StreamingDemo [seconds] [eventsPerSecond]`
  * runs the graph for a bounded wall-clock window and prints sink row
  * counts — a smoke harness, not a benchmark.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = if (args.nonEmpty) args(0).toInt else 30
    val rate = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = Files.createTempDirectory("graft-demo").toString
    val dimPath = s"$work/dim"
    val whPath = s"$work/warehouse"

    // seed the dimension with 15 content rows (init.sql-style seed)
    graft.dim.ContentDim.applyBatch(spark, dimPath,
      graft.cdc.Envelope.unwrapContent(
        spark.range(15).select(concat(lit("{\"payload\":{\"after\":{\"id\":\"content-"),
          col("id"), lit("\",\"content_type\":\"podcast\",\"length_seconds\":300,"
            + "\"publish_ts\":\"2024-01-01T00:00:00\"},\"op\":\"c\",\"ts_ms\":1}}"))
          .as("value"))))

    val wire = Workload.asDebeziumJson(Workload.stream(spark, rate))

    // 5 s triggers amortize the per-batch fixed cost (dim re-read +
    // broadcast + parquet commit) — the throughput knob for micro-batch
    // pipelines; the per-row cost itself is ~250k events/s on this box
    // (see Bench q_enrich_join)
    // null event_ts rows land with a substituted processing timestamp
    // (the reference's sink fallback); the batch-id tag makes restart
    // replays a no-op (exactly-once landing)
    val warehouseQ = Pipeline.enrichedSink(wire, dimPath, s"$work/ckp-wh") {
      (df, id) => Warehouse.appendOnce(df, whPath, id)
    }.trigger(Trigger.ProcessingTime("5 seconds")).start()

    val enrichedForAggs = Pipeline.enrichedStream(spark, wire, dimPath)
    val rollupQ = Pipeline.hourlyRollup(enrichedForAggs)
      .writeStream.format("memory").queryName("rollup")
      .option("checkpointLocation", s"$work/ckp-rollup")
      .outputMode(OutputMode.Append).start()
    val countersQ = Pipeline.eventTypeCounters(enrichedForAggs)
      .writeStream.format("memory").queryName("counters")
      .option("checkpointLocation", s"$work/ckp-counters")
      .outputMode(OutputMode.Update).start()

    // stream-stream attribution arm: click → play within 10 min per
    // user, both sides watermarked (state evicts with the horizon)
    val evForAttr = enrichedForAggs.select(col("event_id"), col("user_id"),
      col("event_ts").as("ts"), col("event_type"))
    val attrQ = Pipeline.attributionJoin(
        evForAttr.filter(col("event_type") === "click").drop("event_type"),
        evForAttr.filter(col("event_type") === "play").drop("event_type"),
        "10 minutes")
      .writeStream.format("memory").queryName("attribution")
      .option("checkpointLocation", s"$work/ckp-attr")
      .outputMode(OutputMode.Append).start()

    // greedy sequence-count arm: non-overlapping click→play matches per
    // user, O(1) state per key (the streaming twin of q_seq_count)
    val seqQ = Pipeline.streamingSequenceCount(
        evForAttr.filter(col("event_type").isin("click", "play"))
          // the wire user_id is a STRING ("user-N"); the state key is a
          // long — hash it stably rather than cast-to-null
          .select(xxhash64(col("user_id")).as("user_id"),
            col("ts").as("event_ts"),
            col("event_id").as("tiebreak"),
            (col("event_type") === "play").as("is_b")))
      .writeStream.format("memory").queryName("seqcount")
      .option("checkpointLocation", s"$work/ckp-seq")
      .outputMode(OutputMode.Update).start()

    // live JDBC warehouse arm (embedded Derby — the reference's
    // ClickHouse sink analog, real database, per-task batched INSERTs)
    val jdbcUrl = graft.sinks.Jdbc.derbyMemUrl("graftdemo")
    val jdbcQ = Pipeline.enrichedSink(wire, dimPath, s"$work/ckp-jdbc") { (df, id) =>
      graft.sinks.Jdbc.streamWriter(jdbcUrl, "events_wh",
        Some("user_id VARCHAR(64), event_type VARCHAR(32)"))(
        df.select(col("event_id"), col("user_id"), col("event_type"),
          col("engagement_score")), id)
    }.trigger(Trigger.ProcessingTime("5 seconds")).start()

    Thread.sleep(runSeconds * 1000L)
    // wait for at least one committed warehouse batch so the stop below
    // doesn't leave only aborted task files behind
    val deadline = System.currentTimeMillis() + 120000
    while (Seq(warehouseQ, countersQ, jdbcQ).exists(
        _.recentProgress.count(_.numInputRows > 0) < 1) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    // NOTE: no processAllAvailable here — the rate source produces
    // continuously, so "all available" never drains; bounded runs stop.
    Seq(warehouseQ, rollupQ, countersQ, attrQ, seqQ, jdbcQ).foreach(_.stop())

    val whRows = Warehouse.read(spark, whPath).count()
    val enrichedPct = Warehouse.read(spark, whPath)
      .filter(col("content_type").isNotNull).count().toDouble / math.max(whRows, 1)
    // update-mode memory sink retains every per-batch emission; the
    // current counter value is the max (counts are monotone)
    val counters = spark.sql(
      "SELECT event_type, max(count) FROM counters GROUP BY 1").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    val attrPairs = spark.sql("SELECT count(*) FROM attribution").head.getLong(0)
    val jdbcRows =
      try graft.sinks.Jdbc.readTable(spark, jdbcUrl, "events_wh").count()
      catch { case _: Exception => 0L } // no batch committed in a very short run
    println(s"[demo] warehouse rows (deduped): $whRows")
    println(f"[demo] enriched fraction: ${enrichedPct * 100}%.1f%%")
    println(s"[demo] counters: $counters")
    println(s"[demo] attribution pairs (click→play ≤10 min): $attrPairs")
    // update-mode sink retains per-batch emissions; matches are monotone
    val seqMatches = spark.sql(
      "SELECT COALESCE(CAST(sum(m) AS BIGINT), 0) FROM (SELECT max(matches) AS m FROM seqcount GROUP BY userId)")
      .head.getLong(0)
    println(s"[demo] greedy click→play sequence matches: $seqMatches")
    println(s"[demo] JDBC warehouse rows (Derby): $jdbcRows")
    println(s"[demo] throughput ~ ${whRows / math.max(runSeconds, 1)} events/s over $runSeconds s")
    spark.stop()
  }
}
