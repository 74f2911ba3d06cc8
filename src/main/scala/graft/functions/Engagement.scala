package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Engagement-domain scalar derivations, re-expressed as pure Column
  * expressions (whole-stage-codegen friendly; no UDFs).
  *
  * Semantics derive from the reference's Flink job
  * (`/root/reference/flink-streaming-job/src/main/java/com/cdc/streaming/
  * EnhancedEngagementStreamingJob.java`):
  *  - base score CASE:            :320–330
  *  - log-duration multiplier:    :332–336
  *  - engagement_seconds:         :292–294
  *  - engagement_pct:             :296–301
  *  - event-id normalization:     :521–529
  *  - multi-format ts parse:      :206–233
  */
object Engagement {

  /** Base score per event type (case-insensitive); unknown types get 1.0.
    * Reference: EnhancedEngagementStreamingJob.java:320–330. */
  def engagementBase(eventType: Column): Column = {
    val et = lower(eventType)
    when(et === "play", 1.0)
      .when(et === "pause", 0.5)
      .when(et === "finish", 3.0)
      .when(et === "click", 0.2)
      .otherwise(1.0)
  }

  /** Duration multiplier: min(2.5, ln(duration_ms/1000 + 1)) when
    * duration > 0, else 1.0. Reference: :332–336. */
  def durationFactor(durationMs: Column): Column =
    when(durationMs > 0, least(lit(2.5), log(durationMs / lit(1000.0) + lit(1))))
      .otherwise(lit(1.0))

  /** Two-decimal rounding with the reference's exact semantics:
    * `Math.round(x * 100.0) / 100.0` — i.e. floor(x*100 + 0.5) on the
    * binary double. This is deliberately NOT Spark's `round` (which
    * rounds the shortest decimal representation): at exact .xx5
    * boundaries — reachable for pct where duration/(10·length) is a
    * terminating decimal — the two disagree, and only the floor form is
    * reproducible across engines. */
  private def round2(x: Column): Column =
    floor(x * lit(100.0) + lit(0.5)).cast(DoubleType) / lit(100.0)

  /** engagement_score = Math.round(base * factor * 100) / 100.
    * Reference: :320–337. */
  def engagementScore(eventType: Column, durationMs: Column): Column =
    round2(engagementBase(eventType) * durationFactor(durationMs))

  /** engagement_seconds = duration_ms / 1000.0 (null-through).
    * Reference: :292–294. */
  def engagementSeconds(durationMs: Column): Column =
    (durationMs / lit(1000.0)).cast(DoubleType)

  /** SQL surface for the score: registers `graft_score(event_type,
    * duration_ms)` as a Spark SQL UDF (Spark 4 `CREATE FUNCTION …
    * RETURN <expr>`), which the analyzer INLINES into the calling plan
    * — full Catalyst optimization and whole-stage codegen, unlike a
    * JVM closure UDF. Same ops as [[engagementScore]], so SQL and
    * DataFrame callers get bit-identical doubles. */
  def registerScoreSqlUdf(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_score(
        event_type STRING, duration_ms DOUBLE) RETURNS DOUBLE
      RETURN floor(
        (CASE WHEN lower(event_type) = 'play' THEN 1.0D
              WHEN lower(event_type) = 'pause' THEN 0.5D
              WHEN lower(event_type) = 'finish' THEN 3.0D
              WHEN lower(event_type) = 'click' THEN 0.2D
              ELSE 1.0D END
         * CASE WHEN duration_ms > 0
                THEN least(2.5D, ln(duration_ms / 1000.0D + 1.0D))
                ELSE 1.0D END) * 100.0D + 0.5D) / 100.0D""")

  /** engagement_pct = round(duration_s / length_s * 100, 2); null unless
    * length > 0 and duration present. Reference: :296–301. */
  def engagementPct(durationMs: Column, lengthSeconds: Column): Column =
    when(lengthSeconds > 0 && durationMs.isNotNull,
      round2(durationMs / lit(1000.0) / lengthSeconds * lit(100)))
      .otherwise(lit(null).cast(DoubleType))

  /** Normalize a possibly-string event id to Long; non-numeric ids fall
    * back to abs(murmur3). Reference: :521–529 (uses Java hashCode there;
    * the hash family differs by design — only non-numeric ids hit it). */
  def normalizeEventId(id: Column): Column = {
    // ANSI-safe: only digit strings reach the cast (Spark 4 ANSI mode
    // throws on malformed casts); null ids stay null — hash(null) would
    // otherwise resurrect them as the murmur3 seed. The hash is widened
    // to long BEFORE abs: abs(Int.MinValue) has no int representation
    // (ANSI throws, legacy stays negative), so the ~1-in-2^32 id hashing
    // to MinValue would otherwise break the non-negative contract.
    val numeric = when(id.rlike("^-?[0-9]{1,18}$"), id.cast(LongType))
    when(id.isNotNull, coalesce(numeric, abs(hash(id).cast(LongType))))
  }

  /** Multi-format timestamp parse: ISO-8601 (with/without offset), three
    * fractional precisions, bare seconds, then epoch-micros (Debezium
    * adaptive_time_microseconds). Null if nothing matches.
    * Reference: :206–233 + enhanced-postgres-connector.json:20. */
  def parseTimestampMulti(c: Column): Column =
    // The formats are mutually exclusive (a string with a zone offset
    // fails every offset-less pattern and vice versa), so branch order
    // doesn't change semantics — it's ordered most-common-first to keep
    // the typical row at one parse attempt instead of three.
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      when(c.rlike("^[0-9]{16,}$"), timestamp_micros(c.cast(LongType))))
}
