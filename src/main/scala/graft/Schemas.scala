package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared schemas for every table the engine owns (SURVEY §1.4: one
  * Schemas module; the engine path never infers). Wire-shape schemas for
  * the CDC envelopes live in graft.cdc.Envelope.
  */
object Schemas {

  /** The content dimension (reference sql/init.sql:7–14). */
  val content: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("slug", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("content_type", StringType),
    StructField("length_seconds", IntegerType),
    StructField("publish_ts", TimestampType, nullable = false)))

  /** The engagement fact (reference sql/init.sql:16–25). */
  val engagementEvents: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("content_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", TimestampType, nullable = false),
    StructField("duration_ms", IntegerType),
    StructField("device", StringType),
    StructField("raw_payload", StringType)))

  /** The enriched in-flight/warehouse record — the 13-field shape of the
    * reference's EngagementEvent POJO (EngagementEvent.java:11–48) /
    * analytics.enriched_events (clickhouse-init.sql:7–23). */
  val enrichedEvent: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", StringType),
    StructField("content_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", TimestampType),
    StructField("session_id", StringType),
    StructField("platform", StringType),
    StructField("duration_ms", LongType),
    StructField("engagement_score", DoubleType),
    StructField("content_type", StringType),
    StructField("length_seconds", IntegerType),
    StructField("engagement_seconds", DoubleType),
    StructField("engagement_pct", DoubleType)))

  /** Project an Enrich.enrich output onto the exact enrichedEvent column
    * set (adds the session_id extraction from raw_payload that the
    * reference's POJO carries, EngagementEvent.java:24/30). */
  def toEnrichedEvent(df: DataFrame): DataFrame =
    df.withColumn("session_id", get_json_object(col("raw_payload"), "$.session_id"))
      .select(enrichedEvent.fieldNames.map(col): _*)
}
