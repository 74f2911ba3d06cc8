package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Engagement

/** Debezium change-event envelope handling: schemas + unwrap for both
  * CDC streams, defensively accepting enveloped AND flattened message
  * shapes, exactly like the reference's parsers
  * (/root/reference/flink-streaming-job/.../EnhancedEngagementStreamingJob.java:157–276;
  * envelope shape per debezium/enhanced-postgres-connector.json:28–38).
  *
  * Everything is `from_json` + Column expressions — schema-on-read with
  * per-field null tolerance, fully codegen'd, no UDFs. Malformed JSON
  * yields null structs (PERMISSIVE mode) which callers drop (P4).
  */
object Envelope {

  /** Wire shape of an engagement_events row (timestamps as strings —
    * the connector serializes without schemas, see
    * enhanced-postgres-connector.json:35–38). */
  val engagementRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("content_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),
    StructField("duration_ms", LongType),
    StructField("device", StringType),
    StructField("raw_payload", StringType)))

  /** Wire shape of a content row. */
  val contentRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("slug", StringType),
    StructField("title", StringType),
    StructField("content_type", StringType),
    StructField("length_seconds", IntegerType),
    StructField("publish_ts", StringType)))

  /** Debezium envelope around a record schema:
    * {payload: {before, after, op, ts_ms, source: {db, table, ts_ms}}}. */
  def envelopeSchema(record: StructType): StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", record),
      StructField("after", record),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("table", StringType),
        StructField("ts_ms", LongType)))))))))

  /** COMBINED wire schema: the record's fields at the root (for the
    * connector's ExtractNewRecordState-flattened shape) plus the
    * Debezium payload envelope — so ONE from_json serves both message
    * shapes. A flat message populates the root fields (payload stays
    * null); an enveloped one populates payload.* (root fields stay
    * null). Halves the intrinsic parse work vs parsing each shape
    * separately. */
  private def combinedSchema(record: StructType): StructType =
    StructType(record.fields :+
      StructField("payload", envelopeSchema(record).fields.head.dataType))

  /** Parse the wire ONCE and materialize the result behind an explode
    * barrier: `explode(array(parsed))` introduces a Generate node, and
    * CollapseProject cannot inline expressions through Generate — so
    * every downstream field extraction reads the one materialized
    * struct attribute instead of re-running Jackson. Without the
    * barrier, collapsing the projections re-evaluates from_json once
    * per referencing expression (measured ~2.5× the whole unwrap cost
    * at sf0.1). */
  private def parsedOnce(raw: DataFrame, record: StructType): DataFrame =
    raw.select(explode(array(
      from_json(col("value").cast(StringType), combinedSchema(record)))).as("j"))

  private def hasAfter: Column =
    col("j.payload").isNotNull && col("j.payload.after").isNotNull

  /** Enveloped-or-flat field: payload.after.f when the envelope carries
    * a record, else the root field (the reference accepts both shapes,
    * :164–168). */
  private def rec(f: String): Column =
    when(hasAfter, col(s"j.payload.after.$f")).otherwise(col(s"j.$f"))

  /** P1+P2+P8: unwrap an engagement-events CDC stream. Input: a
    * DataFrame with a string `value` column (Kafka value). Output
    * columns: event_id (normalized long), user_id, content_id,
    * event_type, platform, duration_ms, event_ts (parsed), raw_payload.
    * Rows that fail to yield an id are dropped (P4/F2) — malformed
    * JSON parses to a null struct (PERMISSIVE), which has no id. */
  def unwrapEngagement(raw: DataFrame): DataFrame =
    parsedOnce(raw, engagementRecordSchema)
      .filter(rec("id").isNotNull)
      .select(
        Engagement.normalizeEventId(rec("id")).as("event_id"),
        rec("user_id").as("user_id"),
        rec("content_id").as("content_id"),
        rec("event_type").as("event_type"),
        rec("device").as("platform"),
        rec("duration_ms").as("duration_ms"),
        Engagement.parseTimestampMulti(rec("event_ts")).as("event_ts"),
        rec("raw_payload").as("raw_payload"))

  /** P3: unwrap a content CDC stream including delete tombstones. Takes
    * payload.after for upserts; for op in {d, D} with null after, emits
    * a tombstone from payload.before.id (reference :244–276). Output:
    * id, slug, title, content_type, length_seconds, publish_ts,
    * is_delete, change_seq (source ts_ms for LWW ordering). Rows with
    * no id are dropped (F3). */
  def unwrapContent(raw: DataFrame): DataFrame = {
    val isDelete = col("j.payload").isNotNull &&
      col("j.payload.after").isNull && upper(col("j.payload.op")) === "D"
    parsedOnce(raw, contentRecordSchema)
      .select(
        when(hasAfter, col("j.payload.after.id"))
          .when(isDelete, col("j.payload.before.id"))
          .otherwise(col("j.id")).as("id"),
        rec("slug").as("slug"),
        rec("title").as("title"),
        rec("content_type").as("content_type"),
        rec("length_seconds").as("length_seconds"),
        rec("publish_ts").as("publish_ts"),
        coalesce(isDelete, lit(false)).as("is_delete"),
        coalesce(col("j.payload.ts_ms"), lit(0L)).as("change_seq"))
      .filter(col("id").isNotNull)
  }

  /** P10: connector-style metadata injection. */
  def withIngestMetadata(df: DataFrame, sourceTable: String): DataFrame =
    df.withColumn("source_table", lit(sourceTable))
      .withColumn("processed_ts", current_timestamp())
}
