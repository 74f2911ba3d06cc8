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

  /** Enveloped-or-flat record extraction: payload.after when the
    * envelope parsed, else the root parsed as a bare record (the
    * connector's ExtractNewRecordState unwrap may already have
    * flattened it — the reference handles both, :164–168). */
  private def afterOrRoot(value: Column, record: StructType): Column = {
    val env = from_json(value, envelopeSchema(record))
    val flat = from_json(value, record)
    when(env("payload").isNotNull && env("payload")("after").isNotNull, env("payload")("after"))
      .otherwise(flat)
  }

  /** P1+P2+P8: unwrap an engagement-events CDC stream. Input: a
    * DataFrame with a string `value` column (Kafka value). Output
    * columns: event_id (normalized long), user_id, content_id,
    * event_type, platform, duration_ms, event_ts (parsed), raw_payload.
    * Rows that fail to yield an id are dropped (P4/F2). */
  def unwrapEngagement(raw: DataFrame): DataFrame = {
    val value = col("value").cast(StringType)
    // The id-presence drop (F2/P4) is probed with get_json_object BEFORE
    // the full parse: it is equivalent (event_id is null exactly when
    // neither envelope nor flat shape carries an id, or the JSON is
    // malformed — get_json_object returns null in every such case), and
    // it keeps Catalyst's filter pushdown from duplicating the whole
    // to_json/from_json chain into the pushed-down Filter condition.
    val idProbe = coalesce(
      get_json_object(value, "$.payload.after.id"),
      get_json_object(value, "$.id"))
    val rec = afterOrRoot(value, engagementRecordSchema)
    raw.filter(idProbe.isNotNull)
      .select(rec.as("r"))
      .select(
        Engagement.normalizeEventId(col("r.id")).as("event_id"),
        col("r.user_id").as("user_id"),
        col("r.content_id").as("content_id"),
        col("r.event_type").as("event_type"),
        col("r.device").as("platform"),
        col("r.duration_ms").as("duration_ms"),
        Engagement.parseTimestampMulti(col("r.event_ts")).as("event_ts"),
        col("r.raw_payload").as("raw_payload"))
  }

  /** P3: unwrap a content CDC stream including delete tombstones. Takes
    * payload.after for upserts; for op in {d, D} with null after, emits
    * a tombstone from payload.before.id (reference :244–276). Output:
    * id, slug, title, content_type, length_seconds, publish_ts,
    * is_delete, change_seq (source ts_ms for LWW ordering). Rows with
    * no id are dropped (F3). */
  def unwrapContent(raw: DataFrame): DataFrame = {
    val value = col("value").cast(StringType)
    val env = from_json(value, envelopeSchema(contentRecordSchema))
    val flat = from_json(value, contentRecordSchema)
    val hasAfter = env("payload").isNotNull && env("payload")("after").isNotNull
    val isDelete = env("payload").isNotNull &&
      env("payload")("after").isNull && upper(env("payload")("op")) === "D"
    raw.select(
        when(hasAfter, env("payload")("after")("id"))
          .when(isDelete, env("payload")("before")("id"))
          .otherwise(flat("id")).as("id"),
        when(hasAfter, env("payload")("after")("slug")).otherwise(flat("slug")).as("slug"),
        when(hasAfter, env("payload")("after")("title")).otherwise(flat("title")).as("title"),
        when(hasAfter, env("payload")("after")("content_type"))
          .otherwise(flat("content_type")).as("content_type"),
        when(hasAfter, env("payload")("after")("length_seconds"))
          .otherwise(flat("length_seconds")).as("length_seconds"),
        when(hasAfter, env("payload")("after")("publish_ts"))
          .otherwise(flat("publish_ts")).as("publish_ts"),
        coalesce(isDelete, lit(false)).as("is_delete"),
        coalesce(env("payload")("ts_ms"), lit(0L)).as("change_seq"))
      .filter(col("id").isNotNull)
  }

  /** P10: connector-style metadata injection. */
  def withIngestMetadata(df: DataFrame, sourceTable: String): DataFrame =
    df.withColumn("source_table", lit(sourceTable))
      .withColumn("processed_ts", current_timestamp())
}
