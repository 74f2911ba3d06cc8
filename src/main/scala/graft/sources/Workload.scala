package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** S5: the synthetic engagement workload generator, re-expressed as
  * column expressions over either a rate stream (streaming) or a range
  * (batch fixtures). Distribution shapes mirror the reference generator
  * (/root/reference/data-generator/generator.py:63–90) and the plpgsql
  * UDFs (sql/init.sql:77–105):
  *  - uniform content / user / event-type / device picks;
  *  - duration NULL for click, else shaped per event type as a fraction
  *    of content length (play 5–95%, pause 10–80%, finish 85–100%);
  *  - event_ts jittered up to 300 s into the past.
  *
  * Determinism: everything derives from the row's sequence number via
  * hash-mod (not rand()), so fixtures are reproducible and the stream
  * is replayable — at scale, a deterministic generator is also what
  * lets two runs shard the same workload identically.
  */
object Workload {

  private def pick(seq: org.apache.spark.sql.Column, salt: Int, options: Seq[String]) =
    element_at(array(options.map(lit): _*),
      (pmod(hash(seq, lit(salt)), lit(options.size)) + 1).cast("int"))

  private def frac(seq: org.apache.spark.sql.Column, salt: Int) =
    pmod(hash(seq, lit(salt)), lit(10000)).cast("double") / 10000.0

  val EventTypes: Seq[String] = Seq("play", "pause", "finish", "click")
  val Devices: Seq[String] = Seq("ios", "android", "web", "desktop")

  /** Derive the event columns from a sequence-number column `seq` and a
    * content dimension size. */
  def eventColumns(df: DataFrame, nContent: Int, nUsers: Int = 1000): DataFrame = {
    val seq = col("seq")
    val et = pick(seq, 1, EventTypes)
    val lengthS = (lit(180) + pmod(hash(seq, lit(2)), lit(5220))).cast("int") // 180–5400 s
    val durFrac = when(et === "play", lit(0.05) + frac(seq, 3) * 0.90)
      .when(et === "pause", lit(0.10) + frac(seq, 3) * 0.70)
      .when(et === "finish", lit(0.85) + frac(seq, 3) * 0.15)
    df.select(
      seq.cast("long").as("id"),
      concat(lit("content-"), pmod(hash(seq, lit(4)), lit(nContent)).cast(StringType)).as("content_id"),
      concat(lit("user-"), pmod(hash(seq, lit(5)), lit(nUsers)).cast(StringType)).as("user_id"),
      et.as("event_type"),
      (col("base_ts") - make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
        frac(seq, 6) * 300.0)).as("event_ts"),
      when(et =!= "click", (durFrac * lengthS * 1000).cast("long")).as("duration_ms"),
      pick(seq, 7, Devices).as("device"),
      to_json(struct(
        concat(lit("sess-"), pmod(hash(seq, lit(8)), lit(97)).cast(StringType)).as("session_id")))
        .as("raw_payload"))
  }

  /** Batch fixture: n deterministic events anchored at `anchorTs`. */
  def batch(spark: SparkSession, n: Long, nContent: Int = 15,
      anchorTs: String = "2024-01-01 12:00:00"): DataFrame =
    eventColumns(
      spark.range(n).select(col("id").as("seq"),
        lit(anchorTs).cast("timestamp").as("base_ts")),
      nContent)

  /** Streaming workload: rate source → event shape. rowsPerSecond is the
    * generation-rate knob (the reference's GENERATION_RATE). */
  def stream(spark: SparkSession, rowsPerSecond: Int, nContent: Int = 15): DataFrame =
    eventColumns(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load()
        .select(col("value").as("seq"), col("timestamp").as("base_ts")),
      nContent)

  /** Wrap generated events in the Debezium envelope JSON (what the
    * connector would emit), closing the loop into Envelope.unwrap*. */
  def asDebeziumJson(events: DataFrame): DataFrame =
    events.select(to_json(struct(struct(
      struct(
        col("id").cast(StringType).as("id"), col("content_id"), col("user_id"),
        col("event_type"),
        date_format(col("event_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("event_ts"),
        col("duration_ms"), col("device"), col("raw_payload")).as("after"),
      lit("c").as("op"),
      unix_millis(col("event_ts")).as("ts_ms")).as("payload"))).as("value"))
}
