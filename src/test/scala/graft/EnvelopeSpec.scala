package graft

import graft.cdc.Envelope
import graft.dim.ContentDim
import graft.enrich.Enrich

/** Envelope unwrap (P1/P3/P4), dim folding (J1 state), and left-join
  * enrichment semantics, on hand-written Debezium-shaped fixtures
  * (shapes per FIXTURES.md §3 / the reference connector config). */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val envelopedPlay =
    """{"payload":{"after":{"id":"42","content_id":"c1","user_id":"u1","event_type":"play","event_ts":"2024-01-01T10:00:00.000000","duration_ms":45000,"device":"ios","raw_payload":"{\"s\":1}"},"op":"c","ts_ms":100}}"""
  private val flatClick =
    """{"id":"43","content_id":"c9","user_id":"u2","event_type":"click","event_ts":"2024-01-01T10:00:01","device":"web"}"""
  private val malformed = """{"#$%^ not json"""

  test("engagement unwrap: enveloped + flattened accepted, malformed dropped") {
    val out = Envelope.unwrapEngagement(
      Seq(envelopedPlay, flatClick, malformed).toDF("value"))
      .orderBy("event_id").collect()
    assert(out.length === 2)
    val r42 = out(0)
    assert(r42.getAs[Long]("event_id") === 42L)
    assert(r42.getAs[String]("content_id") === "c1")
    assert(r42.getAs[Long]("duration_ms") === 45000L)
    assert(r42.getAs[String]("platform") === "ios")
    assert(r42.getAs[java.sql.Timestamp]("event_ts").toString === "2024-01-01 10:00:00.0")
    val r43 = out(1)
    assert(r43.getAs[Long]("event_id") === 43L)
    assert(r43.isNullAt(r43.fieldIndex("duration_ms"))) // click: no duration
  }

  private def contentUpsert(id: String, ctype: String, len: Int, seq: Long) =
    s"""{"payload":{"after":{"id":"$id","slug":"s-$id","title":"T $id","content_type":"$ctype","length_seconds":$len,"publish_ts":"2024-01-01T00:00:00"},"op":"u","ts_ms":$seq}}"""
  private def contentDelete(id: String, seq: Long) =
    s"""{"payload":{"before":{"id":"$id"},"after":null,"op":"d","ts_ms":$seq}}"""

  test("content unwrap: upserts, delete tombstones, flat rows; no-id rows dropped") {
    val out = Envelope.unwrapContent(Seq(
      contentUpsert("c1", "podcast", 300, 1),
      contentDelete("c2", 2),
      """{"id":"c3","slug":"s3","title":"T3","content_type":"video","length_seconds":120,"publish_ts":"2024-01-01T00:00:00"}""",
      malformed).toDF("value")).orderBy("id").collect()
    assert(out.map(_.getAs[String]("id")).toSeq === Seq("c1", "c2", "c3"))
    assert(out.map(_.getAs[Boolean]("is_delete")).toSeq === Seq(false, true, false))
    assert(out(2).getAs[Int]("length_seconds") === 120)
  }

  test("dim latest-state: newest change wins, deletes remove the key") {
    val changes = Envelope.unwrapContent(Seq(
      contentUpsert("c1", "podcast", 300, 1),
      contentUpsert("c1", "podcast", 360, 5), // newer upsert wins
      contentUpsert("c2", "video", 100, 1),
      contentDelete("c2", 2),                 // delete after upsert → gone
      contentDelete("c3", 1),
      contentUpsert("c3", "newsletter", 50, 2) // upsert after delete → back
    ).toDF("value"))
    val dim = ContentDim.latestState(changes).orderBy("id").collect()
    assert(dim.map(_.getAs[String]("id")).toSeq === Seq("c1", "c3"))
    assert(dim(0).getAs[Int]("length_seconds") === 360)
  }

  test("dim merge: upserts replace, deletes remove, untouched rows carry over") {
    val snap = ContentDim.latestState(Envelope.unwrapContent(Seq(
      contentUpsert("c0", "podcast", 10, 1),
      contentUpsert("c1", "video", 20, 1)).toDF("value")))
    val changes = Envelope.unwrapContent(Seq(
      contentDelete("c1", 2),
      contentUpsert("c2", "newsletter", 30, 2)).toDF("value"))
    val merged = ContentDim.merge(snap, changes).orderBy("id").collect()
    assert(merged.map(_.getAs[String]("id")).toSeq === Seq("c0", "c2"))
  }

  test("enriched output projects onto the declared 13-field schema, session_id extracted") {
    val events = Envelope.unwrapEngagement(Seq(envelopedPlay).toDF("value"))
    val dim = ContentDim.latestState(Envelope.unwrapContent(
      Seq(contentUpsert("c1", "podcast", 300, 1)).toDF("value")))
    val out = Schemas.toEnrichedEvent(Enrich.enrich(events, dim))
    assert(out.schema.fieldNames.toSeq === Schemas.enrichedEvent.fieldNames.toSeq)
    val row = out.head
    assert(row.getAs[String]("session_id") === null) // raw_payload {"s":1} has no session_id
    val withSess = Envelope.unwrapEngagement(Seq(
      envelopedPlay.replace("{\\\"s\\\":1}", "{\\\"session_id\\\":\\\"sess-9\\\"}"))
      .toDF("value"))
    val r2 = Schemas.toEnrichedEvent(Enrich.enrich(withSess, dim)).head
    assert(r2.getAs[String]("session_id") === "sess-9")
  }

  test("enrichment is left-outer: unknown content passes through with null dims but a score") {
    val events = Envelope.unwrapEngagement(Seq(envelopedPlay, flatClick).toDF("value"))
    val dim = ContentDim.latestState(Envelope.unwrapContent(
      Seq(contentUpsert("c1", "podcast", 300, 1)).toDF("value")))
    val out = Enrich.enrich(events, dim).orderBy("event_id").collect()
    assert(out.length === 2) // row count preserved (left join)
    val hit = out(0)
    assert(hit.getAs[String]("content_type") === "podcast")
    assert(hit.getAs[Double]("engagement_pct") === 15.0) // 45s of 300s
    assert(hit.getAs[Double]("engagement_score") === 2.5) // play, ln(46) capped
    val miss = out(1)
    assert(miss.isNullAt(miss.fieldIndex("content_type")))
    assert(miss.isNullAt(miss.fieldIndex("engagement_pct")))
    assert(miss.getAs[Double]("engagement_score") === 0.2) // click, no duration
  }
}
