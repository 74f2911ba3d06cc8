package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Engagement

/** Golden-value tests for the engagement scalar derivations (P5–P8, P2),
  * expected values hand-computed from the reference formulas
  * (EnhancedEngagementStreamingJob.java:292–337, 521–529, 206–233). */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def scoreOf(eventType: String, durationMs: java.lang.Long): Option[Double] = {
    val df = Seq((eventType, durationMs)).toDF("et", "d")
    Option(df.select(Engagement.engagementScore(col("et"), col("d"))).head.get(0))
      .map(_.asInstanceOf[Double])
  }

  test("score: finish with 1,800,000 ms hits the 2.5 cap → 7.5") {
    assert(scoreOf("finish", 1800000L) === Some(7.5))
  }

  test("score: click with null duration → bare base 0.2") {
    assert(scoreOf("click", null) === Some(0.2))
  }

  test("score: play with 0 duration → factor 1.0 → 1.0") {
    assert(scoreOf("play", 0L) === Some(1.0))
  }

  test("score: pause 7389 ms → 0.5 * ln(8.389) rounded half-up") {
    val expected = BigDecimal(0.5 * math.min(2.5, math.log(7389 / 1000.0 + 1)))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scoreOf("pause", 7389L) === Some(expected))
  }

  test("score: negative duration → factor 1.0 (not ln of a negative)") {
    assert(scoreOf("play", -500L) === Some(1.0))
  }

  test("score: case-insensitive event types; unknown type → base 1.0") {
    assert(scoreOf("FINISH", 1800000L) === Some(7.5))
    assert(scoreOf("purchase", null) === Some(1.0))
  }

  test("pct: 45,000 ms of 300 s → 15.0; null-through on bad length") {
    val df = Seq(
      (1L, java.lang.Long.valueOf(45000L), Integer.valueOf(300)),
      (2L, java.lang.Long.valueOf(45000L), Integer.valueOf(0)),
      (3L, null.asInstanceOf[java.lang.Long], Integer.valueOf(300)),
      (4L, java.lang.Long.valueOf(45000L), null.asInstanceOf[Integer]))
      .toDF("id", "d", "len")
    val out = df.select(col("id"), Engagement.engagementPct(col("d"), col("len")))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === Some(15.0))
    assert(out(2L) === None)
    assert(out(3L) === None)
    assert(out(4L) === None)
  }

  test("seconds: millis over 1000.0, null-through") {
    val df = Seq(Tuple1(java.lang.Long.valueOf(1500L)), Tuple1(null.asInstanceOf[java.lang.Long]))
      .toDF("d")
    val out = df.select(Engagement.engagementSeconds(col("d"))).collect()
    assert(out(0).getDouble(0) === 1.5)
    assert(out(1).isNullAt(0))
  }

  test("event-id normalization: numeric parses; non-numeric falls back to abs(hash)") {
    val df = Seq("12345", "evt-abc", null).toDF("id")
    val out = df.select(Engagement.normalizeEventId(col("id"))).collect()
    assert(out(0).getLong(0) === 12345L)
    assert(out(1).getLong(0) >= 0L) // hash fallback, non-null and non-negative
    assert(out(2).isNullAt(0))      // null id stays null (dropped upstream)
    // deterministic across evaluations
    val again = df.select(Engagement.normalizeEventId(col("id"))).collect()
    assert(out(1).getLong(0) === again(1).getLong(0))
  }

  test("multi-format timestamp parse: all reference formats + micros epoch") {
    val cases = Seq(
      "2024-01-01T10:00:00.123456+02:00" -> "2024-01-01 08:00:00.123456",
      "2024-01-01T10:00:00Z"             -> "2024-01-01 10:00:00",
      "2024-01-01T10:00:00.123456"       -> "2024-01-01 10:00:00.123456",
      "2024-01-01T10:00:00.123"          -> "2024-01-01 10:00:00.123",
      "2024-01-01T10:00:00"              -> "2024-01-01 10:00:00",
      "2024-01-01 10:00:00"              -> "2024-01-01 10:00:00",
      "1700000000000000"                 -> "2023-11-14 22:13:20",
      "not-a-timestamp"                  -> null)
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), Engagement.parseTimestampMulti(col("s")).cast("string").as("p"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"for input $in")
    }
  }

  test("graft_score SQL UDF is bit-identical to the Column form and inlines (no JVM UDF)") {
    import spark.implicits._
    Engagement.registerScoreSqlUdf(spark)
    val df = Seq(("play", 45000.0), ("pause", 45000.0), ("finish", 1800000.0),
      ("click", 0.0), ("view", -5.0), ("PLAY", 999999.0), ("other", 1.0))
      .toDF("event_type", "duration_ms")
    df.createOrReplaceTempView("score_probe")
    val viaSql = spark.sql(
      "SELECT event_type, duration_ms, graft_score(event_type, duration_ms) AS s FROM score_probe")
    val viaCol = df.select(col("event_type"), col("duration_ms"),
      Engagement.engagementScore(col("event_type"), col("duration_ms")).as("s"))
    assert(viaSql.collect().map(_.getDouble(2)).toSeq ===
      viaCol.collect().map(_.getDouble(2)).toSeq)
    // the SQL UDF must inline: the physical plan has no ScalaUDF /
    // BatchEvalPython — just the expression
    val plan = viaSql.queryExecution.executedPlan.toString()
    assert(!plan.contains("UDF"), plan.take(1000))
  }
}
