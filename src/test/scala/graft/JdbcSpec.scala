package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.Jdbc
import graft.sources.Sources

/** K1/S3 against a REAL JDBC engine: embedded Apache Derby (in
  * /opt/spark/jars). These were the two "environment-blocked" partials
  * in rounds 4–6; Derby closes them offline — batched writes, typed
  * round-trips, partitioned parallel reads, and the streaming
  * foreachBatch append path all run against a live database here.
  */
class JdbcSpec extends SparkSpec {

  private def freshDb(tag: String) = s"graftspec_$tag"

  test("batch write + read round-trips rows and types exactly") {
    import spark.implicits._
    val db = freshDb("roundtrip")
    val url = Jdbc.derbyMemUrl(db)
    val df = Seq((1L, "movie", 7200L, 3.25), (2L, "series", 1800L, -0.5),
      (3L, "doc", 0L, 0.0)).toDF("id", "content_type", "length_seconds", "w")
    Jdbc.writeTable(df, url, "content", Some("content_type VARCHAR(32)"))
    val back = Jdbc.readTable(spark, url, "content")
    assert(back.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSet ===
      df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSet)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    Jdbc.dropDerbyMem(db)
  }

  test("partitioned read fans out into one range scan per partition, no row loss at the edges") {
    import spark.implicits._
    val db = freshDb("partread")
    val url = Jdbc.derbyMemUrl(db)
    // ids straddle the [lower, upper) bounds on both sides: Spark's
    // stride predicates must route out-of-range rows to edge partitions.
    val df = (-5L to 104L).map(i => (i, s"name_$i")).toDF("id", "name")
    Jdbc.writeTable(df, url, "dim", Some("name VARCHAR(32)"))
    val back = Sources.dimSnapshotJdbc(spark, url, "dim", Some(("id", 0L, 100L, 4)))
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 110)
    assert(back.agg(sum("id")).as[Long].head() === (-5L to 104L).sum)
    Jdbc.dropDerbyMem(db)
  }

  test("streaming foreachBatch appends micro-batches into the warehouse table") {
    import spark.implicits._
    val db = freshDb("stream")
    val url = Jdbc.derbyMemUrl(db)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("event_id", "event_type", "score")
      .writeStream
      .outputMode("append")
      .foreachBatch(Jdbc.streamWriter(url, "events_wh", Some("event_type VARCHAR(16)")))
      .start()
    try {
      in.addData((1L, "play", 1.0), (2L, "pause", 0.5))
      q.processAllAvailable()
      in.addData((3L, "finish", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val back = Jdbc.readTable(spark, url, "events_wh")
    assert(back.count() === 3)
    assert(back.agg(sum("score")).as[Double].head() === 4.5)
    Jdbc.dropDerbyMem(db)
  }

  test("JDBC read pushes filters and prunes columns down to the database") {
    import spark.implicits._
    val db = freshDb("pushdown")
    val url = Jdbc.derbyMemUrl(db)
    Jdbc.writeTable((1L to 100L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "name", "w"),
      url, "pushd", Some("name VARCHAR(16)"))
    val q = Jdbc.readTable(spark, url, "pushd").filter(col("id") > 50).select("name")
    val plan = q.queryExecution.executedPlan.toString()
    // the predicate must ship INTO the generated SQL (PushedFilters on
    // the JDBC scan), and only the referenced columns may be selected —
    // at scale this is the difference between the database streaming 50
    // narrow rows and the cluster dragging the whole table over JDBC
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      plan.take(1500))
    assert(!plan.toLowerCase.contains("w#"), "unreferenced column fetched:\n" + plan.take(1500))
    assert(q.count() === 50)
    Jdbc.dropDerbyMem(db)
  }

  test("enrichment join consumes a JDBC dimension snapshot (S3 path end-to-end)") {
    import spark.implicits._
    val db = freshDb("enrich")
    val url = Jdbc.derbyMemUrl(db)
    val dim = Seq((10L, "movie", 5400L), (11L, "clip", 90L))
      .toDF("id", "content_type", "length_seconds")
    Jdbc.writeTable(dim, url, "content", Some("content_type VARCHAR(32)"))
    val events = Seq((1L, 10L, 120.0), (2L, 11L, 30.0), (3L, 99L, 7.0))
      .toDF("event_id", "content_id", "engagement_seconds")
    val snap = Sources.dimSnapshotJdbc(spark, url, "content")
    val enriched = events.join(broadcast(snap), events("content_id") === snap("id"), "left")
      .select(col("event_id"), col("content_type"), col("length_seconds"))
    val rows = enriched.orderBy("event_id").collect()
    assert(rows.map(r => Option(r.get(1))).toSeq === Seq(Some("movie"), Some("clip"), None))
    Jdbc.dropDerbyMem(db)
  }
}
