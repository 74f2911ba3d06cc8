package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Engagement

/** The enrichment join (SURVEY.md J1) + derived columns (P5–P7): the
  * reference's BroadcastContentEnricher re-expressed as a broadcast
  * LEFT join against the dimension snapshot.
  *
  * Left-outer semantics match the reference exactly: an event whose
  * content_id is unknown (or deleted) passes through with null
  * content_type/length_seconds — and therefore null engagement_pct —
  * but still gets its score (the score formula only needs event_type
  * and duration, reference :286–307).
  *
  * Scale posture: the dim side is explicitly `broadcast()` — the fact
  * stream never shuffles for this join, which is what makes the hot
  * path a single stage end-to-end at any fact volume.
  */
object Enrich {

  /** events: unwrapEngagement output; dim: columns (id, content_type,
    * length_seconds, …). Output adds content_type, length_seconds,
    * engagement_seconds, engagement_pct, engagement_score. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame = {
    val d = dim.select(col("id").as("__dim_id"),
      col("content_type"), col("length_seconds"))
    events.join(broadcast(d), events("content_id") === col("__dim_id"), "left")
      .drop("__dim_id")
      .withColumn("engagement_seconds",
        Engagement.engagementSeconds(col("duration_ms")))
      .withColumn("engagement_pct",
        Engagement.engagementPct(col("duration_ms"), col("length_seconds")))
      .withColumn("engagement_score",
        Engagement.engagementScore(col("event_type"), col("duration_ms")))
  }

  /** K3: serialize enriched rows to the outbox JSON shape (null fields
    * omitted, like the reference's Jackson NON_NULL mapper :366–381). */
  def toOutboxJson(enriched: DataFrame): DataFrame =
    enriched.select(to_json(struct(enriched.columns.map(col): _*)).as("value"))
}
