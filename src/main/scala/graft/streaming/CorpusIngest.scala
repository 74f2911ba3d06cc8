package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sinks.SnapshotStore

/** Incremental corpus build as a streaming pipeline: each micro-batch
  * of raw documents is quality-gated, exact-deduplicated (within the
  * batch AND against everything already landed), and appended to a
  * [[SnapshotStore]] table exactly-once — the LLM-data analog of the
  * reference's CDC-to-warehouse hot path, with the same delivery
  * contract (at-least-once foreachBatch × idempotent tagged commit =
  * exactly-once landing).
  *
  * Scale posture: the quality gate and fingerprint are per-row maps;
  * in-batch dedup windows on the fingerprint (batch-sized, not
  * corpus-sized); the against-the-store dedup is a left-anti join on
  * the slim fingerprint column only — at warehouse scale that is the
  * one join to co-bucket (or guard with a bloom filter), and it never
  * moves document text, just 16-char digests.
  */
object CorpusIngest {

  /** Land one micro-batch. `batch` must carry (doc_id, text, …); rows
    * below `minQuality` drop, byte-identical texts collapse to the min
    * doc_id, texts already in the store are skipped, and the append is
    * idempotent under replays of the same `batchId`. */
  def ingestBatch(spark: SparkSession, base: String, batch: DataFrame,
      batchId: Long, minQuality: Double = 0.2): Unit = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val inBatch = batch
      .filter(TextFunctions.qualityScore(col("text")) >= minQuality)
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fresh = SnapshotStore.read(spark, base) match {
      case Some(existing) =>
        inBatch.join(existing.select(col("fp").as("__efp")),
          col("fp") === col("__efp"), "left_anti")
      case None => inBatch
    }
    SnapshotStore.commitAppend(spark, base, fresh, tag = Some(s"ingest-$batchId"))
  }
}
