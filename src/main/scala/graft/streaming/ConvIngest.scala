package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Conversations
import graft.sinks.SnapshotStore

/** Streaming CONVERSATION ingest — the SFT modality joins the
  * documents' streaming flagship ([[CorpusIngest.pipelineBatch]]):
  * each micro-batch of raw (conv_id, payload-JSON) conversations is
  * flattened, per-turn GATED and CLEANED (drop_conv/drop_turns
  * verdicts applied, PII redacted in place —
  * [[Conversations.clean]]), conversation-level EXACT-deduplicated on
  * the role-normalized cleaned transcript (within the batch AND
  * against everything already landed), NEAR-deduplicated against the
  * persisted MinHash band index, and landed exactly-once:
  *
  *  - `base`     — the seen REGISTRY: (conv_id, fp, text) of every
  *                 exact-new cleaned conversation (the anti-join side
  *                 of future batches' exact dedup — 16-char digests,
  *                 never transcripts, move through that join);
  *  - `turnsBase`— the cleaned TURNS of those conversations (the
  *                 training-data payload a reader consumes);
  *  - `pairsBase`— near-dup EVICTION records (evicted, kept_twin,
  *                 jaccard) — an append-only stream cannot
  *                 retro-delete, so the serve-time readout anti-joins
  *                 them (the CorpusIngest lightweight-delete pattern);
  *  - `mvBase`   — one additive monitor row per batch
  *                 (conversations in / surviving clean / exact-new /
  *                 evicted, landed turns) in a SummingStore MV.
  *
  * Delivery contract: at-least-once foreachBatch × idempotent tagged
  * commits (`conv-$batchId` / `cturns-$batchId` / `cevict-$batchId` /
  * `cmv-$batchId`) = exactly-once landing under replays — the
  * identical discipline to CorpusIngest, re-tested for this flow in
  * StreamingSpec.
  *
  * CRASH-ATOMIC across the multi-store landing: the four commits are
  * sequential, so a crash can strand the batch between them. Landed
  * registry rows are therefore STAMPED with `batch_id`, and a replay
  * that finds the registry tag already committed RECOVERS `fresh` by
  * reading the registry's own batch slice back instead of recomputing
  * it — the recompute would anti-join against a registry that already
  * contains this batch's fingerprints, collapse `fresh` to ∅, and
  * commit an EMPTY turns/evictions/monitor landing under their tags,
  * silently losing the batch's payload forever. With read-back
  * recovery every downstream relation is rebuilt from the exact rows
  * attempt 1 landed, the already-present tags no-op, and the missing
  * ones land the identical frames — exactly-once for every store no
  * matter where the prior attempt died (the index side is
  * [[graft.dedup.MinHashIndex.processBatch]]'s replay-exact
  * contract). StreamingSpec's failure-injection matrix kills the
  * batch after EACH commit and asserts the replayed state is
  * bit-equal to a never-crashed run.
  *
  * Batch parity: under conv_id-monotone arrival (whole conversations
  * per batch — the stream contract) the streamed build is bit-equal
  * to one batch pass, so the registered q_conv_pipeline_stream replays
  * the 3-batch build against ONE DuckDB batch oracle
  * (clean → transcript → exact keep → MinHash chain → serve → render
  * → loss-mask pack, every CTE the batch gates already use).
  *
  * Scale posture: composition adds no corpus-scale work — flatten and
  * clean are the batch operators (per-row parse + one hash aggregate +
  * one corpus-side join), exact dedup moves digests, the index probe
  * touches only this batch's band buckets, the monitor delta is one
  * aggregate of the batch.
  */
object ConvIngest {

  /** Test-only fault injection: name of the commit AFTER which the
    * batch "crashes" (StreamingSpec's failure-injection matrix). Never
    * set outside tests. Sites: "index", "registry", "turns",
    * "evictions". */
  private[graft] var crashAfter: Option[String] = None
  private[graft] def failpoint(site: String): Unit =
    if (crashAfter.contains(site))
      throw new RuntimeException(s"injected crash after $site commit")

  /** Land one micro-batch of (conv_id, payload) conversations.
    * Crash-atomic under replays — see the class doc's read-back
    * recovery contract. */
  def pipelineBatch(spark: SparkSession, base: String, turnsBase: String,
      indexBase: String, pairsBase: String, mvBase: String,
      batch: DataFrame, batchId: Long): Unit = {
    val turns = Conversations.flatten(batch, col("conv_id"), col("payload"))
    // monitor "conversations in" = DISTINCT arriving conv_ids that
    // flatten to ≥1 turn — the exact population the batch oracle's m1
    // counts, so a duplicate conv_id row or an unparseable payload in
    // a batch cannot desync the MV from the gate
    val nIn = turns.select(col("conv_id")).distinct().count()
    // gate verdicts applied: drop_conv conversations vanish here (zero
    // turns survive), so "survives clean" IS the stream's gate count.
    // persist(DISK_ONLY), not localCheckpoint: lineage stays intact,
    // so a lost executor recomputes its blocks (store reads pin their
    // file lists at read() time — the later appends add files the
    // bound plans never see) instead of stranding the batch on
    // non-replicated local blocks
    val cleaned = Conversations.clean(turns)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val regTag = s"conv-$batchId"
    val ctext = Conversations.convText(cleaned)
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
    val fresh = (if (SnapshotStore.hasTag(spark, base, regTag)) {
      // READ-BACK RECOVERY: a prior attempt already committed this
      // batch's registry rows, so the anti-join recompute would see
      // its own fingerprints and collapse to ∅ — rebuild `fresh` from
      // the registry's batch_id slice instead (bit-equal to what
      // attempt 1 landed)
      SnapshotStore.read(spark, base).get.filter(col("batch_id") === batchId)
    } else {
      // in-batch exact collapse (min conv_id per fingerprint; the
      // window is batch-sized) + anti-join against the landed registry
      // — digests only, the transcript text never rides the join key
      val w = Window.partitionBy(col("fp")).orderBy(col("conv_id"))
      val inBatch = ctext.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      (SnapshotStore.read(spark, base) match {
        case Some(existing) => inBatch.join(
          existing.select(col("fp").as("__efp")),
          col("fp") === col("__efp"), "left_anti")
        case None => inBatch
      }).withColumn("batch_id", lit(batchId))
    }).persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      // near-dup vs the persisted band index (incremental: only this
      // batch's band buckets are touched); doc_b is the evicted side.
      // processBatch is replay-exact and returns an eagerly-
      // materialized frame
      val pairs = graft.dedup.MinHashIndex.processBatch(spark, indexBase,
        fresh, col("conv_id"), col("text"), tag = s"cpipe-$batchId")
      failpoint("index")
      SnapshotStore.commitAppend(spark, base, fresh, tag = Some(regTag))
      failpoint("registry")
      val freshTurns = cleaned.join(
        fresh.select(col("conv_id")), Seq("conv_id"), "left_semi")
      SnapshotStore.commitAppend(spark, turnsBase, freshTurns,
        tag = Some(s"cturns-$batchId"))
      failpoint("turns")
      SnapshotStore.commitAppend(spark, pairsBase,
        pairs.select(col("doc_b").as("evicted"), col("doc_a").as("kept_twin"),
          col("jaccard")),
        tag = Some(s"cevict-$batchId"))
      failpoint("evictions")
      val delta = spark.range(1).select(lit(batchId).as("batch_id"),
        lit(nIn).as("n_in"),
        lit(ctext.count()).as("n_cleaned"),
        lit(fresh.count()).as("n_fresh"),
        lit(pairs.count()).as("n_evicted"),
        lit(freshTurns.count()).as("turns_fresh"))
      graft.sinks.SummingStore.appendDelta(delta, mvBase,
        tag = Some(s"cmv-$batchId"))
    } finally {
      fresh.unpersist()
      cleaned.unpersist()
    }
  }

  /** Serve-time readout: the cleaned turns of every landed
    * conversation minus the evicted ones — the training-ready
    * transcript relation ([[Conversations.render]]'s input). */
  def servedTurns(spark: SparkSession, turnsBase: String,
      pairsBase: String): DataFrame = {
    val turns = SnapshotStore.read(spark, turnsBase)
      .getOrElse(sys.error(s"empty conversation store at $turnsBase"))
    SnapshotStore.read(spark, pairsBase) match {
      case Some(ev) => turns.join(
        ev.select(col("evicted").as("conv_id")).distinct(),
        Seq("conv_id"), "left_anti")
      case None => turns
    }
  }
}
