package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** Incremental MinHash-LSH near-duplicate index: the ingest-time
  * counterpart of the batch [[MinHash.verifiedPairs]] pass. The band
  * table and the shingle sets persist in [[SnapshotStore]] tables;
  * each arriving doc batch
  *
  *  1. computes its signatures/bands (a pure map, batch-sized);
  *  2. pulls ONLY the stored band buckets the batch touches (a
  *     semi-join on the batch's distinct band keys — per-batch work is
  *     proportional to touched buckets, never the index);
  *  3. generates candidates over (touched stored ∪ new) bands with the
  *     exact batch cap/star semantics, keeping pairs that involve at
  *     least one new doc (old-old pairs were emitted when THEIR later
  *     doc arrived);
  *  4. verifies exact Jaccard against the stored+new shingle sets;
  *  5. appends its bands and shingle sets, idempotent under replay via
  *     the SnapshotStore dedupe tag.
  *
  * Equivalence contract (MinHashIndexSpec asserts it): as long as no
  * band bucket exceeds cfg.maxBandBucket, the UNION of processBatch
  * outputs over ANY batch decomposition of a corpus equals the batch
  * [[MinHash.verifiedPairs]] of the whole corpus, each pair emitted
  * exactly once — when its later doc arrives. When a bucket does
  * exceed the cap, the star-degrade applies at arrival time (new
  * members pair with the bucket's min), which preserves the batch
  * mode's connectivity-through-hub guarantee but not pair-for-pair
  * equality — same trade the batch cap itself makes.
  */
object MinHashIndex {

  private def bandsBase(indexBase: String) = s"$indexBase/bands"
  private def shinglesBase(indexBase: String) = s"$indexBase/shingles"

  /** Process one doc batch: returns the verified near-dup pairs
    * involving this batch's docs (materialized eagerly — the result
    * must not lazily re-read stores the append below then grows), and
    * appends the batch to the index.
    *
    * REPLAY-EXACT: each append probes its own idempotence tag, and
    * when the tag is already committed (a replay after a crash
    * downstream of this call) the stored index ALREADY holds this
    * batch's bands/shingles — so the probe uses the stored side alone
    * instead of unioning the recomputed batch in a second time.
    * Without that, the duplicated band rows could push a bucket past
    * cfg.maxBandBucket on the replay only, flipping it into the
    * star-degrade and changing the pair set vs the original attempt.
    * With it, a replay of the same (batch, tag) returns bit-identical
    * pairs no matter where the prior attempt died. */
  def processBatch(spark: SparkSession, indexBase: String, batch: DataFrame,
      id: Column, text: Column, tag: String,
      cfg: MinHash.Config = MinHash.Config()): DataFrame = {
    val sigs = MinHash.signatures(batch, id, text, cfg).cache()
    val newBands = MinHash.bandsOf(sigs, cfg)
    val newSets = sigs.select(col("doc_id"), col("sh"))
    val touched = newBands.select(col("band_idx"), col("band_key")).distinct()
    val bandsIn = SnapshotStore.hasTag(spark, bandsBase(indexBase), s"bands-$tag")
    val setsIn = SnapshotStore.hasTag(spark, shinglesBase(indexBase), s"shingles-$tag")
    val storedBands = SnapshotStore.read(spark, bandsBase(indexBase))
      .map(_.join(touched, Seq("band_idx", "band_key"), "left_semi"))
    val allBands = storedBands match {
      case Some(sb) if bandsIn => sb // store already holds this batch
      case Some(sb) => sb.unionByName(newBands)
      case None => newBands
    }
    val storedSets = SnapshotStore.read(spark, shinglesBase(indexBase))
    val allSets = storedSets match {
      case Some(ss) if setsIn => ss // store already holds this batch
      case Some(ss) => ss.unionByName(newSets)
      case None => newSets
    }
    val newIds = sigs.select(col("doc_id").as("__nid"))
    val cands = MinHash.candidatePairsFromBands(allBands, cfg)
    val withNew = cands
      .join(newIds, col("doc_a") === col("__nid"), "left_semi")
      .union(cands.join(newIds, col("doc_b") === col("__nid"), "left_semi"))
      .distinct()
    val verified = MinHash.verify(withNew, allSets, cfg).localCheckpoint(true)
    SnapshotStore.commitAppend(spark, bandsBase(indexBase), newBands,
      tag = Some(s"bands-$tag"))
    SnapshotStore.commitAppend(spark, shinglesBase(indexBase), newSets,
      tag = Some(s"shingles-$tag"))
    sigs.unpersist()
    verified
  }

  /** Catch the index up with an append-only corpus SnapshotStore,
    * exactly-once per corpus commit ([[SnapshotStore.processNew]]),
    * returning the verified pairs of every newly-indexed commit
    * unioned (empty frame if already current). */
  def maintain(spark: SparkSession, corpusBase: String, indexBase: String,
      id: String = "doc_id", text: String = "text",
      cfg: MinHash.Config = MinHash.Config()): Option[(Long, DataFrame)] = {
    var out: Option[DataFrame] = None
    SnapshotStore.processNew(spark, corpusBase, s"$indexBase/_corpus_ck") {
      (df, v) =>
        val pairs = processBatch(spark, indexBase, df, col(id), col(text),
          s"v$v", cfg)
        out = Some(out.map(_.unionByName(pairs)).getOrElse(pairs))
    }.map(v => (v, out.getOrElse(
      spark.emptyDataFrame.select(lit(0L).as("doc_a"), lit(0L).as("doc_b"),
        lit(0.0).as("jaccard")).limit(0))))
  }
}
