package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection over a text column:
  * shingle → per-permutation min-hash signature → banded bucket join →
  * exact-Jaccard verification of candidates.
  *
  * Scale design:
  *  - the signature is a pure map (higher-order array expressions, no
  *    explode, no shuffle): each doc computes numPerms × |shingles|
  *    portable md5-derived hashes in one codegen'd projection;
  *  - the only shuffles are (band_key → docs) for candidate generation
  *    and the two slim joins that fetch shingle sets for verification —
  *    both proportional to candidate volume, not corpus size;
  *  - hashes are md5-prefix-derived (TextFunctions.md5Long) so an
  *    external oracle can reproduce signatures bit-for-bit.
  */
object MinHash {

  /** hashFamily:
    *  - "md5": portable md5-prefix hashing — bit-reproducible in DuckDB,
    *    used wherever an oracle must replicate signatures;
    *  - "xx": xxhash64 with the permutation as seed — ~4× faster (no
    *    string concat, no hex decode), the production default for a
    *    100 TB dedup pass where no external oracle replays the hashes.
    */
  final case class Config(
      numPerms: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.7,
      hashFamily: String = "md5",
      maxBandBucket: Int = 256) {
    def rowsPerBand: Int = numPerms / bands
    require(numPerms % bands == 0, "bands must divide numPerms")
    require(hashFamily == "md5" || hashFamily == "xx", "hashFamily in {md5, xx}")
    require(maxBandBucket > 1, "maxBandBucket must allow at least a pair")
  }

  /** Per-permutation hash of one shingle. */
  private def permHash(perm: Column, shingle: Column, cfg: Config): Column =
    if (cfg.hashFamily == "xx") xxhash64(perm, shingle)
    else TextFunctions.md5Long(concat(perm.cast(StringType), lit(":"), shingle))

  /** doc_id, sh (distinct shingles), signature (array of numPerms mins). */
  def signatures(docs: DataFrame, id: Column, text: Column, cfg: Config = Config()): DataFrame =
    docs.select(id.as("doc_id"), TextFunctions.shingles(text, cfg.shingleSize).as("sh"))
      .withColumn("signature",
        transform(sequence(lit(0), lit(cfg.numPerms - 1)),
          j => array_min(transform(col("sh"), s => permHash(j, s, cfg)))))

  /** Banded bucket keys: md5 of each signature slice. */
  private def bandKeys(cfg: Config): Column =
    transform(sequence(lit(0), lit(cfg.bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(col("signature"), b * lit(cfg.rowsPerBand) + 1, lit(cfg.rowsPerBand)),
          x => x.cast(StringType)))))

  /** Distinct candidate pairs (doc_a < doc_b) sharing any band bucket.
    *
    * Skew guard (default ON): band buckets holding more than
    * cfg.maxBandBucket docs do NOT enter the all-pairs self-join —
    * otherwise one thousand-way cluster of identical documents (the
    * classic crawl pathology) contributes O(n²) pairs and pins a single
    * reducer. Oversized buckets instead degrade to a STAR: every member
    * pairs with the bucket's min doc_id — O(n) pairs per bucket — so a
    * >cap family of near-identical-but-NOT-byte-identical documents
    * (boilerplate/template crawl families, which exact dedup cannot
    * collapse) stays connected through its hub and the downstream
    * connected-components grouping still merges it. Nothing is silently
    * dropped; audit which buckets degraded via [[oversizedBuckets]].
    * The size/min window shuffles on the same (band_idx, band_key) the
    * join hashes on, so AQE reuses the partitioning — the guard adds no
    * extra exchange of the bands. */
  def candidatePairs(sigs: DataFrame, cfg: Config = Config()): DataFrame =
    candidatePairsFromBands(bandsOf(sigs, cfg), cfg)

  /** Exploded band rows (doc_id, band_idx, band_key) for a signature
    * frame — the persistable unit of the incremental index. */
  def bandsOf(sigs: DataFrame, cfg: Config = Config()): DataFrame =
    sigs.select(col("doc_id"), posexplode(bandKeys(cfg)).as(Seq("band_idx", "band_key")))

  /** [[candidatePairs]] over an already-exploded band relation (same
    * semantics, cap and star-degrade included). */
  def candidatePairsFromBands(bands: DataFrame, cfg: Config = Config()): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_key")
    val stats = bands
      .withColumn("__bsz", count(lit(1)).over(w))
      .withColumn("__bmin", min(col("doc_id")).over(w))
    val capped = stats.filter(col("__bsz") <= cfg.maxBandBucket)
      .drop("__bsz", "__bmin")
    // merge-hinted: both sides are corpus×bands-sized, but Catalyst's
    // static estimate through the window+filter chain undercounts and
    // picks a broadcast — measured 100+ MB shipped through the driver
    // at a 200k-doc probe, i.e. a driver OOM at real scale. The hint
    // pins the scale-safe sort-merge shape.
    val allPairs = capped.as("a").join(capped.as("b").hint("merge"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val star = stats
      .filter(col("__bsz") > cfg.maxBandBucket && col("doc_id") =!= col("__bmin"))
      .select(col("__bmin").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.union(star).distinct()
  }

  /** Audit surface for the candidate-join skew guard: the band buckets
    * the cap degraded to star connectivity, with their sizes. Empty on
    * a healthy corpus. */
  def oversizedBuckets(sigs: DataFrame, cfg: Config = Config()): DataFrame =
    sigs.select(col("doc_id"), posexplode(bandKeys(cfg)).as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > cfg.maxBandBucket)

  /** Candidates with exact Jaccard over the shingle sets, kept when
    * >= cfg.threshold. Output: doc_a, doc_b, jaccard. */
  def verifiedPairs(docs: DataFrame, id: Column, text: Column, cfg: Config = Config()): DataFrame = {
    val sigs = signatures(docs, id, text, cfg).cache()
    val cands = candidatePairs(sigs, cfg)
    verify(cands, sigs.select(col("doc_id"), col("sh")), cfg)
  }

  /** Exact-Jaccard verification of a candidate-pair relation against a
    * shingle-set relation (doc_id, sh). Output: doc_a, doc_b, jaccard
    * (>= cfg.threshold only). */
  def verify(cands: DataFrame, sets: DataFrame, cfg: Config = Config()): DataFrame =
    // merge-hinted: the shingle-set side is corpus-sized (the arrays
    // dominate the bytes) yet estimates undercount it enough that the
    // planner broadcasts it — same driver-OOM shape as the band join
    cands
      .join(sets.as("sa").hint("merge"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb").hint("merge"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa.sh"), col("sb.sh"))).cast(DoubleType) /
         size(array_union(col("sa.sh"), col("sb.sh")))).as("jaccard"))
      .filter(col("jaccard") >= cfg.threshold)

  // ---- DuckDB oracle generation (same constants, same hashes) -----------

  /** DuckDB SQL computing exactly verifiedPairs over table `documents`
    * (doc_id, text) — machine-generated from the same Config so the
    * banding, hashing, and verification replicate bit-for-bit. */
  def oracleSql(cfg: Config = Config()): String =
    s"""${oracleCtes(cfg)}
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= ${cfg.threshold}"""

  /** The WITH-clause body shared by oracleSql and composed pipelines
    * (ends with CTE `verified`: doc_a, doc_b, jaccard — unfiltered).
    * `src` is the (doc_id, text) relation to dedup — `documents` by
    * default, a pipeline-stage CTE when composed; `pre` holds CTE
    * definitions `src` depends on, spliced in right after WITH (pass
    * them WITHOUT a trailing comma). */
  def oracleCtes(cfg: Config = Config(), src: String = "documents",
      pre: String = ""): String = {
    val shingle =
      raw"""list_distinct([array_to_string(toks[i:i+${cfg.shingleSize - 1}], ' ') FOR i IN range(1, greatest(len(toks)-${cfg.shingleSize - 1}, 1)+1)])"""
    val sigExprs = (0 until cfg.numPerms).map { j =>
      s"""list_min(list_transform(sh, s -> CAST('0x'||substring(md5('$j:'||s),1,15) AS BIGINT)))"""
    }.mkString("[", ", ", "]")
    val bandCase = (0 until cfg.bands).map { b =>
      val lo = b * cfg.rowsPerBand + 1
      val hi = (b + 1) * cfg.rowsPerBand
      s"WHEN $b THEN md5(array_to_string(list_transform(signature[$lo:$hi], x -> CAST(x AS VARCHAR)), ','))"
    }.mkString(" ")
    val lead = if (pre.isEmpty) "WITH " else s"WITH $pre,\n"
    raw"""${lead}toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM $src),
sh AS (SELECT doc_id, $shingle AS sh FROM toks),
sig AS (SELECT doc_id, sh, $sigExprs AS signature FROM sh),
bands AS (SELECT doc_id, i.i AS band_idx, CASE i.i $bandCase END AS band_key FROM sig, (SELECT unnest(range(${cfg.bands})) AS i) i),
bstat AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_key) AS bsz, min(doc_id) OVER (PARTITION BY band_idx, band_key) AS bmin FROM bands),
cand AS (SELECT DISTINCT doc_a, doc_b FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bstat a JOIN bstat b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id WHERE a.bsz <= ${cfg.maxBandBucket} UNION ALL SELECT bmin, doc_id FROM bstat WHERE bsz > ${cfg.maxBandBucket} AND doc_id <> bmin)),
verified AS (SELECT doc_a, doc_b, CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(sa.sh || sb.sh)) AS jaccard FROM cand JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id)"""
  }
}
