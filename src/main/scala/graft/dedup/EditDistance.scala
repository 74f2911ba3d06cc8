package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Edit-distance (fuzzy) near-dup pairs — the ladder rung between
  * byte-exact dedup and set-similarity (MinHash/n-gram): catches docs
  * differing by a few character EDITS (typo/OCR/template-fill
  * variants), which token-set measures under-weigh and exact hashing
  * misses entirely.
  *
  * Scale shape: candidates come from TWO blocking joins, multi-table
  * LSH style — a prefix block on the first `blockChars` characters of
  * the normalized text AND a suffix block on the last `blockChars` —
  * unioned and de-duplicated. A pair within `maxDist` edits can only
  * escape both blocks if its edits touch BOTH the head and the tail,
  * which at small maxDist means the doc is short enough that the
  * blocks overlap anyway; a single prefix block, by contrast, is blind
  * to every head-edited variant (OCR noise on the first line,
  * prepended boilerplate). The quadratic levenshtein only runs inside
  * blocks, and block sizes are bounded by duplicate-family sizes, not
  * corpus size. Both engines implement classic unit-cost levenshtein,
  * so the oracle replays verify exactly. */
object EditDistance {

  /** Pairs (doc_a < doc_b) sharing the prefix OR suffix block with
    * levenshtein(norm_a, norm_b) <= maxDist. */
  def pairs(docs: DataFrame, id: Column, text: Column,
      maxDist: Int = 16, blockChars: Int = 12): DataFrame = {
    val e = docs.select(id.as("doc_id"), TextFunctions.normText(text).as("norm"))
      .withColumn("pblk", substring(col("norm"), 1, blockChars))
      .withColumn("sblk", expr(s"right(norm, $blockChars)"))
    // merge-hinted self-join: both sides carry the full normalized text
    // per row — corpus-sized; never a broadcast candidate at scale
    def blocked(blk: String): DataFrame =
      e.as("a").join(e.as("b").hint("merge"),
          col(s"a.$blk") === col(s"b.$blk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.norm").as("norm_a"), col("b.norm").as("norm_b"))
    // union-distinct across the two block tables: a pair sharing both
    // blocks must still be verified (and emitted) exactly once
    blocked("pblk").union(blocked("sblk")).distinct()
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("norm_a"), col("norm_b")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** DuckDB replica of [[pairs]] over table `documents`. */
  def oracleSql(maxDist: Int = 16, blockChars: Int = 12): String =
    raw"""WITH e AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
b AS (SELECT doc_id, norm, substring(norm, 1, $blockChars) AS pblk, right(norm, $blockChars) AS sblk FROM e),
cand AS (
  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, a.norm AS norm_a, b2.norm AS norm_b FROM b a JOIN b b2 ON a.pblk = b2.pblk AND a.doc_id < b2.doc_id
  UNION
  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, a.norm AS norm_a, b2.norm AS norm_b FROM b a JOIN b b2 ON a.sblk = b2.sblk AND a.doc_id < b2.doc_id)
SELECT doc_a, doc_b, levenshtein(norm_a, norm_b) AS edit_dist FROM cand WHERE levenshtein(norm_a, norm_b) <= $maxDist"""
}
