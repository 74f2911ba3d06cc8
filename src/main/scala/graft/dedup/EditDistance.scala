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
  * Scale shape: candidates come from a BLOCKING join on the first
  * `blockChars` characters of the normalized text (the classic
  * record-linkage prefix block — near-identical docs share it; at
  * 100 TB you'd add a second block on a suffix or fingerprint chunk to
  * catch head-edited docs, the same multi-table trick as LSH). The
  * quadratic levenshtein only runs inside blocks, and block sizes are
  * bounded by duplicate-family sizes, not corpus size. Both engines
  * implement classic unit-cost levenshtein, so the oracle replays
  * verify exactly. */
object EditDistance {

  /** Pairs (doc_a < doc_b) sharing the prefix block with
    * levenshtein(norm_a, norm_b) <= maxDist. */
  def pairs(docs: DataFrame, id: Column, text: Column,
      maxDist: Int = 16, blockChars: Int = 12): DataFrame = {
    val e = docs.select(id.as("doc_id"), TextFunctions.normText(text).as("norm"))
      .withColumn("blk", substring(col("norm"), 1, blockChars))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.norm"), col("b.norm")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** DuckDB replica of [[pairs]] over table `documents`. */
  def oracleSql(maxDist: Int = 16, blockChars: Int = 12): String =
    raw"""WITH e AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
b AS (SELECT doc_id, norm, substring(norm, 1, $blockChars) AS blk FROM e)
SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, levenshtein(a.norm, b2.norm) AS edit_dist FROM b a JOIN b b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id WHERE levenshtein(a.norm, b2.norm) <= $maxDist"""
}
