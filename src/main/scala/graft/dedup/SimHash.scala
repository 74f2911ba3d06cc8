package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.TextFunctions

/** SimHash near-duplicate detection: a 60-bit locality-sensitive
  * fingerprint (sign of per-bit weighted token-hash sums), with
  * candidate generation by chunk equality (pigeonhole: hamming <= k
  * pairs share at least one of k+1 chunks) and exact hamming
  * verification.
  *
  * Scale design: the fingerprint is one map-side projection per doc
  * (no shuffle); candidate joins key on 15-bit chunks. Token hashes are
  * md5-prefix-derived so oracles can reproduce them.
  */
object SimHash {

  val Bits = 60
  val Chunks = 4            // supports maxHamming <= 3 by pigeonhole
  val ChunkBits: Int = Bits / Chunks

  /** The 60-bit simhash of a text column, as one BIGINT expression.
    * The token-hash array is bound once ([[TextFunctions.bindOnce]]) —
    * the 60 per-bit folds reference a lambda variable, not 60 copies of
    * the tokenize+md5 tree. */
  def simhash(text: Column): Column =
    TextFunctions.bindOnce(
      transform(TextFunctions.tokens(text), t => TextFunctions.md5Long(t)))(
      simhashOfHashes)

  /** Materialize token hashes once, then fold 60 per-bit scores. */
  private def simhashOfHashes(hashes: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, k) =>
      val score = aggregate(hashes, lit(0L),
        (a, h) => a + (shiftright(h, k).bitwiseAND(lit(1L)) * 2 - 1))
      acc + when(score > 0, lit(1L << k)).otherwise(lit(0L))
    }

  /** doc_id + simhash (token hashes materialized to hash once). */
  def fingerprints(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        transform(TextFunctions.tokens(text), t => TextFunctions.md5Long(t)).as("hashes"))
      .select(col("doc_id"), simhashOfHashes(col("hashes")).as("simhash"))

  /** Pairs with hamming distance <= maxHamming (requires
    * maxHamming < Chunks). Output: doc_a, doc_b, hamming. */
  def pairs(docs: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Chunks, s"chunking supports maxHamming < $Chunks")
    val fp = fingerprints(docs, id, text)
    val chunked = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until Chunks).map(i =>
        shiftright(col("simhash"), i * ChunkBits).bitwiseAND(lit((1L << ChunkBits) - 1))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    // merge-hinted self-join: both sides are corpus×chunks rows — same
    // scale-safety reasoning as MinHash.candidatePairs
    chunked.as("a").join(chunked.as("b").hint("merge"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB SQL replicating pairs() over table `documents`. */
  def oracleSql(maxHamming: Int = 3): String = {
    val scoreTerms = (0 until Bits).map { k =>
      s"(CASE WHEN list_sum(list_transform(hashes, h -> ((h >> $k) & 1)*2 - 1)) > 0 THEN (1::BIGINT << $k) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    val chunkCase = (0 until Chunks).map { i =>
      s"WHEN $i THEN (simhash >> ${i * ChunkBits}) & ${(1L << ChunkBits) - 1}"
    }.mkString(" ")
    raw"""WITH h AS (SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'), t -> CAST('0x'||substring(md5(t),1,15) AS BIGINT)) AS hashes FROM documents),
fp AS (SELECT doc_id, $scoreTerms AS simhash FROM h),
chunked AS (SELECT doc_id, simhash, i.i AS chunk_idx, CASE i.i $chunkCase END AS chunk_val FROM fp, (SELECT unnest(range($Chunks)) AS i) i)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming FROM chunked a JOIN chunked b ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming"""
  }
}
