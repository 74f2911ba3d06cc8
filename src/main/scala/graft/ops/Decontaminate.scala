package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: flag corpus documents that share any word
  * n-gram with an evaluation set — the standard pretraining hygiene
  * pass that keeps test benchmarks out of the training corpus (the
  * GPT-3/PaLM-style 8–13-gram overlap check).
  *
  * Scale design: the EVAL side is small by construction (benchmarks are
  * thousands of documents, the corpus is billions), so its distinct
  * n-gram set builds in one tiny aggregate and BROADCASTS; the corpus
  * side explodes its per-document distinct grams map-side and
  * broadcast-hash-joins — the inner join keeps only matching grams, so
  * the one shuffle (per-doc hit count) moves contaminated grams only,
  * a sliver of corpus volume. The corpus itself is never shuffled or
  * re-partitioned; the final left join attaching hit counts back is a
  * key join against an aggregate far smaller than the corpus.
  */
object Decontaminate {

  /** Per-document overlap with the eval set's n-grams. Output:
    * (doc_id, n_hit, contaminated) — n_hit = how many of the document's
    * distinct n-grams appear anywhere in the eval set; contaminated =
    * n_hit >= minHits. */
  def overlap(docs: DataFrame, id: Column, text: Column,
      eval: DataFrame, evalText: Column, n: Int = 5,
      minHits: Int = 1): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val evalGrams = eval
      .select(explode(TextFunctions.shingles(evalText, n)).as("gram"))
      .distinct()
    val docGrams = docs.select(id.as("doc_id"),
      explode(TextFunctions.shingles(text, n)).as("gram"))
    val hits = docGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit")) // doc grams are distinct per doc
    docs.select(id.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** DuckDB shingle expression matching [[TextFunctions.shingles]] over
    * a token-array SQL expression (distinct word n-grams; shorter-than-n
    * docs yield the whole text as one shingle). */
  def shinglesSql(toksSql: String, n: Int): String =
    raw"""list_distinct([array_to_string(($toksSql)[i:i+${n - 1}], ' ') FOR i IN range(1, greatest(len($toksSql)-${n - 1}, 1)+1)])"""

  /** DuckDB replica of [[overlap]] over table `documents`, with the
    * eval set defined by `evalPredSql` (a boolean over documents) and
    * its text truncated to the first `evalPrefixToks` tokens — the same
    * derivation the registered query uses so both engines see an
    * identical planted benchmark. */
  def oracleSql(evalPredSql: String, evalPrefixToks: Int, n: Int = 5,
      minHits: Int = 1): String =
    raw"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
eg AS (SELECT DISTINCT unnest(${shinglesSql(s"toks[1:$evalPrefixToks]", n)}) AS gram FROM toks WHERE $evalPredSql),
dg AS (SELECT doc_id, unnest(${shinglesSql("toks", n)}) AS gram FROM toks),
hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit FROM dg JOIN eg USING (gram) GROUP BY doc_id)
SELECT t.doc_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit, coalesce(h.n_hit, 0) >= $minHits AS contaminated
FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id"""
}
