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

  /** Cross-document duplication rate — the RefinedWeb-style corpus
    * health signal: for each document, the fraction of its distinct
    * n-grams that also occur in at least one OTHER document. High rates
    * mark boilerplate/template families that survive document-level
    * dedup. Output: (doc_id, n_grams, n_dup, dup_rate) with dup_rate
    * floor-rounded at 4 decimals.
    *
    * Unlike [[overlap]] there is no small side to broadcast — the gram
    * document-frequency table is corpus-sized, so this is the one
    * honest corpus-volume shuffle in the text ladder: gram DF with
    * map-side partial aggregation, then a key-partitioned join of the
    * exploded grams against the df>1 subset, re-aggregated per doc.
    * Hot grams are exactly what AQE skew-split handles. */
  def gramDupRate(docs: DataFrame, id: Column, text: Column,
      n: Int = 5): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      TextFunctions.shingles(text, n).as("sh"))
    val grams = base.select(col("doc_id"), explode(col("sh")).as("gram"))
    // grams are distinct within a doc, so count(*) is the doc frequency
    val gdf = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val hits = grams.join(gdf.filter(col("df") > 1), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    base.select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (floor(coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_grams")
          * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("dup_rate"))
  }

  /** DuckDB replica of [[gramDupRate]] over table `documents`. */
  def gramDupRateOracleSql(n: Int = 5): String =
    raw"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
sh AS (SELECT doc_id, ${shinglesSql("toks", n)} AS sh FROM toks),
dg AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
gdf AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY gram),
hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM dg JOIN gdf USING (gram) WHERE df > 1 GROUP BY doc_id)
SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_grams, CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup, floor(CAST(coalesce(h.n_dup, 0) AS DOUBLE) / len(s.sh) * 10000.0 + 0.5) / 10000.0 AS dup_rate
FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id"""

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
