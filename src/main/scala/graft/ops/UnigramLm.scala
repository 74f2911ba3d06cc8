package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained unigram language-model scoring — the KenLM-style
  * perplexity quality signal of CCNet/RedPajama pipelines reduced to
  * its unigram form: p(tok) = count(tok)/T over the whole corpus, each
  * document scored by its mean token log-probability (higher = more
  * typical of the corpus; very low = gibberish/boilerplate outliers).
  *
  * Scale design: the token explode is processed in three key-partitioned
  * stages — (1) vocabulary counts groupBy(token) with map-side partial
  * aggregation (the combiner collapses each partition to its distinct
  * tokens, so the shuffle carries vocabulary, not corpus, volume);
  * (2) exploded tokens join vocab on token (shuffle-hash; hot tokens
  * like "the" are exactly what AQE skew-split handles); (3) per-doc
  * re-aggregation by doc_id. No driver-side state, no collect — the
  * vocabulary is never assumed to fit anywhere but a partitioned table.
  *
  * Determinism (the oracle-parity trick): a SUM of per-token ln values
  * is order-dependent in IEEE doubles, so each token's log-prob is
  * quantized to a BIGINT at 1e-6 (floor-half-up) and summed EXACTLY —
  * any summation order gives the same integer — then the mean is
  * floor-rounded at 4 decimals. The only residual engine difference is
  * a last-ulp ln() flip across a quantization boundary, the same
  * accepted class as the BM25 oracle.
  */
object UnigramLm {

  /** Per-document mean token log-probability under the corpus unigram
    * model. Output: (doc_id, dl, avg_logprob) with dl = token count and
    * avg_logprob floor-rounded at 4 decimals. */
  def scoreDocs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(lower(text))).as("tok"))
    val totals = toks.agg(count(lit(1)).as("t_total"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val perTok = toks.join(vocab, "tok").crossJoin(broadcast(totals))
      .select(col("doc_id"),
        floor(log(col("cnt").cast("double") / col("t_total").cast("double"))
          * lit(1000000.0) + lit(0.5)).as("lp_q"))
    perTok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), sum(col("lp_q")).as("sum_q"))
      .select(col("doc_id"), col("dl"),
        (floor(col("sum_q").cast("double") / col("dl") / lit(100.0) + lit(0.5))
          / lit(10000.0)).as("avg_logprob"))
  }

  /** CTE body shared by the oracles, over source relation `src`
    * (doc_id, text) with prefixed CTE names for composability. Ends
    * with CTE `${p}sc`: doc_id, dl, avg_logprob — the [[scoreDocs]]
    * result. */
  def oracleCtes(src: String = "documents", p: String = ""): String =
    raw"""${p}toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM $src),
${p}tot AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM ${p}toks),
${p}vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ${p}toks GROUP BY tok),
${p}pt AS (SELECT doc_id, CAST(floor(ln(CAST(cnt AS DOUBLE)/CAST(t_total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q FROM ${p}toks JOIN ${p}vocab USING (tok), ${p}tot),
${p}sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl, floor(CAST(sum(lp_q) AS DOUBLE)/count(*)/100.0 + 0.5)/10000.0 AS avg_logprob FROM ${p}pt GROUP BY doc_id)"""

  /** DuckDB replica of [[scoreDocs]] over table `documents` — same
    * quantization, same exact integer sum, same floor-4 mean. */
  def oracleSql: String =
    s"WITH ${oracleCtes()}\nSELECT doc_id, dl, avg_logprob FROM sc"

  // the 1/3 and 2/3 tertile points, materialized through Scala doubles
  // so engine and oracle parse the IDENTICAL IEEE literal
  private val P1 = (1.0 / 3).toString
  private val P2 = (2.0 / 3).toString

  /** CCNet-style perplexity bucketing (head / middle / tail thirds of
    * the corpus by LM score — CCNet §4.3, with the unigram model above
    * standing in for KenLM): tertile CUT VALUES come from one exact-
    * percentile aggregate over the integer-scaled score, broadcast back
    * over the corpus — NOT a global ntile window (which would order the
    * whole corpus in a single reducer at 100 TB). Scores compare as
    * exact 4-decimal-scaled BIGINTs; higher score = more corpus-typical
    * = head. Output: (doc_id, lp4 BIGINT, bucket STRING). */
  def pplBuckets(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // floor(x*1e4 + 0.5), not a truncating cast: avg_logprob is an
    // integer/1e4, but x*1e4 can land 1 ulp below the integer
    val sc = scoreDocs(docs, id, text)
      .select(col("doc_id"),
        floor(col("avg_logprob") * lit(10000.0) + lit(0.5)).cast("long").as("lp4"))
    val cuts = sc.agg(
      expr(s"percentile(lp4, ${P1}D)").as("c1"),
      expr(s"percentile(lp4, ${P2}D)").as("c2"))
    sc.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("lp4"),
        when(col("lp4").cast("double") >= col("c2"), "head")
          .when(col("lp4").cast("double") < col("c1"), "tail")
          .otherwise("middle").as("bucket"))
  }

  /** Tokenizer-coverage signal: build the top-`vocabSize` token
    * vocabulary (by count, ties → token asc — a total order both
    * engines replay) and score every document's out-of-vocabulary
    * rate. The vocabulary build is a partial+final hash aggregate
    * followed by a global top-k (TakeOrdered — k rows, never a full
    * sort) that BROADCASTS back over the exploded tokens; per-doc
    * re-aggregation is the only other shuffle. Output: (doc_id, n_tok,
    * in_vocab, oov_rate floor-4). */
  def vocabOov(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(lower(text))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok").as("vtok"))
    toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), count(col("vtok")).as("in_vocab"))
      .select(col("doc_id"), col("n_tok"), col("in_vocab"),
        (floor((lit(1.0) - col("in_vocab").cast("double") / col("n_tok"))
          * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("oov_rate"))
  }

  /** DuckDB replica of [[vocabOov]] over table `documents`. */
  def vocabOovOracleSql(vocabSize: Int): String =
    raw"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM documents),
vocab AS (SELECT tok AS vtok FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT $vocabSize))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, CAST(count(vtok) AS BIGINT) AS in_vocab, floor((1.0 - CAST(count(vtok) AS DOUBLE)/count(*)) * 10000.0 + 0.5)/10000.0 AS oov_rate FROM toks LEFT JOIN vocab ON toks.tok = vocab.vtok GROUP BY doc_id"""

  /** CTE body of the [[pplBuckets]] oracle over `src`, prefixed. Ends
    * with CTE `${p}pb`: (doc_id, lp4, bucket). */
  def pplBucketsOracleCtes(src: String = "documents", p: String = ""): String =
    s"""${oracleCtes(src, p)},
${p}lp AS (SELECT doc_id, CAST(floor(avg_logprob * 10000.0 + 0.5) AS BIGINT) AS lp4 FROM ${p}sc),
${p}cuts AS (SELECT quantile_cont(lp4, $P1) AS c1, quantile_cont(lp4, $P2) AS c2 FROM ${p}lp),
${p}pb AS (SELECT doc_id, lp4, CASE WHEN CAST(lp4 AS DOUBLE) >= c2 THEN 'head' WHEN CAST(lp4 AS DOUBLE) < c1 THEN 'tail' ELSE 'middle' END AS bucket FROM ${p}lp, ${p}cuts)"""

  /** DuckDB replica of [[pplBuckets]] over table `documents`. */
  def pplBucketsOracleSql: String =
    s"""WITH ${pplBucketsOracleCtes()}
SELECT doc_id, lp4, bucket FROM pb"""
}
