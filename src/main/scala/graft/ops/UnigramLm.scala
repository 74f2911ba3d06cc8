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

  /** DuckDB replica of [[scoreDocs]] over table `documents` — same
    * quantization, same exact integer sum, same floor-4 mean. */
  def oracleSql: String =
    raw"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM toks),
vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
pt AS (SELECT doc_id, CAST(floor(ln(CAST(cnt AS DOUBLE)/CAST(t_total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q FROM toks JOIN vocab USING (tok), tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS dl, floor(CAST(sum(lp_q) AS DOUBLE)/count(*)/100.0 + 0.5)/10000.0 AS avg_logprob FROM pt GROUP BY doc_id"""
}
