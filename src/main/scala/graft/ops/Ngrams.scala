package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bigram-level corpus statistics: a corpus-trained bigram LM document
  * scorer (the next rung above [[UnigramLm]] toward CCNet's KenLM
  * signal) and PMI collocation mining.
  *
  * Both start from the same in-row bigram construction: adjacent token
  * pairs are built INSIDE each row with a HOF over the token array
  * (the tfidf 100×-probe lesson — per-document sequence structure
  * never needs a shuffle), then explode feeds vocabulary-keyed
  * aggregates. Context counts c(w1) and right counts c(w2) derive from
  * the bigram table itself — vocabulary-bounded aggregates, not extra
  * corpus passes.
  *
  * Determinism: the same quantize-to-BIGINT-then-exact-sum protocol as
  * [[UnigramLm]] — per-gram log-probs quantized at 1e-6, summed as
  * exact integers in any order, presented floor-4; PMI ranks on the
  * quantized integer with a (w1, w2) total-order tiebreak.
  */
object Ngrams {

  /** (doc_id, grams: array<struct<w1,w2>>) built in-row; docs with
    * fewer than two tokens yield an empty array. */
  private def gramArr(text: Column): Column =
    TextFunctions.bindOnce(TextFunctions.tokens(lower(text))) { toks =>
      filter(
        transform(sequence(lit(1), size(toks)), i =>
          when(i >= 2, struct(
            element_at(toks, i - 1).as("w1"),
            element_at(toks, i).as("w2")))),
        s => s.isNotNull)
    }

  private def grams(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(gramArr(text)).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))

  /** Per-document mean bigram log-probability under the corpus bigram
    * model, p(w2|w1) = c(w1,w2)/c(w1) with c(w1) the CONTEXT count
    * (bigram-table marginal). Every observed gram has c ≥ 1, so no
    * smoothing is needed to score the corpus against itself. Documents
    * with < 2 tokens have no bigrams and are absent — identically so
    * in the oracle. Output: (doc_id, n_bigrams, avg_logprob floor-4). */
  def bigramScoreDocs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val g = grams(docs, id, text)
    val bg = g.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    // pin BOTH model-side joins: the bigram table's cardinality tracks
    // distinct corpus bigrams, so Catalyst's static estimates
    // mis-broadcast it (10×-probe: driver-result bytes grew 16 →
    // 159 MB). Sort-merge over shuffled-hash: a hash build of a
    // corpus-derived table OOM'd the 1M-doc probe (SCALE.md seventh
    // finding); the sort spill it costs instead is graceful and
    // bounded by partition size
    val model = bg.join(Joins.corpusSide(ctx), Seq("w1"))
      .select(col("w1"), col("w2"),
        floor(log(col("c_ab").cast("double") / col("c_a").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lp_q"))
    g.join(Joins.corpusSide(model), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_q")).as("sum_q"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor(col("sum_q").cast("double") / col("n_bigrams") / lit(100.0)
          + lit(0.5)) / lit(10000.0)).as("avg_logprob"))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * pairs: pmi = ln(c_ab·N / (c_a·c_b)) with N total bigrams and
    * c_a/c_b the left/right bigram-table marginals, floor over a
    * min-count support filter. The global top-k is a TakeOrdered (k
    * rows — never a full sort); marginals and N are vocabulary-bounded
    * / scalar aggregates. Output: (rank, w1, w2, c_ab, pmi floor-6 as
    * a 1e-6-scaled BIGINT — ranks compare as exact integers). */
  def pmiCollocations(docs: DataFrame, id: Column, text: Column,
      minCount: Long, k: Int): DataFrame = {
    val g = grams(docs, id, text)
    val bg = g.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val left = bg.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val right = bg.groupBy(col("w2")).agg(sum(col("c_ab")).as("c_b"))
    val n = g.agg(count(lit(1)).as("n_grams"))
    val scored = bg.filter(col("c_ab") >= minCount)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_ab"),
        floor(log(col("c_ab").cast("double") * col("n_grams").cast("double")
            / (col("c_a").cast("double") * col("c_b").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("pmi6"))
    scored.orderBy(col("pmi6").desc, col("w1").asc, col("w2").asc).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi6").desc, col("w1").asc, col("w2").asc)))
      .select(col("rank"), col("w1"), col("w2"), col("c_ab"), col("pmi6"))
  }

  /** Shared DuckDB gram CTEs over `src`: `${p}g` = (doc_id, w1, w2). */
  def gramCtes(src: String = "documents", p: String = ""): String =
    raw"""${p}t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM $src),
${p}g AS (SELECT doc_id, toks[i-1] AS w1, toks[i] AS w2 FROM ${p}t, LATERAL unnest(range(2, len(toks)+1)) AS u(i))"""

  /** DuckDB replica of [[bigramScoreDocs]] over table `documents`. */
  def bigramOracleSql: String =
    s"""WITH ${gramCtes()},
bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM g GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bg GROUP BY 1),
model AS (SELECT w1, w2, CAST(floor(ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q FROM bg JOIN ctx USING (w1))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, floor(CAST(sum(lp_q) AS DOUBLE) / count(*) / 100.0 + 0.5) / 10000.0 AS avg_logprob FROM g JOIN model USING (w1, w2) GROUP BY doc_id"""

  /** DuckDB replica of [[pmiCollocations]] over table `documents`. */
  def pmiOracleSql(minCount: Long, k: Int): String =
    s"""WITH ${gramCtes()},
bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM g GROUP BY 1, 2),
lft AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bg GROUP BY 1),
rgt AS (SELECT w2, CAST(sum(c_ab) AS BIGINT) AS c_b FROM bg GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_grams FROM g),
scored AS (SELECT w1, w2, c_ab, CAST(floor(ln(CAST(c_ab AS DOUBLE) * CAST(n_grams AS DOUBLE) / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS pmi6 FROM bg JOIN lft USING (w1) JOIN rgt USING (w2), n WHERE c_ab >= $minCount)
SELECT CAST(row_number() OVER (ORDER BY pmi6 DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank, w1, w2, c_ab, pmi6 FROM scored ORDER BY pmi6 DESC, w1 ASC, w2 ASC LIMIT $k"""
}
