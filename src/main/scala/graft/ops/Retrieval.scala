package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked retrieval over the document corpus — the text-side
  * sibling of the embedding ANN rung: given a bag of query terms, score
  * every document with the Lucene-form BM25
  * (idf = ln(1 + (N - df + 0.5)/(df + 0.5))) and return the global
  * top-k.
  *
  * Scale design: corpus statistics (N, sum-of-lengths, per-term
  * document frequencies) reduce in ONE partial+final aggregate pass to
  * a single row that broadcasts back over the corpus; term frequencies
  * are per-row array ops. So the whole query is: one map-reduce over
  * the corpus for stats, one map for scores, and a
  * TakeOrderedAndProject for the top-k — no shuffle of the corpus
  * itself, no inverted-index materialization (which would be a
  * separate, amortizable build). That is the plan you want at 100 TB
  * for a fixed (small) term set.
  *
  * Determinism: avgdl is computed as exact-BIGINT sum(dl)/count (NOT
  * avg(), whose accumulation order is engine-dependent), every double
  * op after that is IEEE-identical across engines, terms sum in fixed
  * left-to-right order, and the final score is floor-rounded at 4
  * decimals (same portable form as [[Corpus.repetitionRatio]]) so the
  * DuckDB oracle hash-matches despite libm ln differing in the last
  * ulp. Ties rank by doc_id, making the limit total-ordered.
  */
object Retrieval {

  /** Top-k documents by BM25 score for `terms`. Output: (doc_id,
    * score, rank) with rank 1..k by (score desc, doc_id asc). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty && k > 0)
    val base = docs.select(id.as("doc_id"),
      TextFunctions.tokens(lower(text)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))

    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val allAggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl")) ++ dfAggs
    val stats = base.agg(allAggs.head, allAggs.tail: _*)

    val scored = base.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n"))
    val termScores = terms.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }
    val score = termScores.reduce(_ + _)
    scored
      .select(col("doc_id"),
        (floor(score * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** DuckDB replica of [[bm25TopK]] over table `documents` — same
    * formula shape, same fixed term order, same floor-4 rounding. */
  def bm25OracleSql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): String = {
    val dfExprs = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(", ")
    val termExprs = terms.zipWithIndex.map { case (t, i) =>
      s"""(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5)) * (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * ${k1 + 1.0}) / (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl)))"""
    }.mkString(" + ")
    raw"""WITH base AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks, CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS dl FROM documents),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfExprs FROM base),
scored AS (SELECT doc_id, floor(($termExprs) * 10000.0 + 0.5) / 10000.0 AS score FROM base, (SELECT *, CAST(sum_dl AS DOUBLE) / n AS avgdl FROM stats))
SELECT doc_id, score, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank FROM scored ORDER BY score DESC, doc_id ASC LIMIT $k"""
  }

  /** Per-document top-k salient terms (keyword extraction for corpus
    * exploration / near-dup explanation): rank a document's terms by
    * (tf DESC, df ASC, term ASC) — a TOTAL INTEGER order both engines
    * replay exactly, immune to the last-ulp ln() rank flips a
    * float-ordered tf-idf rank would risk — and carry the conventional
    * tf·ln(N/df) weight as a floor-4 payload column.
    *
    * Plan: term frequencies are computed INSIDE each row (distinct-term
    * HOF over the token array — tf is a per-document quantity, so it
    * never needs a shuffle; a naive groupBy(doc, term) formulation has
    * group cardinality ≈ corpus tokens, and the 100×-scale probe
    * measured its hash-aggregate spilling 28-31 GB because text
    * amplifies ~10× into (doc,term) rows however the input is split) →
    * per-term document frequency (vocabulary-bounded hash aggregate) →
    * tf⋈df shuffle-hash join on term (vocabulary-sized build side,
    * hinted: sort-merge would sort the doc×term relation; hot terms are
    * AQE skew-split territory) → N broadcast → per-doc window top-k
    * (WindowGroupLimit prunes to k per doc map-side before the
    * exchange). No driver state, no global sort.
    * Output: (doc_id, rank, term, tf, df, tfidf). */
  def tfIdfTopTerms(docs: DataFrame, id: Column, text: Column,
      k: Int = 3): DataFrame = {
    val tf = docs.select(id.as("doc_id"),
        explode(TextFunctions.bindOnce(TextFunctions.tokens(lower(text))) {
          toks =>
            transform(array_distinct(toks), t =>
              struct(t.as("term"),
                size(filter(toks, x => x === t)).cast("long").as("tf")))
        }).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(Joins.corpusSide(dfT), Seq("term")).crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        (floor(col("tf").cast("double")
            * log(col("n_docs").cast("double") / col("df").cast("double"))
            * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("tfidf"))
  }

  /** DuckDB replica of [[tfIdfTopTerms]] over table `documents`. */
  def tfIdfOracleSql(k: Int = 3): String =
    raw"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_id, rank, term, tf, df, floor(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS tfidf
FROM (SELECT doc_id, term, tf, df, n_docs, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS INTEGER) AS rank FROM tf JOIN dft USING (term), n)
WHERE rank <= $k"""
}
