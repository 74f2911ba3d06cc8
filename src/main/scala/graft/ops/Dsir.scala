package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how much its hashed-unigram
  * profile looks like a target domain, log w(x) = Σ_tok log
  * p_target(b(tok)) / p_raw(b(tok)), where b() hashes tokens into a
  * fixed number of buckets and both bucket distributions are
  * add-one-smoothed. High log-weight documents are "target-like" and
  * survive the selection cut.
  *
  * Scale design: the bucket tables are at most `buckets` rows however
  * large the corpus is — the groupBy(bucket) shuffle carries ≤ buckets
  * rows per map partition after partial aggregation, and the log-ratio
  * table BROADCASTS back over the exploded tokens (never a corpus-side
  * shuffle for the scoring join). The only corpus-proportional shuffle
  * is the final per-doc re-aggregation on doc_id. The selection cut
  * (one exact-percentile aggregate, broadcast) follows the same
  * never-a-global-sort rule as [[UnigramLm.pplBuckets]].
  *
  * Determinism (oracle parity, the [[UnigramLm]] trick): per-bucket log
  * ratios are quantized to BIGINT at 1e-6 and summed exactly — any
  * summation order gives the same integer — then presented floor-4.
  */
object Dsir {

  /** Per-document importance log-weight against the `isTarget` subset.
    * Output: (doc_id, n_tok, log_weight floor-4). */
  def importanceWeights(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 64): DataFrame = {
    val toks = docs.select(id.as("doc_id"), isTarget.as("is_target"),
        explode(TextFunctions.tokens(lower(text))).as("tok"))
      .select(col("doc_id"), col("is_target"),
        pmod(TextFunctions.md5Long(col("tok")), lit(buckets.toLong)).as("bucket"))
    // ONE stats pass over the exploded tokens gives both distributions
    // (raw + target counts per bucket); the grand totals then reduce the
    // ≤ `buckets`-row table, NOT the corpus — so the whole scoring plan
    // reads the corpus exactly twice (stats pass + scoring pass).
    val bucketCnt = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("raw_cnt"),
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("tgt_cnt"))
    // grand totals as a window sum OVER THE BUCKET TABLE (≤ `buckets`
    // rows through a single-partition exchange — bounded by construction,
    // never the corpus), so no third corpus pass and no scalar cross join
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ≤ `buckets` rows: the smoothed log p_target/p_raw ratio per bucket,
    // quantized so per-doc sums are exact integers in any order.
    val lr = bucketCnt
      .withColumn("raw_total", sum(col("raw_cnt")).over(wAll))
      .withColumn("tgt_total", sum(col("tgt_cnt")).over(wAll))
      .select(col("bucket"),
        floor((log((col("tgt_cnt") + 1).cast("double") /
                   (col("tgt_total") + buckets).cast("double"))
             - log((col("raw_cnt") + 1).cast("double") /
                   (col("raw_total") + buckets).cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lr_q"))
    toks.join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lr_q")).as("sum_q"))
      .select(col("doc_id"), col("n_tok"),
        (floor(col("sum_q").cast("double") / lit(100.0) + lit(0.5))
          / lit(10000.0)).as("log_weight"))
  }

  // percentile fraction materialized through a Scala double so engine
  // and oracle parse the IDENTICAL IEEE literal
  private def cutLit(keepFraction: Double): String = (1.0 - keepFraction).toString

  /** The selection step: keep the top-`keepFraction` of documents by
    * importance log-weight. The cut value is ONE exact-percentile
    * aggregate over the integer-scaled weight, broadcast back — never a
    * global ntile/sort. Weights compare as exact 4-decimal BIGINTs.
    * Output: (doc_id, lw4 BIGINT) for the survivors. */
  def selectTop(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, keepFraction: Double, buckets: Int = 64): DataFrame = {
    val w = importanceWeights(docs, id, text, isTarget, buckets)
      .select(col("doc_id"),
        floor(col("log_weight") * lit(10000.0) + lit(0.5)).cast("long").as("lw4"))
    val cut = w.agg(expr(s"percentile(lw4, ${cutLit(keepFraction)}D)").as("c"))
    w.crossJoin(broadcast(cut))
      .filter(col("lw4").cast("double") >= col("c"))
      .select(col("doc_id"), col("lw4"))
  }

  /** Train the model once in batch and return it as a plain map
    * bucket → quantized log-ratio: at most `buckets` entries, so the
    * collect is bounded by construction (like k-means centroids). The
    * artifact serves streaming gates via [[scoreColumn]]. */
  def trainModel(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 64): Map[Long, Long] = {
    val toks = docs.select(isTarget.as("is_target"),
        explode(TextFunctions.tokens(lower(text))).as("tok"))
      .select(col("is_target"),
        pmod(TextFunctions.md5Long(col("tok")), lit(buckets.toLong)).as("bucket"))
    val bucketCnt = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("raw_cnt"),
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("tgt_cnt"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bucketCnt
      .withColumn("raw_total", sum(col("raw_cnt")).over(wAll))
      .withColumn("tgt_total", sum(col("tgt_cnt")).over(wAll))
      .select(col("bucket"),
        floor((log((col("tgt_cnt") + 1).cast("double") /
                   (col("tgt_total") + buckets).cast("double"))
             - log((col("raw_cnt") + 1).cast("double") /
                   (col("raw_total") + buckets).cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lr_q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Score a text column against a [[trainModel]] artifact entirely
    * in-row (the model rides into the plan as a literal map — no join,
    * no shuffle, streaming-safe): the serving path for ingest-time
    * importance gates. Same quantized sum and floor-4 presentation as
    * [[importanceWeights]], so batch and stream scores are identical
    * for identical text. Buckets absent from the model (never seen in
    * training) contribute 0. */
  def scoreColumn(text: Column, model: Map[Long, Long],
      buckets: Int = 64): Column = {
    val m = typedLit(model)
    TextFunctions.bindOnce(TextFunctions.tokens(lower(text))) { toks =>
      floor(
        aggregate(toks, lit(0L), (acc, t) =>
          acc + coalesce(
            element_at(m, pmod(TextFunctions.md5Long(t), lit(buckets.toLong))),
            lit(0L)))
        .cast("double") / lit(100.0) + lit(0.5)) / lit(10000.0)
    }
  }

  /** CTE body of the [[importanceWeights]] oracle over `src`, with the
    * target predicate given as SQL. Ends with CTE `${p}dw`:
    * (doc_id, n_tok, log_weight). */
  def oracleCtes(targetSql: String, buckets: Int = 64,
      src: String = "documents", p: String = ""): String =
    raw"""${p}toks AS (SELECT doc_id, $targetSql AS is_target, CAST('0x'||substring(md5(tok),1,15) AS BIGINT) % $buckets AS bucket FROM (SELECT doc_id, lang, source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM $src)),
${p}rawb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS raw_cnt FROM ${p}toks GROUP BY bucket),
${p}tgtb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tgt_cnt FROM ${p}toks WHERE is_target GROUP BY bucket),
${p}tot AS (SELECT CAST(count(*) AS BIGINT) AS raw_total, CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tgt_total FROM ${p}toks),
${p}lr AS (SELECT bucket, CAST(floor((ln(CAST(coalesce(tgt_cnt, 0) + 1 AS DOUBLE) / CAST(tgt_total + $buckets AS DOUBLE)) - ln(CAST(raw_cnt + 1 AS DOUBLE) / CAST(raw_total + $buckets AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS lr_q FROM ${p}rawb LEFT JOIN ${p}tgtb USING (bucket), ${p}tot),
${p}dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, floor(CAST(sum(lr_q) AS DOUBLE) / 100.0 + 0.5) / 10000.0 AS log_weight FROM ${p}toks JOIN ${p}lr USING (bucket) GROUP BY doc_id)"""

  /** DuckDB replica of [[importanceWeights]] over table `documents`. */
  def oracleSql(targetSql: String, buckets: Int = 64): String =
    s"WITH ${oracleCtes(targetSql, buckets)}\nSELECT doc_id, n_tok, log_weight FROM dw"

  /** DuckDB replica of [[selectTop]] over table `documents`. */
  def selectOracleSql(targetSql: String, keepFraction: Double,
      buckets: Int = 64): String =
    s"""WITH ${oracleCtes(targetSql, buckets)},
lw AS (SELECT doc_id, CAST(floor(log_weight * 10000.0 + 0.5) AS BIGINT) AS lw4 FROM dw),
cut AS (SELECT quantile_cont(lw4, ${cutLit(keepFraction)}) AS c FROM lw)
SELECT doc_id, lw4 FROM lw, cut WHERE CAST(lw4 AS DOUBLE) >= c"""
}
