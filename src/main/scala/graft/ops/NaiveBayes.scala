package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes over hashed unigrams — the model-based
  * document classifier every training-data pipeline carries (the
  * fastText-style quality/language-filter rung): train on the corpus's
  * own `train` split in ONE stats pass, classify the held-out split
  * in-plan. Add-one smoothing over `buckets` hash buckets per class;
  * prediction = argmax of prior + Σ count(bucket)·loglik(bucket|class).
  *
  * Scale design (the [[Dsir]] posture): the model is `buckets` ×
  * |classes| rows however large the corpus is — densified (so absent
  * (bucket, class) pairs carry their smoothed log-lik, not a silent
  * zero) and BROADCAST back. Corpus-side: the per-doc bucket counts
  * aggregate has ≤ `buckets` distinct keys per document (map-side
  * combine keeps the shuffle at docs×buckets worst case — bucketing is
  * what makes this safe where a per-TERM aggregate spilled, SCALE.md
  * third finding); the argmax window partitions by doc (|classes|
  * rows each). The corpus is read twice: stats pass + scoring pass.
  *
  * Determinism (oracle parity, the [[UnigramLm]] trick): per-(bucket,
  * class) log-likelihoods and per-class log-priors quantize to BIGINT
  * micros; per-doc scores are exact integer dot products, tie-broken
  * by class name ascending.
  */
object NaiveBayes {

  /** Train on `isTrain` docs, classify the rest. Output per scored doc:
    * (doc_id, pred, score_micros, actual, correct). */
  def classify(docs: DataFrame, id: Column, text: Column, label: Column,
      isTrain: Column, buckets: Int = 64): DataFrame = {
    val B = buckets
    val base = docs.select(id.as("doc_id"), label.as("actual"),
      isTrain.as("is_train"), TextFunctions.tokens(lower(text)).as("toks"))
    val toks = base.select(col("doc_id"), col("actual"), col("is_train"),
      explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("actual"), col("is_train"),
        pmod(TextFunctions.md5Long(col("tok")), lit(B.toLong)).as("bucket"))

    // ---- model (bounded: buckets × classes rows end to end) --------------
    val priors = base.filter(col("is_train"))
      .groupBy(col("actual").as("label")).agg(count(lit(1)).as("n_docs"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val priorQ = priors
      .withColumn("__total", sum(col("n_docs")).over(wAll))
      .select(col("label"),
        floor(log(col("n_docs").cast("double") / col("__total"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("prior_q"))
    val cnt = toks.filter(col("is_train"))
      .groupBy(col("actual").as("label"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("label")).agg(sum(col("c")).as("t"))
    val allBuckets = docs.sparkSession.range(B).select(col("id").as("bucket"))
    // densify: every (class, bucket) pair gets its smoothed log-lik —
    // a missing pair is ln(1/(t+B)), never a silent zero
    val loglik = tot.crossJoin(allBuckets)
      .join(cnt, Seq("label", "bucket"), "left")
      .select(col("label"), col("bucket"),
        floor(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
                  (col("t") + B).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("ll_q"))

    // ---- scoring (corpus-side: bucketed, broadcast-joined) ----------------
    val docBuckets = toks.filter(!col("is_train"))
      .groupBy(col("doc_id"), col("actual"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val scored = docBuckets.join(broadcast(loglik), Seq("bucket"))
      .groupBy(col("doc_id"), col("actual"), col("label"))
      .agg(sum(col("n") * col("ll_q")).as("__s"))
      .join(broadcast(priorQ), Seq("label"))
      .select(col("doc_id"), col("actual"), col("label"),
        (col("__s") + col("prior_q")).as("score_micros"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micros").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(byDoc)).filter(col("__rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score_micros"),
        col("actual"), (col("label") === col("actual")).as("correct"))
  }

  /** DuckDB replica of [[classify]] over table `documents`, label =
    * `lang`, train split = `trainPred` (a doc-level predicate). */
  def classifyOracleSql(trainPred: String, buckets: Int = 64): String = {
    val B = buckets
    raw"""WITH base AS (SELECT doc_id, lang AS actual, ($trainPred) AS is_train, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
tok AS (SELECT doc_id, actual, is_train, CAST('0x'||substring(md5(t),1,15) AS BIGINT) % $B AS bucket FROM (SELECT doc_id, actual, is_train, unnest(toks) AS t FROM base)),
pri AS (SELECT actual AS label, CAST(count(*) AS BIGINT) AS n_docs FROM base WHERE is_train GROUP BY actual),
priq AS (SELECT label, CAST(floor(ln(CAST(n_docs AS DOUBLE) / (SELECT CAST(sum(n_docs) AS DOUBLE) FROM pri)) * 1000000.0 + 0.5) AS BIGINT) AS prior_q FROM pri),
cnt AS (SELECT actual AS label, bucket, CAST(count(*) AS BIGINT) AS c FROM tok WHERE is_train GROUP BY actual, bucket),
tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY label),
ll AS (SELECT tot.label, b.bucket, CAST(floor(ln((coalesce(cnt.c, 0) + 1) / CAST(tot.t + $B AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS ll_q FROM tot CROSS JOIN (SELECT unnest(range(0, $B)) AS bucket) b LEFT JOIN cnt ON cnt.label = tot.label AND cnt.bucket = b.bucket),
db AS (SELECT doc_id, actual, bucket, CAST(count(*) AS BIGINT) AS n FROM tok WHERE NOT is_train GROUP BY doc_id, actual, bucket),
sc AS (SELECT doc_id, actual, ll.label, CAST(sum(n * ll_q) AS BIGINT) + any_value(priq.prior_q) AS score_micros FROM db JOIN ll USING (bucket) JOIN priq ON priq.label = ll.label GROUP BY doc_id, actual, ll.label),
pred AS (SELECT doc_id, actual, label, score_micros, row_number() OVER (PARTITION BY doc_id ORDER BY score_micros DESC, label ASC) AS rn FROM sc)
SELECT doc_id, label AS pred, score_micros, actual, (label = actual) AS correct FROM pred WHERE rn = 1"""
  }
}
