package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Binary logistic-regression document classifier over hashed unigrams
  * — the trained linear quality/language filter rung (the GPT-3/LLaMA
  * corpus pipelines gate on exactly this shape of model: a cheap linear
  * classifier over hashed text features, trained on a labeled split,
  * applied corpus-wide). Full-batch gradient descent with a FIXED
  * iteration count and a HARD sigmoid `σ(z) = clamp(z/4 + 1/2, 0, 1)`
  * (the piecewise-linear sigmoid of low-precision ML runtimes), so the
  * entire fit is exact integer arithmetic in micro units: weights,
  * activations and gradients all live in scaled BIGINTs, every division
  * is an exact floor division, and the trained model is bit-identical
  * on any cluster, any partitioning, any engine — the same determinism
  * contract as [[Dsir]] / [[NaiveBayes]].
  *
  * Scale design: features stay in LONG FORM (doc_id, bucket, n) — no
  * wide vectors, no VectorUDT — so a 100 TB corpus trains through
  * `iterations` passes of {broadcast-join a (buckets+1)-row weight
  * table, per-doc hash-agg, per-bucket hash-agg}: shuffle per pass is
  * docs×buckets partials, model state on the driver is buckets+1 longs
  * (the KMeans-centroid collect shape — bounded however large the
  * corpus is). The scoring pass is one broadcast join + hash-agg.
  *
  * Gradient step (micro units): err = σ(z)·1e6 − y·1e6;
  * grad_b = Σ_docs err·n_b; w_b ← w_b − fdiv(grad_b, 2·N)   (lr = ½,
  * mean gradient). fdiv is floor division via pmod, identical across
  * engines regardless of native integer-division rounding.
  */
object Logistic {

  /** Train on `isTrain` docs with binary `label`, then score EVERY doc.
    * Output: (doc_id, z_micros, p_micros, pred, actual, correct). */
  def classify(docs: DataFrame, id: Column, text: Column, label: Column,
      isTrain: Column, buckets: Int = 64, iterations: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val B = buckets
    val base = docs.select(id.as("doc_id"), label.cast("boolean").as("y"),
      isTrain.as("is_train"), TextFunctions.tokens(lower(text)).as("toks"))
    // long-form features: hashed-unigram counts + a bias bucket (= B, n=1)
    val feats = base
      .select(col("doc_id"), col("y"), col("is_train"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("y"), col("is_train"),
        pmod(TextFunctions.md5Long(col("tok")), lit(B.toLong)).as("bucket"))
      .groupBy("doc_id", "y", "is_train", "bucket").agg(count(lit(1)).as("n"))
      .unionByName(base.select(col("doc_id"), col("y"), col("is_train"),
        lit(B.toLong).as("bucket"), lit(1L).as("n")))
    val train = feats.filter(col("is_train")).cache()
    val nTrain = train.select(countDistinct(col("doc_id"))).head.getLong(0)
    require(nTrain > 0, "empty training split")

    // fixed-iteration full-batch GD; model state = buckets+1 longs
    var w: Map[Long, Long] = (0L to B.toLong).map(_ -> 0L).toMap
    for (_ <- 1 to iterations) {
      val wDf = spark.createDataFrame(w.toSeq.map(kv => (kv._1, kv._2)))
        .toDF("bucket", "w_q")
      val grad = train.join(broadcast(wDf), Seq("bucket"))
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("n") * col("w_q")).as("z_q"))
        .withColumn("p_q",
          least(lit(1000000L), greatest(lit(0L),
            floor(col("z_q") / lit(4.0) + lit(500000.0)).cast("long"))))
        .withColumn("err_q", col("p_q") - when(col("y"), 1000000L).otherwise(0L))
        .join(train.select(col("doc_id"), col("bucket"), col("n")), Seq("doc_id"))
        .groupBy(col("bucket")).agg(sum(col("err_q") * col("n")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.map { case (b, wb) =>
        val g = grad.getOrElse(b, 0L)
        val d = 2L * nTrain
        b -> (wb - java.lang.Math.floorDiv(g, d))
      }
    }

    // score every document with the trained weights
    val wDf = spark.createDataFrame(w.toSeq.map(kv => (kv._1, kv._2)))
      .toDF("bucket", "w_q")
    feats.join(broadcast(wDf), Seq("bucket"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("n") * col("w_q")).as("z_micros"))
      .withColumn("p_micros",
        least(lit(1000000L), greatest(lit(0L),
          floor(col("z_micros") / lit(4.0) + lit(500000.0)).cast("long"))))
      .select(col("doc_id"), col("z_micros"), col("p_micros"),
        (col("p_micros") >= 500000L).as("pred"), col("y").as("actual"),
        ((col("p_micros") >= 500000L) === col("y")).as("correct"))
  }

  /** DuckDB replica of [[classify]] over table `documents`: label =
    * `labelPred`, train split = `trainPred` (doc-level SQL predicates).
    * The GD loop unrolls into one CTE chain per iteration — weights stay
    * relational (bucket, w) end to end. */
  def classifyOracleSql(labelPred: String, trainPred: String,
      buckets: Int = 64, iterations: Int = 3): String = {
    val B = buckets
    val head =
      raw"""WITH base AS (SELECT doc_id, ($labelPred) AS y, ($trainPred) AS is_train, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
feats AS (
  SELECT doc_id, y, is_train, bucket, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT doc_id, y, is_train, CAST('0x'||substring(md5(t),1,15) AS BIGINT) % $B AS bucket
        FROM (SELECT doc_id, y, is_train, unnest(toks) AS t FROM base))
  GROUP BY doc_id, y, is_train, bucket
  UNION ALL SELECT doc_id, y, is_train, CAST($B AS BIGINT), CAST(1 AS BIGINT) FROM base),
train AS (SELECT * FROM feats WHERE is_train),
ntr AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM train),
w0 AS (SELECT CAST(unnest(range(0, ${B + 1})) AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w_q)"""
    val iters = (1 to iterations).map { i =>
      val pw = s"w${i - 1}"
      raw""",
z$i AS (SELECT doc_id, y, CAST(sum(n * w_q) AS BIGINT) AS z_q FROM train JOIN $pw USING (bucket) GROUP BY doc_id, y),
e$i AS (SELECT doc_id, least(1000000, greatest(0, CAST(floor(z_q / 4.0 + 500000.0) AS BIGINT))) - (CASE WHEN y THEN 1000000 ELSE 0 END) AS err_q FROM z$i),
g$i AS (SELECT bucket, CAST(sum(err_q * n) AS BIGINT) AS g FROM e$i JOIN train USING (doc_id) GROUP BY bucket),
w$i AS (SELECT $pw.bucket, $pw.w_q - CAST((coalesce(g$i.g, 0) - ((coalesce(g$i.g, 0) % (2 * ntr.n) + (2 * ntr.n)) % (2 * ntr.n))) / (2 * ntr.n) AS BIGINT) AS w_q FROM $pw CROSS JOIN ntr LEFT JOIN g$i ON $pw.bucket = g$i.bucket)"""
    }.mkString
    val wN = s"w$iterations"
    head + iters +
      raw"""
SELECT doc_id, z_micros, p_micros, (p_micros >= 500000) AS pred, y AS actual, ((p_micros >= 500000) = y) AS correct
FROM (SELECT doc_id, y, z_micros, least(1000000, greatest(0, CAST(floor(z_micros / 4.0 + 500000.0) AS BIGINT))) AS p_micros
      FROM (SELECT doc_id, y, CAST(sum(n * w_q) AS BIGINT) AS z_micros FROM feats JOIN $wN USING (bucket) GROUP BY doc_id, y))"""
  }
}
