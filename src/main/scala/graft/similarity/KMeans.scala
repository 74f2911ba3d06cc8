package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions, VectorExpressions, VectorFunctions}

/** Deterministic Lloyd's k-means over an `array<float>` embedding
  * column, supplying real trained centroids for the IVF ANN path
  * (graft.similarity.Ann.ivfTopK).
  *
  * Everything is engineered to be bit-reproducible by an external SQL
  * engine (the DuckDB oracle in [[Ann.ivfTopKOracle]] replays the whole
  * fit), which is what turns the IVF recall story from "trust me" into
  * a hash-checked correctness row:
  *
  *  - **init**: the k corpus vectors with the smallest portable hash
  *    md5Long(vec_id) become centroids 0..k-1 (hash order) — a
  *    deterministic pseudo-random sample, no RNG state;
  *  - **assignment**: nearest centroid by cosine (ties → lowest
  *    cent_id), the same rule the IVF probe uses, so training and
  *    serving agree;
  *  - **update**: the mean goes through integer quantization —
  *    `floor(x * 2^20 + 0.5)` per component, summed as BIGINT —
  *    because integer sums are exact and order-independent on any
  *    partitioning (a 1000-executor sum of doubles is not), and both
  *    engines floor identical binary doubles identically. A decimal
  *    cast would NOT be safe here: float components can be dyadic
  *    rationals (m/2^17) whose decimal expansion lands exactly on the
  *    .5 rounding boundary at any fixed decimal scale, where rounding
  *    modes diverge across engines. The ~1e-6 quantization error is
  *    irrelevant to cluster geometry.
  *
  * Scale posture: each iteration is one pass over the corpus — a
  * broadcast-nested-loop against k centroid rows (map-only) plus one
  * (cent_id, dim) aggregation with map-side partials; only k×dim means
  * (a few KB) ever reach the driver, never corpus rows. At 100 TB you
  * would fit on a sample and broadcast the result; the per-iteration
  * plumbing is unchanged.
  */
object KMeans {

  /** Scaling constant for the exact-integer mean (2^20). */
  val QuantScale = 1048576.0

  /** Max BIGINT-safe row count per (cluster, dim) group for the
    * quantized sum: |x| ≲ 2 ⇒ |q| ≲ 2^21, so ~2^42 rows fit in a long
    * with headroom. Document-level sanity, not enforced. */
  val MaxSafeRows: Long = 1L << 42

  final case class Centroid(centId: Int, cv: Array[Double])

  /** Corpus projection used throughout: (vec_id, v: array<double>, nrm). */
  private def corpus(emb: DataFrame, id: Column, vec: Column): DataFrame =
    emb.select(id.as("vec_id"), vec.cast("array<double>").as("v"),
      VectorFunctions.norm(vec).as("nrm"))

  /** Deterministic init: the k vectors with the smallest
    * md5Long(CAST(vec_id AS VARCHAR)), in hash order → cent_id 0..k-1. */
  private def initCentroids(e: DataFrame, k: Int): Array[Centroid] = {
    val rows = e
      .select(col("vec_id"), col("v"),
        TextFunctions.md5Long(col("vec_id").cast(StringType)).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(k)
      .collect()
    rows.zipWithIndex.map { case (r, i) =>
      Centroid(i, r.getSeq[Double](1).toArray)
    }
  }

  /** Centroids as a small DataFrame (cent_id, cv, cnrm) for broadcast. */
  def centroidFrame(spark: SparkSession, cents: Array[Centroid]): DataFrame = {
    val rows = cents.map(c => Row(c.centId, c.cv.toSeq)).toSeq
    val schema = StructType(Seq(
      StructField("cent_id", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn("cnrm", VectorFunctions.norm(col("cv")))
  }

  /** Nearest-centroid assignment by cosine (ties → lowest cent_id):
    * the corpus broadcast-joins k centroid rows and keeps the top
    * `probes` centroids per vector. Shared by training (probes=1) and
    * the IVF query path (probes=nProbe).
    *
    * The |corpus|×k cosine matrix is THE flop hot spot of every
    * k-means-backed rung, so the dot runs through the native codegen'd
    * DoubleDot expression (bit-identical to the HOF form — the
    * AnnMultimodalSpec equivalence test is what licenses the swap
    * without touching any oracle) rather than the interpreted
    * zip_with/aggregate lambda: ~5× wall-time on the assignment
    * stage at probe scale. */
  def assign(e: DataFrame, cents: DataFrame, probes: Int,
      idCol: String = "vec_id", vCol: String = "v", nCol: String = "nrm"): DataFrame = {
    VectorExpressions.register(e.sparkSession)
    val scored = e.join(broadcast(cents), expr("true"))
      .select(col(idCol), col(vCol), col(nCol), col("cent_id"),
        when(col(nCol) > 0 && col("cnrm") > 0,
          call_function("graft_dot", col(vCol), col("cv")) / (col(nCol) * col("cnrm")))
          .as("cent_cos"))
    if (probes == 1) {
      // CORPUS path: a window over |corpus|×k scored rows would sort —
      // and, measured at a 300k×64 probe on small shuffle-partition
      // counts, SPILL tens of GB. The same winner falls out of a
      // map-side-combinable max(struct) aggregation: highest cosine,
      // ties to the LOWEST cent_id (the negated id inside the struct),
      // nulls coerced below the cosine range exactly like the window's
      // NULLS LAST. Shuffles one row per vector instead of k, no sort.
      // v/nrm are functionally dependent on the id, so first() is
      // deterministic here.
      scored.groupBy(col(idCol))
        .agg(first(col(vCol)).as(vCol), first(col(nCol)).as(nCol),
          max(struct(coalesce(col("cent_cos"), lit(-2.0)).as("c"),
            (-col("cent_id")).as("nc"))).as("__m"))
        .select(col(idCol), col(vCol), col(nCol),
          (-col("__m.nc")).as("cent_id"))
    } else {
      // QUERY path (probes = nProbe): same winner rule as probes=1 but
      // keeping the top `probes` — a bounded_top_k partial+final
      // aggregation ((cent_cos desc NULLS LAST, cent_id asc) == heap
      // order on (coalesced score, key); nulls coerced below the
      // cosine range exactly like the probes=1 struct). The query side
      // is bounded, but running it heap-form keeps EVERY ANN plan
      // window-free — PlanSpec pins no-WindowExec across the family,
      // which a window here would break.
      graft.functions.BoundedTopK.register(e.sparkSession)
      scored.groupBy(col(idCol))
        .agg(first(col(vCol)).as(vCol), first(col(nCol)).as(nCol),
          expr(s"bounded_top_k(coalesce(cent_cos, -2.0D), " +
            s"CAST(cent_id AS BIGINT), $probes)").as("__top"))
        .select(col(idCol), col(vCol), col(nCol),
          explode(col("__top")).as("t"))
        .select(col(idCol), col(vCol), col(nCol),
          col("t.key").cast("int").as("cent_id"))
    }
  }

  /** Lloyd's fit: returns the trained centroids after `iters`
    * assignment/update rounds. Only k×dim doubles cross the driver per
    * iteration (the centroids themselves — the broadcast side). Empty
    * clusters keep their previous centroid. */
  def fit(emb: DataFrame, id: Column, vec: Column, k: Int, iters: Int): Array[Centroid] = {
    val spark = emb.sparkSession
    val e = corpus(emb, id, vec).cache()
    try {
      var cents = initCentroids(e, k)
      for (_ <- 1 to iters) {
        val assigned = assign(e, centroidFrame(spark, cents), probes = 1)
        val means = assigned
          .select(col("cent_id"), posexplode(col("v")).as(Seq("j", "x")))
          .groupBy(col("cent_id"), col("j"))
          .agg(sum(floor(col("x") * lit(QuantScale) + lit(0.5)).cast(LongType)).as("s"),
            count(lit(1)).as("n"))
          .select(col("cent_id"), col("j"),
            (col("s").cast(DoubleType) / (col("n") * lit(QuantScale))).as("x"))
          .collect()
        val byCluster = means.groupBy(_.getInt(0))
        cents = cents.map { c =>
          byCluster.get(c.centId) match {
            case Some(rows) =>
              Centroid(c.centId,
                rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
            case None => c // empty cluster: carry the previous centroid
          }
        }
      }
      cents
    } finally e.unpersist()
  }

  // ---- DuckDB oracle fragments -------------------------------------------

  /** Sequential-fold dot product (DuckDB list_sum == Spark aggregate()
    * left fold, bit-for-bit — validated by the MinHash/ANN oracles). */
  private[graft] def dotSql(a: String, b: String): String =
    s"list_sum([$a[i]*$b[i] FOR i IN range(1, len($a)+1)])"

  /** CTEs replaying fit() bit-for-bit over table `embeddings`
    * (vec_id, embedding). Emits CTEs `e` (corpus) and `cents_$iters`
    * (cent_id, cv, cnrm) — the final trained centroids. */
  def oracleCtes(k: Int, iters: Int, dim: Int): String =
    "WITH " + ctes(k, iters, dim)

  /** The CTE list of [[oracleCtes]] WITHOUT the WITH keyword, with every
    * CTE name prefixed — composable, so one query can replay several
    * independent fits (the PQ oracle trains one codebook per subspace).
    * `vecSql` is the DOUBLE[]-typed vector expression to cluster;
    * `fromSql` the source relation carrying (vec_id, the vecSql inputs)
    * — a table name or an earlier CTE (the multimodal pipeline oracle
    * clusters decoded feature vectors, not the embeddings table). */
  def ctes(k: Int, iters: Int, dim: Int, prefix: String = "",
      vecSql: String = "CAST(embedding AS DOUBLE[])",
      fromSql: String = "embeddings"): String = {
    val cos = s"CASE WHEN e.nrm > 0 AND c.cnrm > 0 THEN ${dotSql("e.v", "c.cv")} / (e.nrm * c.cnrm) END"
    val sb = new StringBuilder
    sb ++= s"""${prefix}e AS (SELECT vec_id, $vecSql AS v, sqrt(${dotSql(vecSql, vecSql)}) AS nrm FROM $fromSql),
${prefix}cents_0 AS (SELECT CAST(row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS INTEGER) AS cent_id, v AS cv, nrm AS cnrm FROM (SELECT vec_id, v, nrm, CAST('0x'||substring(md5(CAST(vec_id AS VARCHAR)),1,15) AS BIGINT) AS h FROM ${prefix}e ORDER BY h ASC, vec_id ASC LIMIT $k))"""
    for (t <- 1 to iters) {
      val p = t - 1
      sb ++= s""",
${prefix}assign_$t AS (SELECT vec_id, v, cent_id FROM (SELECT e.vec_id, e.v, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($cos) DESC NULLS LAST, c.cent_id ASC) AS rn FROM ${prefix}e e, ${prefix}cents_$p c) WHERE rn = 1),
${prefix}means_$t AS (SELECT cent_id, j, CAST(sum(CAST(floor(v[j]*$QuantScale + 0.5) AS BIGINT)) AS DOUBLE) / (count(*)*$QuantScale) AS x FROM ${prefix}assign_$t, (SELECT unnest(range(1, ${dim + 1})) AS j) GROUP BY cent_id, j),
${prefix}cents_$t AS (SELECT c.cent_id, coalesce(m.cv, c.cv) AS cv, sqrt(${dotSql("coalesce(m.cv, c.cv)", "coalesce(m.cv, c.cv)")}) AS cnrm FROM ${prefix}cents_$p c LEFT JOIN (SELECT cent_id, list(x ORDER BY j ASC) AS cv FROM ${prefix}means_$t GROUP BY cent_id) m ON c.cent_id = m.cent_id)"""
    }
    sb.toString
  }
}
