package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.{TextFunctions, VectorExpressions, VectorFunctions}
import org.apache.spark.sql.functions.call_function

/** Similarity search over an `array<float>` embedding column.
  *
  *  - `cosinePairs` / `bruteForceTopK`: exact baselines (all-pairs /
  *    query-cross-corpus). Correct at any scale but O(N·M); the norm is
  *    precomputed per row so each pair costs one dot product.
  *  - `lshTopK`: the scale path — random-hyperplane LSH buckets
  *    (hyperplanes derived from md5 so they're deterministic and
  *    engine-reproducible), candidates = same-bucket rows, exact
  *    re-rank within candidates. Bucket join replaces the cross join,
  *    turning O(N·M) into O(candidate volume).
  *
  * An IVF variant would swap bucket assignment for nearest-centroid
  * (k-means); the plumbing (assign → co-partition join → re-rank) is
  * identical, which is why LSH is the variant shipped first.
  */
object Ann {

  /** Codegen'd native dot (graft.functions.DoubleDot) — registered per
    * session, bit-identical to VectorFunctions.dot. */
  private def nat(df: DataFrame)(a: Column, b: Column): Column = {
    VectorExpressions.register(df.sparkSession)
    call_function("graft_dot", a, b)
  }

  /** All pairs (a < b) with cosine >= threshold. */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val e = emb.select(id.as("vec_id"), vec.as("v"),
      VectorFunctions.norm(vec).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        when(col("a.nrm") > 0 && col("b.nrm") > 0,
          nat(emb)(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact top-k neighbors (by cosine desc, id asc) for each query row;
    * self-matches excluded. */
  def bruteForceTopK(emb: DataFrame, id: Column, vec: Column,
      isQuery: Column, k: Int): DataFrame = {
    val e = emb.select(id.as("vec_id"), vec.as("v"), VectorFunctions.norm(vec).as("nrm"))
    val queries = emb.filter(isQuery).select(id.as("query_id"), vec.as("qv"),
      VectorFunctions.norm(vec).as("qnrm"))
    val scored = queries.join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qnrm") > 0 && col("nrm") > 0,
          nat(emb)(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rk").cast("int").as("rk"))
  }

  /** Deterministic pseudo-random hyperplane i over `dim` dimensions:
    * component j = (md5Long("i:j") mod 2001 - 1000) / 1000 ∈ [-1, 1]. */
  private def hyperplane(i: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(TextFunctions.md5Long(concat(lit(i.toString), lit(":"), j.cast(StringType))),
        lit(2001)) - 1000) / lit(1000.0))

  /** Sign-bucket of a vector under nPlanes hyperplanes, as a BIGINT. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).foldLeft(lit(0L)) { (acc, i) =>
      acc + when(
        aggregate(zip_with(vec.cast("array<double>"), hyperplane(i, dim), (x, h) => x * h),
          lit(0.0), (a, x) => a + x) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }

  /** Approximate top-k via MULTI-PROBE LSH: the corpus is bucketed once;
    * each query probes its own bucket plus every bucket at hamming
    * distance 1 (flip one plane's sign — the standard recall lever that
    * avoids building multiple hash tables). Candidates get an exact
    * cosine re-rank. The corpus side stays one row per vector — only
    * the (tiny) query side fans out nPlanes+1×. */
  def lshTopK(emb: DataFrame, id: Column, vec: Column, isQuery: Column,
      k: Int, dim: Int, nPlanes: Int = 8): DataFrame = {
    val e = emb.select(id.as("vec_id"), vec.as("v"),
      VectorFunctions.norm(vec).as("nrm"), lshBucket(vec, dim, nPlanes).as("bucket"))
    val probes = (0 until nPlanes).map(i => col("bucket0").bitwiseXOR(lit(1L << i)))
    val queries = emb.filter(isQuery).select(id.as("query_id"), vec.as("qv"),
      VectorFunctions.norm(vec).as("qnrm"), lshBucket(vec, dim, nPlanes).as("bucket0"))
      .select(col("query_id"), col("qv"), col("qnrm"),
        explode(array(col("bucket0") +: probes: _*)).as("bucket"))
    val scored = queries.join(e, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qnrm") > 0 && col("nrm") > 0,
          nat(emb)(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rk").cast("int").as("rk"))
  }

  /** IVF (inverted-file) approximate top-k: vectors are assigned to
    * their nearest "centroid" (here: a deterministic subset of the
    * corpus — vec_id < nCentroids — standing in for k-means centroids;
    * the assign→co-partition→re-rank plumbing is identical). Queries
    * probe their nProbe nearest centroids' partitions and re-rank
    * exactly within them. Centroids broadcast; the corpus shuffles once
    * on cluster_id — at 100 TB that's the partitioning you'd persist. */
  def ivfTopK(emb: DataFrame, id: Column, vec: Column, isQuery: Column,
      k: Int, nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val cents = emb.filter(id < nCentroids)
      .select(id.as("cent_id"), vec.as("cv"), VectorFunctions.norm(vec).as("cnrm"))
    def assign(df: DataFrame, idc: String, vc: String, nc: String, probes: Int): DataFrame = {
      val scored = df.join(broadcast(cents), expr("true"))
        .select(col(idc), col(vc), col(nc), col("cent_id"),
          when(col(nc) > 0 && col("cnrm") > 0,
            nat(emb)(col(vc), col("cv")) / (col(nc) * col("cnrm")))
            .as("cent_cos"))
      val w = Window.partitionBy(col(idc))
        .orderBy(col("cent_cos").desc_nulls_last, col("cent_id").asc)
      scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= probes)
        .drop("__r", "cent_cos")
    }
    val corpus = assign(
      emb.select(id.as("vec_id"), vec.as("v"), VectorFunctions.norm(vec).as("nrm")),
      "vec_id", "v", "nrm", probes = 1)
    val queries = assign(
      emb.filter(isQuery).select(id.as("query_id"), vec.as("qv"),
        VectorFunctions.norm(vec).as("qnrm")),
      "query_id", "qv", "qnrm", probes = nProbe)
    val scored = queries.join(corpus, Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qnrm") > 0 && col("nrm") > 0,
          nat(emb)(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rk").cast("int").as("rk"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  /** Shared dot/norm fragments: sequential-order double sums, matching
    * VectorFunctions bit-for-bit (validated: DuckDB list_sum is a left
    * fold like Spark's aggregate). */
  private def dotSql(a: String, b: String): String =
    s"list_sum([$a[i]*$b[i] FOR i IN range(1, len($a)+1)])"
  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosinePairsOracle(threshold: Double): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm FROM embeddings)
SELECT id_a, id_b, cosine FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, CASE WHEN a.nrm > 0 AND b.nrm > 0 THEN ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) END AS cosine FROM e a JOIN e b ON a.vec_id < b.vec_id) WHERE cosine >= $threshold"""

  def bruteForceTopKOracle(queryPred: String, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e WHERE $queryPred),
scored AS (SELECT query_id, vec_id, CASE WHEN qnrm > 0 AND nrm > 0 THEN ${dotSql("qv", "v")} / (qnrm * nrm) END AS cosine FROM q JOIN e ON query_id <> vec_id)
SELECT query_id, vec_id, cosine, CAST(rk AS INTEGER) AS rk FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, vec_id ASC) AS rk FROM scored) WHERE rk <= $k"""
}
