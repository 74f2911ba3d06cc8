package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization — the memory-compression rung of the ANN
  * ladder (IVF-PQ is how billion-vector indexes fit in RAM): the
  * vector splits into `m` contiguous subspaces, each subspace trains
  * its own k-entry codebook ([[KMeans.fit]] — deterministic init,
  * exact-integer means), and every vector is represented by its `m`
  * nearest-sub-centroid ids — log2(k)·m bits instead of 32·dim.
  *
  * Scale posture: training runs m small k-means fits (each a
  * broadcast-vs-k-centroids map pass over the corpus — at 100 TB you
  * fit on a sample); encoding is one map pass per subspace against a
  * broadcast codebook, and the per-subspace code frames join back on
  * vec_id — AQE coalesces these k-way same-key joins into one shuffle
  * stage of slim (id, code) pairs, never the vectors themselves.
  *
  * Determinism: everything inherits [[KMeans]]'s bit-reproducibility
  * (md5 init order, quantized-integer means, cosine ties to the lowest
  * cent_id), so the full PQ encoding replays in DuckDB and the codes
  * hash-match — the same treatment that turned IVF recall from
  * "trust me" into a checked correctness row.
  */
object Pq {

  /** Per-vector PQ codes. Output: (vec_id, code_0 … code_{m-1}), each
    * code the nearest centroid id (cosine, ties → lowest id) in that
    * subspace's trained codebook. */
  def codes(emb: DataFrame, id: Column, vec: Column, m: Int, k: Int,
      iters: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val parts = (0 until m).map { i =>
      val sv = slice(vec, i * sub + 1, sub)
      val cents = KMeans.centroidFrame(emb.sparkSession,
        KMeans.fit(emb, id, sv, k, iters))
      KMeans.assign(
        emb.select(id.as("vec_id"), sv.cast("array<double>").as("v"),
          VectorFunctions.norm(sv).as("nrm")),
        cents, probes = 1)
        .select(col("vec_id"), col("cent_id").as(s"code_$i"))
    }
    parts.reduce((a, b) => a.join(b, "vec_id"))
  }

  /** IVF-PQ top-k — the billion-scale ANN flagship (how FAISS-style
    * indexes search 10⁹ vectors in RAM): IVF clustering prunes the
    * candidate set to the query's nProbe nearest cells, and within
    * them similarity is computed ASYMMETRICALLY (exact query against
    * the PQ-RECONSTRUCTED corpus vector — the ADC scheme, which beats
    * quantizing both sides). The corpus's full vectors are needed only
    * at index build; search touches codes + codebooks.
    *
    * Scale posture: both codebook kinds broadcast (k and m×k rows);
    * the corpus partitions once by IVF cell; a query fans out nProbe×
    * and joins co-clustered — identical shape to [[Ann.ivfTopK]], but
    * the join side carries reconstructed (deterministic) vectors built
    * from broadcast codebooks instead of raw corpus vectors.
    *
    * Determinism: reconstruction concatenates quantized-integer-mean
    * sub-centroids, so every approx_cosine is an IEEE-identical double
    * in any engine — the DuckDB oracle replays the whole index build
    * and search, hash-matching end to end. */
  def ivfPqTopK(emb: DataFrame, id: Column, vec: Column, isQuery: Column,
      k: Int, nCentroids: Int = 8, nProbe: Int = 2, ivfIters: Int = 3,
      m: Int = 4, pqK: Int = 8, pqIters: Int = 2, dim: Int = 64): DataFrame = {
    require(m > 0 && dim % m == 0)
    val spark = emb.sparkSession
    val sub = dim / m
    val ivfCents = KMeans.centroidFrame(spark,
      KMeans.fit(emb, id, vec, nCentroids, ivfIters))
    val corpusIvf = KMeans.assign(
      emb.select(id.as("vec_id"), vec.cast("array<double>").as("v"),
        VectorFunctions.norm(vec).as("nrm")),
      ivfCents, probes = 1)
      .select(col("vec_id"), col("cent_id"))
    // per-subspace codebooks; each vector's cell is reconstructed from
    // its nearest sub-centroid (broadcast joins, k rows each)
    val recon = (0 until m).foldLeft(corpusIvf) { (acc, i) =>
      val sv = slice(vec, i * sub + 1, sub)
      val book = KMeans.centroidFrame(spark,
        KMeans.fit(emb, id, sv, pqK, pqIters))
      val coded = KMeans.assign(
        emb.select(id.as("vec_id"), sv.cast("array<double>").as("v"),
          VectorFunctions.norm(sv).as("nrm")),
        book, probes = 1)
        .select(col("vec_id"), col("cent_id").as("__code"))
        .join(broadcast(book.select(col("cent_id").as("__code"),
          col("cv").as(s"__cv_$i"))), "__code")
        .select(col("vec_id"), col(s"__cv_$i"))
      acc.join(coded, "vec_id")
    }
      .withColumn("rv", concat((0 until m).map(i => col(s"__cv_$i")): _*))
      .withColumn("rnrm", VectorFunctions.norm(col("rv")))
      .select(col("vec_id"), col("cent_id"), col("rv"), col("rnrm"))
    val queries = KMeans.assign(
      emb.filter(isQuery).select(id.as("query_id"),
        vec.cast("array<double>").as("qv"), VectorFunctions.norm(vec).as("qnrm")),
      ivfCents, probes = nProbe, idCol = "query_id", vCol = "qv", nCol = "qnrm")
    val scored = queries.join(recon, Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qnrm") > 0 && col("rnrm") > 0,
          VectorFunctions.dot(col("qv"), col("rv")) / (col("qnrm") * col("rnrm")))
          .as("approx_cosine"))
    // the ADC re-rank was the engine's one measured window spill
    // (0.7–3.6 GB/query-group at the 2M-vector rung): per-query
    // candidates are corpus/nCells × nProbe — the bounded heap is the
    // only shape whose task memory stays O(k) there ([[Ann.heapTopK]])
    Ann.heapTopK(scored, k, scoreName = "approx_cosine")
  }

  /** DuckDB SQL replaying [[ivfPqTopK]] — IVF fit + m PQ fits +
    * reconstruction + ADC search, one query. */
  def ivfPqOracle(queryPred: String, k: Int, nCentroids: Int = 8,
      nProbe: Int = 2, ivfIters: Int = 3, m: Int = 4, pqK: Int = 8,
      pqIters: Int = 2, dim: Int = 64): String = {
    val sub = dim / m
    val ivf = KMeans.ctes(nCentroids, ivfIters, dim, prefix = "ivf_")
    val fits = (0 until m).map { i =>
      val lo = i * sub + 1
      val hi = (i + 1) * sub
      KMeans.ctes(pqK, pqIters, sub, prefix = s"s${i}_",
        vecSql = s"(CAST(embedding AS DOUBLE[]))[$lo:$hi]")
    }.mkString(",\n")
    val cosIvf = s"CASE WHEN e.nrm > 0 AND c.cnrm > 0 THEN ${KMeans.dotSql("e.v", "c.cv")} / (e.nrm * c.cnrm) END"
    val codeCtes = (0 until m).map { i =>
      s"""ccv_$i AS (SELECT vec_id, cv AS cv_$i FROM (SELECT e.vec_id, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($cosIvf) DESC NULLS LAST, c.cent_id ASC) AS rn FROM s${i}_e e, s${i}_cents_$pqIters c) a JOIN s${i}_cents_$pqIters b ON a.cent_id = b.cent_id WHERE a.rn = 1)"""
    }.mkString(",\n")
    val rvConcat = (0 until m).map(i => s"cv_$i").mkString(" || ")
    val joins = (1 until m).map(i => s"JOIN ccv_$i USING (vec_id)").mkString(" ")
    s"""WITH $ivf,
$fits,
corpus_ivf AS (SELECT vec_id, cent_id FROM (SELECT e.vec_id, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($cosIvf) DESC NULLS LAST, c.cent_id ASC) AS rn FROM ivf_e e, ivf_cents_$ivfIters c) WHERE rn = 1),
$codeCtes,
recon AS (SELECT vec_id, cent_id, rv, sqrt(${KMeans.dotSql("rv", "rv")}) AS rnrm FROM (SELECT corpus_ivf.vec_id, corpus_ivf.cent_id, $rvConcat AS rv FROM corpus_ivf JOIN ccv_0 USING (vec_id) $joins)),
queries AS (SELECT query_id, qv, qnrm, cent_id FROM (SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($cosIvf) DESC NULLS LAST, c.cent_id ASC) AS rn FROM ivf_e e, ivf_cents_$ivfIters c WHERE $queryPred) WHERE rn <= $nProbe),
scored AS (SELECT query_id, recon.vec_id, CASE WHEN qnrm > 0 AND rnrm > 0 THEN ${KMeans.dotSql("qv", "rv")} / (qnrm * rnrm) END AS approx_cosine FROM queries JOIN recon ON queries.cent_id = recon.cent_id WHERE query_id <> recon.vec_id)
SELECT query_id, vec_id, approx_cosine, CAST(rk AS INTEGER) AS rk FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY approx_cosine DESC NULLS LAST, vec_id ASC) AS rk FROM scored) WHERE rk <= $k"""
  }

  /** DuckDB SQL replaying [[codes]] exactly over table `embeddings`
    * (vec_id, embedding): m prefixed k-means fits, one assignment per
    * subspace, joined on vec_id. */
  def codesOracle(m: Int, k: Int, iters: Int, dim: Int): String = {
    require(m > 0 && dim % m == 0)
    val sub = dim / m
    val fits = (0 until m).map { i =>
      val lo = i * sub + 1
      val hi = (i + 1) * sub
      KMeans.ctes(k, iters, sub, prefix = s"s${i}_",
        vecSql = s"(CAST(embedding AS DOUBLE[]))[$lo:$hi]")
    }.mkString(",\n")
    val cos = s"CASE WHEN e.nrm > 0 AND c.cnrm > 0 THEN ${KMeans.dotSql("e.v", "c.cv")} / (e.nrm * c.cnrm) END"
    val codeCtes = (0 until m).map { i =>
      s"code_$i AS (SELECT vec_id, cent_id AS code_$i FROM (SELECT e.vec_id, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($cos) DESC NULLS LAST, c.cent_id ASC) AS rn FROM s${i}_e e, s${i}_cents_$iters c) WHERE rn = 1)"
    }.mkString(",\n")
    val joins = (1 until m).map(i => s"JOIN code_$i USING (vec_id)").mkString(" ")
    s"""WITH $fits,
$codeCtes
SELECT vec_id, ${(0 until m).map(i => s"code_$i").mkString(", ")} FROM code_0 $joins"""
  }
}
