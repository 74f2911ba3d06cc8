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
