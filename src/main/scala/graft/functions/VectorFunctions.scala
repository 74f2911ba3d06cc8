package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Dense-vector math over `array<float>` embedding columns, as Column
  * expressions (higher-order functions, codegen'd — no UDF).
  *
  * Elements are cast to double BEFORE multiply/accumulate and summed in
  * index order, so the result is bit-identical to a sequential C/DuckDB
  * double loop — required for oracle hash-matching and good practice
  * anyway (float accumulation drifts at 100 TB scale).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Sequential-order double dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is 0. Norms are bound
    * once (each appears in both the guard and the division — inlined,
    * each would fold its whole array twice). */
  def cosine(a: Column, b: Column): Column =
    TextFunctions.bindOnce(norm(a)) { na =>
      TextFunctions.bindOnce(norm(b)) { nb =>
        when(na > 0 && nb > 0, dot(a, b) / (na * nb))
          .otherwise(lit(null).cast(DoubleType))
      }
    }

  /** Feature-hashing vectorizer (the "hashing trick"): a token array
    * becomes a `dim`-bucket term-count vector, v[j] = |{t : md5(t) mod
    * dim = j}| as double. Deterministic (no fitted vocabulary, no
    * driver state), so new corpus shards embed identically on any
    * executor — the property that makes it the bootstrap embedder for
    * chunk retrieval before a learned model exists. The bucket list is
    * bound once (md5 per token computed once, not once per lane). */
  def hashingVectorizer(toks: Column, dim: Int): Column =
    TextFunctions.bindOnce(
      transform(toks, t => pmod(TextFunctions.md5Long(t), lit(dim.toLong)))) {
      bkts =>
        transform(sequence(lit(0), lit(dim - 1)), j =>
          size(filter(bkts, b => b === j.cast("long"))).cast("double"))
    }

  /** DuckDB twin of [[hashingVectorizer]] over a token-list SQL expr. */
  def hashingVectorizerSql(toksSql: String, dim: Int): String =
    s"[CAST(len(list_filter(list_transform($toksSql, t -> CAST('0x'||substring(md5(t),1,15) AS BIGINT) % $dim), b -> b = j)) AS DOUBLE) FOR j IN range(0, $dim)]"

  /** ClickHouse `avgForEach` analog: per-group ELEMENTWISE vector
    * mean, integer-exact — components quantize to 1e6 µ-units before
    * summation (float accumulation order can never differ between
    * engines), per-(group, position) long sums aggregate
    * partial+final, and the vector reassembles in position order from
    * a dim-bounded collect. The natural centroid/"mean embedding per
    * cluster" aggregate for the embeddings table.
    *
    * Output: (g, n BIGINT rows averaged, mean_vec ARRAY<DOUBLE> r6).
    * Ragged inputs: each position averages over the rows that HAVE it
    * (document divergence from a strict equal-length contract). */
  def vectorMeanBy(df: org.apache.spark.sql.DataFrame, group: Column,
      vec: Column): org.apache.spark.sql.DataFrame = {
    def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val ex = df.select(group.as("g"), posexplode(asDouble(vec)))
      .select(col("g"), col("pos"),
        round(col("col") * lit(1e6)).cast("long").as("xq"))
    val sums = ex.groupBy(col("g"), col("pos"))
      .agg(sum(col("xq")).as("s"), count(lit(1)).as("n"))
    sums.groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          e => r6(e.getField("s").cast("double") /
            e.getField("n").cast("double") / lit(1e6))).as("mean_vec"))
  }

  /** DuckDB replica of the flattened [[vectorMeanBy]] projection over
    * (embeddings.label, embeddings.embedding) — one row per (group,
    * position), the gate-sortable form. */
  val vectorMeanByFlatOracleSql: String =
    """WITH ex0 AS (SELECT label AS g, unnest(range(0, len(embedding))) AS pos, unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
ex AS (SELECT g, pos, CAST(round(x*1e6) AS BIGINT) AS xq FROM ex0),
s AS (SELECT g, pos, sum(xq) AS s, count(*) AS n FROM ex GROUP BY 1, 2),
m AS (SELECT g, pos, n, floor(CAST(s AS DOUBLE)/CAST(n AS DOUBLE)/1e6*1e6+0.5)/1e6 AS mv FROM s),
t AS (SELECT g, max(n) AS n FROM m GROUP BY g)
SELECT m.g, CAST(t.n AS BIGINT) AS n, CAST(m.pos AS BIGINT) AS pos, m.mv AS mean_val
FROM m JOIN t ON m.g = t.g"""
}
