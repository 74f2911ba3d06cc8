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
}
