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
}
