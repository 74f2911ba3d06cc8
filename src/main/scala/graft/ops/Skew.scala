package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: the salt-and-replicate technique for a
  * shuffle join whose key distribution is too skewed for one reducer
  * (the complement of [[Rollups.saltedSum]] for joins, and the manual
  * fallback when AQE's skew-join split can't apply — e.g. a
  * ShuffledHashJoin or a key so hot one split still overflows).
  *
  * The FACT side gains a salt in [0, buckets) derived from a stable
  * per-row column (deterministic — no rand(), so retries/speculative
  * tasks agree); the DIM side is replicated `buckets`× with every salt
  * value. The join key becomes (key, salt): a key holding N rows now
  * spreads over `buckets` reducers at the cost of dim×buckets shuffle
  * volume — the standard trade, worth it when fact-side skew dominates.
  * The salt never escapes: output columns equal the unsalted join's,
  * and the result is row-identical to it (what the oracle checks). */
object Skew {

  /** Inner-join `fact` to `dim` on `key` with `buckets`-way salting.
    * `saltSrc` must be a stable fact-side expression (any per-row
    * value; quality of spread matters, correctness doesn't). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
