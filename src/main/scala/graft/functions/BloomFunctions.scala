package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's InjectRuntimeFilter, shipped in catalyst but not
  * registered in the public function registry). Registering them gives
  * the engine explicit SEMI-JOIN PRE-FILTERS: build a compact bloom
  * over one side's join keys, broadcast it, and drop definite-non-
  * matches before the shuffle — the classic runtime-filter pattern,
  * here under user control for cases the optimizer can't see (e.g.
  * filtering a micro-batch against a snapshot table before an
  * anti-join, see graft.streaming.CorpusIngest).
  *
  * Contract: the aggregated/probed value must be `xxhash64(key)` (the
  * expressions operate on 64-bit hashes, exactly as InjectRuntimeFilter
  * wraps them). `graft_might_contain` is true-biased: false positives
  * possible, false negatives never — callers keep an exact join for
  * the positives and may safely skip it for the negatives.
  */
object BloomFunctions {

  /** Register `graft_bloom_agg(xxhash64_col, est_items, num_bits)` and
    * `graft_might_contain(bloom, xxhash64_value)` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => {
        require(exprs.length == 3,
          "graft_bloom_agg(xxhash64_col, est_items, num_bits)")
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
          .toAggregateExpression()
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => {
        require(exprs.length == 2,
          "graft_might_contain(bloom, xxhash64_value)")
        BloomFilterMightContain(exprs(0), exprs(1))
      },
      "built-in")
  }
}
