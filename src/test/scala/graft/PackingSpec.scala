package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Hand-checkable ledger for concat-and-chunk sequence packing (the
  * registered q_pack_sequences/q_pack_stats oracle-gate it corpus-
  * wide; this pins the arithmetic on a fixture small enough to pack
  * by hand, plus partitioning invariance — the property the two-phase
  * prefix sum must preserve). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token counts by doc: 1→3, 2→5, 3→4, 4→2. seqLen 4.
  // stream positions: d1 [0,2], d2 [3,7], d3 [8,11], d4 [12,13].
  private def fixture = Seq(
    (1L, "a b c"), (2L, "a b c d e"), (3L, "a b c d"), (4L, "a b"))
    .toDF("doc_id", "text")

  test("ledger matches the hand packing at seqLen 4") {
    val out = Packing.packSequences(fixture, col("doc_id"), col("text"),
        seqLen = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(1L) === ((3L, 0L, 0L, 0L, 1L))) // [0,2]  seq 0, interior
    assert(out(2L) === ((5L, 0L, 3L, 1L, 2L))) // [3,7]  crosses 0→1
    assert(out(3L) === ((4L, 2L, 0L, 2L, 1L))) // [8,11] exactly seq 2
    assert(out(4L) === ((2L, 3L, 0L, 3L, 1L))) // [12,13] head of seq 3
  }

  test("packStats summarizes docs, tokens, sequences, crossings, last fill") {
    val stats = Packing.packStats(
      Packing.packSequences(fixture, col("doc_id"), col("text"), 4L), 4L)
      .collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2),
      stats.getLong(3), stats.getLong(4)) === ((4L, 14L, 4L, 1L, 2L)))
  }

  test("ledger is invariant to input partitioning (two-phase prefix sum)") {
    val big = spark.range(0, 5000).select(col("id").as("doc_id"),
      concat_ws(" ", sequence(lit(1), pmod(col("id"), lit(40)) + 1))
        .as("text"))
    val a = Packing.packSequences(big.repartition(1), col("doc_id"),
      col("text"), 256L).collect().map(_.toSeq).toSet
    val b = Packing.packSequences(big.repartition(23), col("doc_id"),
      col("text"), 256L).collect().map(_.toSeq).toSet
    assert(a === b, "packing must not depend on physical partitioning")
  }
}
