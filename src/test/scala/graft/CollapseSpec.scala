package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** CollapsingMergeTree FINAL semantics on explicit fixtures — the
  * cancel paths the q_collapsing oracle (which synthesizes a balanced
  * stream) cannot reach. */
class CollapseSpec extends SparkSpec {
  import spark.implicits._

  test("collapse keeps max-version +1 row, drops fully-cancelled keys") {
    val rows = Seq(
      // key "a": state v1, cancelled, state v2 → survives with v2
      ("a", 1L, "s1", 1), ("a", 1L, "s1", -1), ("a", 2L, "s2", 1),
      // key "b": state then cancel → fully cancelled, vanishes
      ("b", 1L, "s1", 1), ("b", 1L, "s1", -1),
      // key "c": lone cancel (malformed stream) → net <= 0, vanishes
      ("c", 1L, "s1", -1),
      // key "d": two states, no cancels → max version wins
      ("d", 1L, "old", 1), ("d", 2L, "new", 1)
    ).toDF("k", "ver", "state", "sign")

    val out = Dedup.collapse(rows, Seq(col("k")), col("sign"), col("ver"))
      .select("k", "ver", "state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

    assert(out === Set(("a", 2L, "s2"), ("d", 2L, "new")))
  }
}
