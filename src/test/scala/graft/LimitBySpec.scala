package graft

import org.apache.spark.sql.functions._

import graft.ops.LimitBy

/** Semantics + plan-shape fixtures for the `LIMIT n OFFSET m BY key`
  * analog (the registered q_limit_by oracle-gates it corpus-wide). */
class LimitBySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (grp, id, score) — grp "a" has 5 rows with score ties at 2.0
    ("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 2.0), ("a", 4L, 1.0),
    ("a", 5L, 0.5),
    ("b", 6L, 9.0), ("b", 7L, 8.0),
    ("c", 8L, 4.0)
  ).toDF("grp", "id", "score")

  test("limitBy = row_number pagination under (score desc, key asc)") {
    val out = LimitBy.limitBy(fixture, Seq("grp"), col("score"), col("id"),
        n = 2, offset = 1)
      .select(col("grp"), col("id"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // a: rank0=id1(3.0), rank1=id2(2.0 tie, lower id first), rank2=id3
    // b: rank0=id6, rank1=id7;  c: rank0=id8 only → offset 1 drops it
    assert(out === Set(("a", 2L, 1), ("a", 3L, 2), ("b", 7L, 1)))
  }

  test("null score or null rowKey rows are skipped, not ranked") {
    val df = Seq(
      (Some("a"), Some(1L), Some(5.0)), (Some("a"), Some(2L), None),
      (Some("a"), None, Some(9.0)), (Some("a"), Some(3L), Some(1.0))
    ).toDF("grp", "id", "score")
    val out = LimitBy.limitBy(df, Seq("grp"), col("score"), col("id"), n = 3)
      .select(col("id"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // id2 (null score) and the null-id row never rank; id1 then id3
    assert(out === Set((1L, 0), (3L, 1)))
  }

  test("existing pos/_s/_rk columns don't collide; rankCol is checkable") {
    val df = fixture
      .withColumn("pos", lit("occupied"))
      .withColumn("_s_g0", lit(0)).withColumn("_rk_g0", lit(0))
    intercept[IllegalArgumentException] {
      LimitBy.limitBy(df, Seq("grp"), col("score"), col("id"), n = 1)
    }
    val out = LimitBy.limitBy(df, Seq("grp"), col("score"), col("id"),
      n = 1, rankCol = "rnk")
    assert(out.columns.count(_ == "pos") === 1) // the caller's, untouched
    val rows = out.select(col("grp"), col("id"), col("rnk"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getString(3)))
    assert(rows.toSet === Set(("a", 1L, 0, "occupied"),
      ("b", 6L, 0, "occupied"), ("c", 8L, 0, "occupied")))
  }

  test("limitByWithTies extends past n on boundary ties, per group") {
    // grp a, n=2: ranks are id1(3.0), id2(2.0), id3(2.0 — TIES the
    // boundary) → 3 rows. b has 2 rows (= n). c has 1 (< n → whole).
    val out = LimitBy.limitByWithTies(fixture, Seq("grp"), col("score"),
        col("id"), n = 2)
      .select(col("grp"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 6L), ("b", 7L), ("c", 8L)))
  }

  test("limitByWithTies global form (empty groupCols) = statement LIMIT WITH TIES") {
    val out = LimitBy.limitByWithTies(fixture, Seq.empty, col("score"),
        col("id"), n = 3)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // global ranks: id6(9.0), id7(8.0), id8(4.0) — no tie at 4.0
    assert(out === Set(6L, 7L, 8L))
    val tied = LimitBy.limitByWithTies(fixture, Seq.empty, col("score"),
        col("id"), n = 4)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // 4th is id1(3.0); no tie → exactly 4. n=5 boundary 2.0 ties id2+id3
    assert(tied === Set(6L, 7L, 8L, 1L))
    val tied5 = LimitBy.limitByWithTies(fixture, Seq.empty, col("score"),
        col("id"), n = 5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(tied5 === Set(6L, 7L, 8L, 1L, 2L, 3L))
  }

  test("limitByWithTies skips null scores and never routes through a window") {
    val df = Seq(
      (Some("a"), Some(1L), Some(5.0)), (Some("a"), Some(2L), None),
      (Some("a"), None, Some(9.0)), (Some("a"), Some(3L), Some(1.0))
    ).toDF("grp", "id", "score")
    val out = LimitBy.limitByWithTies(df, Seq("grp"), col("score"),
        col("id"), n = 1)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out === Set(1L)) // null-score and null-key rows never rank
    val plan = LimitBy.limitByWithTies(fixture, Seq("grp"), col("score"),
      col("id"), n = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "WITH TIES must keep the bounded-heap discipline, never a window sort")
  }

  test("plan: bounded-heap aggregate, no per-key window sort") {
    val plan = LimitBy.limitBy(fixture, Seq("grp"), col("score"), col("id"),
      n = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "limitBy must never route through a WindowExec — that is the " +
        "hot-key buffer hazard it exists to avoid")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected the TypedImperativeAggregate path, got:\n$plan")
  }
}
