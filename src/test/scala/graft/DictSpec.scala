package graft

import org.apache.spark.sql.functions._

import graft.ops.Dict

/** Hand-checkable fixtures for the ClickHouse-dictionary analogs (the
  * registered q_dict_hierarchy/q_dict_get oracle-gate them corpus-wide;
  * these pin the chain semantics: root convention, depth, truncation,
  * the dictIsIn self-inclusion, the dictGetOrDefault miss path). */
class DictSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq(
    (1L, 0L),   // root (parent 0 = none)
    (2L, 1L), (3L, 1L),
    (4L, 2L),
    (10L, 10L)) // self-cycle: must truncate at maxDepth, not hang
    .toDF("id", "parent")

  test("hierarchy: self-to-root chains, roots at depth 0, cycles truncate") {
    val out = Dict.hierarchy(dim, col("id"), col("parent"), maxDepth = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2), r.getInt(3)))
    assert(out(0) === ((1L, List(1L), 1L, 0)))
    assert(out(1) === ((2L, List(2L, 1L), 1L, 1)))
    assert(out(2) === ((3L, List(3L, 1L), 1L, 1)))
    assert(out(3) === ((4L, List(4L, 2L, 1L), 1L, 2)))
    // the cycle walks itself maxDepth times and stops
    assert(out(4) === ((10L, List.fill(5)(10L), 10L, 4)))
  }

  test("dictIsIn: ancestor anywhere in the chain, including the key itself") {
    val h = Dict.hierarchy(dim, col("id"), col("parent"), maxDepth = 4)
    val row = h.filter(col("id") === 4L)
      .select(Dict.dictIsIn(col("path"), 1L).as("a"),
        Dict.dictIsIn(col("path"), 3L).as("b"),
        Dict.dictIsIn(col("path"), 4L).as("c"))
      .collect().head
    assert(row.getBoolean(0), "4 is under root 1")
    assert(!row.getBoolean(1), "3 is a sibling branch")
    assert(row.getBoolean(2), "equal-key behavior: 4 is 'in' 4")
  }

  test("dictGetChildren/descendantCounts: inverse edges, leaves at zero") {
    val kids = Dict.dictGetChildren(dim, col("id"), col("parent"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
    assert(kids.toSeq === Seq(
      (1L, List(2L, 3L)), (2L, List(4L)), (3L, Nil), (4L, Nil),
      (10L, List(10L)))) // the self-cycle is its own child
    val h = Dict.hierarchy(dim, col("id"), col("parent"), maxDepth = 4)
    val nd = Dict.descendantCounts(h).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 1 has {2, 3, 4}; 2 has {4}; the cycle's truncated chain counts
    // its own repeats (4 depth->=1 occurrences of 10)
    assert(nd.toSeq === Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 0L), (10L, 4L)))
  }

  test("dictGetOrDefault: hit resolves the attribute, miss takes the default") {
    val facts = Seq(2L, 99L).toDF("k")
    val named = dim.select(col("id"), concat(lit("n"), col("id")).as("nm"))
    val out = Dict.dictGetOrDefault(facts, col("k"), named, col("id"),
        col("nm"), "name", lit("?"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((2L, "n2"), (99L, "?")))
  }
}
