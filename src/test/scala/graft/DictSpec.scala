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

  test("rangeSegments decomposition == direct as-of semantics, nested included") {
    // key 1: plain SCD2 — v0 [10,19], v1 opens at 17 (3-day overlap),
    //        v2 [25,30] after a [20,24] gap.
    // key 2: NESTED — wide [10,40] with narrow [15,20] inside: probes
    //        in [15,20] take the narrow (max start); [21,40] must fall
    //        BACK to the wide — the case a clip-to-next-start rewrite
    //        gets wrong and the gate's fixture never nests.
    val rdim = Seq(
      (1L, 10L, 19L, "a0"), (1L, 17L, 26L, "a1"), (1L, 25L, 30L, "a2"),
      (2L, 10L, 40L, "wide"), (2L, 15L, 20L, "narrow"))
      .toDF("k", "rs", "re", "nm")
    val segs = Dict.rangeSegments(rdim, col("k"), col("rs"), col("re"),
      col("nm"))
    // disjointness: no two segments of a key overlap
    val overl = segs.as("a").join(segs.as("b"),
      col("a.rk") === col("b.rk") && col("a.seg_lo") < col("b.seg_lo") &&
        col("b.seg_lo") <= col("a.seg_hi")).count()
    assert(overl === 0L, "segments must be disjoint per key")
    // probe every day 5..45 for both keys against the DIRECT semantics
    val probes = (5L to 45L).flatMap(d => Seq((1L, d), (2L, d))).toDF("k", "d")
    val got = Dict.dictGetRange(probes, col("k"), col("d"), segs, "v",
        lit("-")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    def direct(k: Long, d: Long): String = {
      val rows = Seq((1L, 10L, 19L, "a0"), (1L, 17L, 26L, "a1"),
        (1L, 25L, 30L, "a2"), (2L, 10L, 40L, "wide"), (2L, 15L, 20L, "narrow"))
        .filter(r => r._1 == k && r._2 <= d && d <= r._3)
      if (rows.isEmpty) "-" else rows.maxBy(_._2)._4
    }
    for (k <- Seq(1L, 2L); d <- 5L to 45L)
      assert(got((k, d)) === direct(k, d), s"k=$k d=$d")
    // spot-pin the interesting cells by hand
    assert(got((1L, 18L)) === "a1", "overlap resolves to the later version")
    assert(got((1L, 22L)) === "a1" && got((1L, 26L)) === "a2")
    assert(got((1L, 24L)) === "a1") // a1 runs to 26; a2 wins only from 25
    assert(got((2L, 18L)) === "narrow" && got((2L, 30L)) === "wide",
      "nested range falls back to the enclosing one after it closes")
    assert(got((1L, 31L)) === "-" && got((2L, 9L)) === "-")
  }
}
