package graft

import org.apache.spark.sql.functions._

import graft.dedup.Components

/** Connected-components labeling over planted graphs. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long],
      maxIter: Int = 25): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        nodes.toDF("id"), col("id"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and isolated nodes label with component minimum") {
    // chain 1-2-3-4 (transitive: 1~4 never appears as an edge),
    // clique {10,11,12}, isolated 20
    val labels = cc(
      edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)),
      nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long path converges well under maxIter (pointer jumping compresses)") {
    // path 0-1-2-...-40: plain propagation needs ~40 rounds; with the
    // per-round pointer jump the label front at least doubles per round,
    // so 12 rounds must suffice.
    val n = 41L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val labels = cc(edges, 0L until n, maxIter = 12)
    assert(labels.values.toSet == Set(0L), s"unconverged: ${labels.filter(_._2 != 0L)}")
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val labels = cc(
      edges = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)),
      nodes = Seq(5L, 6L))
    assert(labels == Map(5L -> 5L, 6L -> 5L))
  }

  test("dupGroups keeps exactly one representative per group") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Components.dupGroups(docs, col("doc_id"), pairs,
      col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L) == ((1L, 1L, 3L, true)))
    assert(byDoc(2L) == ((2L, 1L, 3L, false)))
    assert(byDoc(3L) == ((3L, 1L, 3L, false)))
    assert(byDoc(4L) == ((4L, 4L, 1L, true)))
    assert(byDoc(5L) == ((5L, 5L, 1L, true)))
    // exactly one keep per component
    out.groupBy(_._2).foreach { case (comp, rows) =>
      assert(rows.count(_._4) == 1, s"component $comp keeps ${rows.count(_._4)}")
    }
  }
}
