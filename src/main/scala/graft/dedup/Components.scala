package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding verified
  * pairs) into duplicate GROUPS so a corpus clean can keep exactly one
  * representative per group. The reference pipeline stops at
  * pair-level LWW collapse (ClickHouse ReplacingMergeTree,
  * /root/reference/sql/clickhouse-init.sql:21–22); transitive grouping
  * is the corpus-scale generalization every training-data dedup needs
  * (A ~ B ~ C must collapse to ONE kept doc even when A ~ C was never
  * emitted as a pair).
  *
  * Algorithm: min-label propagation with pointer jumping, pure
  * DataFrame ops (no GraphX, no RDDs):
  *   - every node starts labeled with its own id;
  *   - each round a node takes the min label over itself and its
  *     neighbors (one shuffle on dst), then labels are path-compressed
  *     by one `label := label(label)` join (pointer jumping), giving
  *     the O(log n)-round convergence of the hash-to-min family rather
  *     than O(diameter);
  *   - each round ends in `localCheckpoint` so the plan/lineage stays
  *     O(1) deep regardless of iteration count (an iterative join
  *     without this re-executes the whole history every round);
  *   - convergence is detected by a SINGLE scalar: sum(label) is
  *     strictly decreasing while any label changes (labels only ever
  *     decrease), so an unchanged sum — compared as exact decimal, no
  *     overflow at any node count — is a sound fixpoint test costing
  *     one tiny aggregate per round, not a join.
  *
  * 100 TB posture: per round this is one shuffle of the edge list on
  * dst plus one shuffle of the label table on id — both key-partitioned
  * hash joins Catalyst/AQE can plan; nothing is ever collected except
  * the one convergence scalar. Near-dup graphs are unions of
  * near-cliques, so rounds-to-converge is small (≤ ~log of the largest
  * chain); `maxIter` bounds the worst case.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Label every node with the minimum node id in its connected
    * component. `edges` must have two Long columns (any orientation,
    * self-loops and duplicates tolerated); `nodes` is one Long id
    * column covering at least the edge endpoints (isolated nodes keep
    * their own id as the component). Output: (id, component).
    *
    * If `maxIter` is exhausted before the fixpoint a WARNING is logged
    * and the partially-merged labels are returned — callers needing a
    * hard signal should use [[connectedComponentsConverged]]. */
  def connectedComponents(edges: DataFrame, src: Column, dst: Column,
      nodes: DataFrame, nodeId: Column, maxIter: Int = 25): DataFrame =
    connectedComponentsConverged(edges, src, dst, nodes, nodeId, maxIter)._1

  /** [[connectedComponents]] plus the convergence flag: `false` means
    * the iteration cap fired before the fixpoint, so labels may still
    * hold multiple representatives per true component (downstream
    * dupGroups would under-merge). */
  def connectedComponentsConverged(edges: DataFrame, src: Column, dst: Column,
      nodes: DataFrame, nodeId: Column, maxIter: Int = 25): (DataFrame, Boolean) = {
    require(maxIter > 0)
    val e = edges.select(src.as("src"), dst.as("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()

    var labels = nodes.select(nodeId.as("id"), nodeId.as("comp")).localCheckpoint()
    def labelSum(l: DataFrame): java.math.BigDecimal = {
      val d = l.agg(sum(col("comp").cast(DecimalType(38, 0)))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }

    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // labels are node-count-proportional: the corpus-side pin
      // (sort-merge — spill-safe, never broadcast; SCALE.md findings
      // one/seven) applies each round
      val nbrMin = und.join(graft.ops.Joins.corpusSide(labels),
          col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_min"))
      val stepped = labels
        .join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
      // pointer jumping: follow the label one hop (comp := comp(comp))
      val jumped = stepped.as("a")
        .join(stepped.select(col("id").as("jid"), col("comp").as("jcomp")).as("j"),
          col("a.comp") === col("jid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("jcomp"), col("a.comp")).as("comp"))
      val next = jumped.localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      labels = next
      prevSum = nextSum
      it += 1
    }
    if (!converged)
      log.warn(s"connectedComponents hit maxIter=$maxIter before the " +
        "fixpoint — labels are partially merged (components may be split)")
    (labels, converged)
  }

  /** Duplicate grouping for a document table: components over a
    * verified near-dup pair list, every document labeled, plus the
    * group size and a keep flag (representative = min doc_id in the
    * component). Output: (doc_id, component, group_size, keep). */
  def dupGroups(docs: DataFrame, id: Column, pairs: DataFrame,
      a: Column, b: Column, maxIter: Int = 25): DataFrame = {
    val comps = connectedComponents(pairs, a, b, docs.select(id.as("__nid")),
      col("__nid"), maxIter)
    val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("group_size"))
    comps.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("component"),
        col("group_size"), (col("id") === col("comp")).as("keep"))
  }

  /** Duplicate-group CANONICALIZATION: like [[dupGroups]], but the kept
    * representative is the highest-QUALITY member of each component
    * (tiebreak: lowest doc_id) rather than the lowest id — the "which
    * copy do we actually train on" step of a dedup pass, where
    * near-dups differ by truncation/boilerplate and keeping the best
    * copy beats keeping the first. Quality is the exact integer
    * micro-quality ([[graft.ops.Selection.qualityMicros]]).
    *
    * Scale: after the component labels, one component-keyed aggregate
    * (max over a (quality, -id) struct — the argmax protocol) and a
    * co-partitioned join back on component. The best-per-component
    * table is component-count-sized — corpus-proportional, so the join
    * back carries the shuffle_hash pin (the SCALE.md mis-broadcast
    * class). */
  def canonicalize(docs: DataFrame, id: Column, text: Column,
      pairs: DataFrame, a: Column, b: Column, maxIter: Int = 25): DataFrame = {
    val comps = connectedComponents(pairs, a, b, docs.select(id.as("__nid")),
      col("__nid"), maxIter)
    val q = docs.select(id.as("doc_id"),
      graft.ops.Selection.qualityMicros(text).as("q_micros"))
    val labeled = comps.select(col("id").as("doc_id"), col("comp").as("component"))
      .join(q, "doc_id")
    val best = labeled.groupBy(col("component")).agg(
      count(lit(1)).as("group_size"),
      max(struct(col("q_micros").as("q"), (-col("doc_id")).as("nid"))).as("best"))
    labeled.join(graft.ops.Joins.corpusSide(best), Seq("component"))
      .select(col("doc_id"), col("component"), col("group_size"), col("q_micros"),
        (col("q_micros") === col("best").getField("q") &&
          col("doc_id") === -col("best").getField("nid")).as("keep"))
  }

  /** DuckDB oracle tail for [[canonicalize]]: the [[dupGroupsOracleTail]]
    * closure plus the quality argmax. Embed after pair-generation CTEs
    * inside a WITH RECURSIVE. */
  def canonicalizeOracleTail(pairCte: String): String =
    s"""und AS (SELECT doc_a AS src, doc_b AS dst FROM $pairCte WHERE doc_a <> doc_b
         UNION ALL SELECT doc_b, doc_a FROM $pairCte WHERE doc_a <> doc_b),
reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM documents
  UNION
  SELECT und.dst AS node, reach.lbl FROM reach JOIN und ON und.src = reach.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
${graft.ops.Selection.qSignalsOracleCte()},
lb AS (SELECT c.doc_id, c.component, q.q_micros, row_number() OVER (PARTITION BY c.component ORDER BY q.q_micros DESC, c.doc_id ASC) AS rn FROM comp c JOIN qsig q USING (doc_id)),
gsz AS (SELECT component, CAST(count(*) AS BIGINT) AS group_size FROM comp GROUP BY component)
SELECT lb.doc_id, lb.component, gsz.group_size, lb.q_micros, (lb.rn = 1) AS keep
FROM lb JOIN gsz USING (component)"""

  /** DuckDB oracle for [[dupGroups]]: recursive min-label closure over
    * the same pair list. `pairCte` must be the name of a CTE exposing
    * (doc_a, doc_b); the caller embeds this after its pair-generation
    * CTEs. Every doc in `documents` appears; singletons keep doc_id. */
  def dupGroupsOracleTail(pairCte: String): String =
    s"""und AS (SELECT doc_a AS src, doc_b AS dst FROM $pairCte WHERE doc_a <> doc_b
         UNION ALL SELECT doc_b, doc_a FROM $pairCte WHERE doc_a <> doc_b),
reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM documents
  UNION
  SELECT und.dst AS node, reach.lbl FROM reach JOIN und ON und.src = reach.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
gsz AS (SELECT component, count(*) AS group_size FROM comp GROUP BY component)
SELECT comp.doc_id, comp.component, gsz.group_size,
       comp.doc_id = comp.component AS keep
FROM comp JOIN gsz USING (component)"""
}
