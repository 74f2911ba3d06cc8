package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse external-dictionary analog (`dictGet` /
  * `dictGetOrDefault` / `dictGetHierarchy` / `dictIsIn`): the
  * reference's broadcast dim-enrichment join (J1,
  * EnhancedEngagementStreamingJob.java:114-122) IS ClickHouse-land's
  * flat-dictionary pattern, so the flat lookup here is a thin,
  * explicitly-broadcast API over it — what's new is the HIERARCHICAL
  * family, the one dictionary feature with no analog elsewhere in the
  * repo: a parent-keyed dimension (category trees) resolved to
  * self→root ancestor chains.
  *
  * Hierarchy resolution is bounded-depth iterative self-broadcast:
  * `maxDepth` rounds, each broadcasting the (id, parent) dictionary
  * and advancing every chain by one hop (a chain already at its root
  * passes through a left-join miss unchanged). Dictionaries are
  * model/dimension-sized by definition — ClickHouse materializes them
  * IN RAM on every server — so broadcasting each round is the correct
  * posture at any fact-table scale, and the closure is computed once
  * per DICTIONARY (dict-sized work), never per fact row: fact streams
  * join the finished closure with one more broadcast. Nothing here
  * ever shuffles the fact side.
  *
  * Conventions (the ClickHouse ones): keys are positive longs; parent
  * 0 or NULL means "no parent" (root). Chains longer than `maxDepth`
  * truncate (hierarchical dictionaries assume shallow trees; size
  * maxDepth ≥ the tree depth — a cycle, which ClickHouse documents as
  * user error, also just truncates at maxDepth instead of hanging).
  * `dictIsIn(child, anc)` is true when `anc` appears in child's chain
  * INCLUDING child itself (the ClickHouse equal-key behavior).
  */
object Dict {

  /** Ancestor-chain closure of a parent-keyed dictionary:
    * (id, path array<long> self→root, root_id, depth) — `path` is
    * `dictGetHierarchy`, `depth` = ancestor count (0 for roots). */
  def hierarchy(dim: DataFrame, id: Column, parent: Column,
      maxDepth: Int = 10): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 64, "maxDepth must be in [1, 64]")
    val base = dim.select(id.cast("long").as("h_id"),
      parent.cast("long").as("h_par"))
    var cur = base.select(col("h_id"), col("h_par").as("nxt"),
      array(col("h_id")).as("path"))
    var i = 0
    while (i < maxDepth) {
      cur = cur.join(
          broadcast(base.select(col("h_id").as("p_id"), col("h_par").as("p_par"))),
          col("nxt") === col("p_id"), "left")
        .select(col("h_id"),
          coalesce(col("p_par"), lit(0L)).as("nxt"),
          when(col("p_id").isNotNull,
            concat(col("path"), array(col("p_id"))))
            .otherwise(col("path")).as("path"))
      i += 1
    }
    cur.select(col("h_id").as("id"), col("path"),
      element_at(col("path"), -1).as("root_id"),
      (size(col("path")) - 1).as("depth"))
  }

  /** `dictIsIn(child, ancestor)` over a [[hierarchy]] row's path. */
  def dictIsIn(path: Column, ancestor: Long): Column =
    array_contains(path, lit(ancestor))

  /** `dictGetChildren`: every dictionary key with its IMMEDIATE
    * children, sorted ascending (keys without children get an empty
    * array). One dictionary-sized groupBy + broadcast join back —
    * the inverse edge direction needs no iteration. */
  def dictGetChildren(dim: DataFrame, id: Column, parent: Column): DataFrame = {
    val base = dim.select(id.cast("long").as("id"),
      parent.cast("long").as("c_par"))
    // rename the child id BEFORE grouping by the parent-as-id alias so
    // collect_list aggregates the child ids, not the grouping key
    val kids = base.filter(col("c_par") >= 1)
      .select(col("id").as("kid"), col("c_par").as("id"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("kid"))).as("children"))
    base.select(col("id"))
      .join(broadcast(kids), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("children"), array().cast("array<long>")).as("children"))
  }

  /** `dictGetDescendants` (all levels), counted: inverting the
    * [[hierarchy]] closure — id D is a descendant of A iff A appears in
    * D's self→root path at depth ≥ 1 — turns the whole-subtree question
    * into one posexplode + count, no second iteration. Returns
    * (id, n_desc) for every dictionary key (0 for leaves). */
  def descendantCounts(hier: DataFrame): DataFrame = {
    val counts = hier
      .select(posexplode(col("path")).as(Seq("pos", "anc")))
      .filter(col("pos") >= 1)
      .groupBy(col("anc").as("id"))
      .agg(count(lit(1)).as("n_desc"))
    hier.select(col("id"))
      .join(broadcast(counts), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_desc"), lit(0L)).as("n_desc"))
  }

  /** `dictGetOrDefault`: flat attribute lookup with a default on a
    * missing key. The dictionary broadcasts — ClickHouse keeps
    * dictionaries resident in RAM per server, and that is exactly what
    * an explicit broadcast hash join is on Spark — so the fact side
    * never shuffles. */
  def dictGetOrDefault(facts: DataFrame, key: Column, dim: DataFrame,
      dimKey: Column, attr: Column, outName: String,
      default: Column): DataFrame = {
    val d = dim.select(dimKey.as("__dk"), attr.as("__dv"))
    facts.withColumn("__fk", key)
      .join(broadcast(d), col("__fk") === col("__dk"), "left")
      .withColumn(outName, coalesce(col("__dv"), default))
      .drop("__fk", "__dk", "__dv")
  }

  /** ClickHouse `range_hashed` dictionary layout — the slowly-changing
    * dimension lookup (`dictGetOrDefault(dict, attr, key, date)`): each
    * dictionary key carries VERSIONED attribute ranges
    * [range_start, range_end] (inclusive, integer day/time units), and
    * a probe at date d resolves to the covering range with the MAX
    * range_start (ClickHouse `range_lookup_strategy: max` — the as-of
    * convention, so a version that opens before the prior one closes
    * wins over the overlap suffix).
    *
    * The fact side never groups or shuffles: the ARGMAX is moved into
    * the DICTIONARY by breakpoint decomposition ([[rangeSegments]]) —
    * all range boundaries per key cut the axis into elementary
    * segments, each segment resolving once (dict-sized work: windows
    * and a boundaries×ranges cover join over the dictionary only,
    * exactly the interval index ClickHouse builds in RAM at dictionary
    * load). The segments are DISJOINT by construction, so the fact
    * probe is one broadcast left range-join matching ≤ 1 row — never a
    * per-fact-row dedupe. Contract: (key, range_start) unique (one
    * version per effective date). */
  def rangeSegments(dim: DataFrame, key: Column, rangeStart: Column,
      rangeEnd: Column, attr: Column): DataFrame = {
    val base = dim.select(key.cast("long").as("rk"),
      rangeStart.cast("long").as("rs"), rangeEnd.cast("long").as("re"),
      attr.as("rv")).filter(col("rs") <= col("re"))
    // segment starts: every range start, plus the day AFTER every range
    // end (where coverage can change); a segment runs to the next
    // boundary - 1 (or the key's max end)
    val bounds = base.select(col("rk"), col("rs").as("b"))
      .union(base.select(col("rk"), (col("re") + 1).as("b")))
      .distinct()
    val nextB = lead(col("b"), 1).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("rk")).orderBy(col("b")))
    val segs = bounds
      .select(col("rk"), col("b").as("seg_lo"),
        (coalesce(nextB, col("b") + 1) - 1).as("seg_hi"))
    // resolve each segment once: covering ranges, max range_start wins
    segs.join(base, Seq("rk"))
      .filter(col("rs") <= col("seg_lo") && col("re") >= col("seg_hi"))
      .groupBy(col("rk"), col("seg_lo"), col("seg_hi"))
      .agg(max_by(col("rv"), col("rs")).as("rv"))
  }

  /** The `range_hashed` probe: facts resolve (key, date) against
    * [[rangeSegments]] output via ONE broadcast left join (≤ 1 match
    * by disjointness) with a default on miss. The fact side never
    * shuffles — the Dict contract. */
  def dictGetRange(facts: DataFrame, key: Column, date: Column,
      segments: DataFrame, outName: String, default: Column): DataFrame = {
    val seg = segments.select(col("rk").as("__rk"),
      col("seg_lo").as("__sl"), col("seg_hi").as("__sh"),
      col("rv").as("__rv"))
    facts.withColumn("__fk", key.cast("long"))
      .withColumn("__fd", date.cast("long"))
      .join(broadcast(seg),
        col("__fk") === col("__rk") && col("__fd") >= col("__sl") &&
          col("__fd") <= col("__sh"), "left")
      .withColumn(outName, coalesce(col("__rv"), default))
      .drop("__fk", "__fd", "__rk", "__sl", "__sh", "__rv")
  }

  /** DuckDB replica of [[rangeSegments]] ∘ [[dictGetRange]] as the
    * DIRECT as-of semantics (max-start covering range per probe, else
    * default) — deliberately NOT a replay of the decomposition, so a
    * decomposition bug diverges from the spec instead of being
    * reproduced by it. `factsSql` must yield (fid, fk, fd) and
    * `dimSql` (rk, rs, re, rv). */
  def dictGetRangeOracleSql(factsSql: String, dimSql: String,
      defaultSql: String): String =
    s"""WITH f AS ($factsSql), d AS ($dimSql),
hit AS (SELECT f.fid, max_by(d.rv, d.rs) AS rv
  FROM f JOIN d ON f.fk = d.rk AND f.fd >= d.rs AND f.fd <= d.re
  GROUP BY f.fid)
SELECT f.fid, coalesce(hit.rv, $defaultSql) AS rv
FROM f LEFT JOIN hit ON f.fid = hit.fid"""

  /** DuckDB replica of [[hierarchy]] as a recursive CTE chain over a
    * dictionary relation `dimSql` (must yield columns id, parent).
    * Emits CTE `${p}hier`: (id, path_str '/'-joined self→root,
    * root_id, depth, path-as-list `pl` for dictIsIn predicates).
    *
    * Mirrors the engine on MALFORMED dictionaries too, not just the
    * dense acyclic fixtures the gate sees: the recursive step (a) only
    * advances to a parent that EXISTS as a dictionary id — the engine's
    * left-join miss on a dangling parent leaves the chain at its last
    * resolved node, so the CTE must not append the dangling id — and
    * (b) is bounded by `maxDepth` hops, so a self/longer cycle (which
    * the engine documents as truncating after maxDepth rounds) also
    * truncates here instead of recursing DuckDB to death. Pass the SAME
    * maxDepth as the engine-side [[hierarchy]] call. */
  def hierarchyOracleCtes(dimSql: String, p: String = "",
      maxDepth: Int = 10): String =
    s"""${p}dim AS ($dimSql),
${p}chain AS (
  SELECT id AS id, id AS node, 0 AS depth FROM ${p}dim
  UNION ALL
  SELECT c.id, d.parent AS node, c.depth + 1
  FROM ${p}chain c JOIN ${p}dim d ON c.node = d.id
  WHERE d.parent >= 1 AND c.depth < $maxDepth
    AND d.parent IN (SELECT id FROM ${p}dim)
),
${p}hier AS (
  SELECT id,
    string_agg(CAST(node AS VARCHAR), '/' ORDER BY depth ASC) AS path_str,
    max_by(node, depth) AS root_id,
    CAST(max(depth) AS INTEGER) AS depth,
    list(node ORDER BY depth ASC) AS pl
  FROM ${p}chain GROUP BY id
)"""
}
