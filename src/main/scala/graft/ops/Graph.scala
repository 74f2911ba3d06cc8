package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Link-graph analytics over the user↔content engagement graph (the
  * reference's events stream viewed as a bipartite graph — cf.
  * Real-Time-CDC-Analytics-Pipeline-with-ClickHouse's engagement
  * events; crawl pipelines use the same shape for link-based page
  * prioritization, OPIC/harmonic-centrality style).
  *
  * PageRank here is FIXED-ITERATION and EXACT-INTEGER: ranks live in
  * micro-units (1e-6 grain) and every per-edge contribution is a
  * BIGINT floor division, so partial sums are order-independent and
  * the DuckDB oracle replays the whole computation bit-for-bit — the
  * same quantization protocol as DSIR/unigram-LM (graft.ops.Dsir).
  *
  * Scale: each iteration is two co-partitioned shuffles — edges⋈ranks
  * hashing on the node key, then a dst-keyed hash aggregate with
  * map-side combine. The rank table is node-count-sized (corpus
  * proportional), so BOTH joins carry [[Joins.corpusSide]] sort-merge
  * pins: Catalyst's static estimates have twice been measured
  * (SCALE.md findings 4/5) broadcasting corpus-derived tables through
  * the driver, and a shuffled-hash build of one OOM'd the 1M-doc
  * probe (finding 7). Nothing is
  * ever collected; iteration count is a compile-time constant, so the
  * whole computation is one logical plan. At real scale you'd persist
  * the edge table partitioned on src between iterations.
  */
object Graph {

  /** Bipartite PageRank over distinct (user, content) engagement edges,
    * both directions (undirected flow). Damping 0.85 in exact integer
    * form: new = 150000 + (85 * Σ floor(rank/outdeg)) div 100.
    * Returns (node, rank_micros) for every node; node keys are
    * "u:<user_id>" / "c:<content_id>". */
  def pageRank(events: DataFrame, user: Column, content: Column,
      iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val base = events.select(concat(lit("u:"), user.cast("string")).as("u"),
      concat(lit("c:"), content).as("c")).distinct()
    val edges = base.select(col("u").as("src"), col("c").as("dst"))
      .unionAll(base.select(col("c").as("src"), col("u").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .withColumnRenamed("src", "node")
    var ranks = deg.withColumn("rank_micros", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(Joins.corpusSide(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank_micros div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("contrib"))
      ranks = deg
        .join(Joins.corpusSide(contribs), deg("node") === contribs("dst"),
          "left")
        .select(deg("node"), col("outdeg"),
          (lit(150000L) + expr("(85 * coalesce(contrib, 0L)) div 100"))
            .cast(LongType).as("rank_micros"))
    }
    ranks.select(col("node"), col("rank_micros"))
  }

  /** DuckDB replica of [[pageRank]] over table `events`, content id
    * derived as 'content-' || (event_id % 40) — the corpus-wide
    * convention (see Queries.engagementWire). */
  def pageRankOracleSql(iters: Int = 3): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u, 'c:content-' || CAST(event_id % 40 AS VARCHAR) AS c FROM events),
edges AS (SELECT u AS src, c AS dst FROM e0 UNION ALL SELECT c AS src, u AS dst FROM e0),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, outdeg, CAST(1000000 AS BIGINT) AS rank_micros FROM deg)"""
    val its = (1 to iters).map { i =>
      s"""r$i AS (SELECT d.node, d.outdeg, CAST(150000 + (85 * coalesce(s.contrib, 0)) // 100 AS BIGINT) AS rank_micros FROM deg d LEFT JOIN (SELECT e.dst AS node, sum(r.rank_micros // r.outdeg) AS contrib FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst) s ON d.node = s.node)"""
    }.mkString(",\n")
    s"$head,\n$its\nSELECT node, rank_micros FROM r$iters"
  }

  /** Per-node triangle counts over an undirected edge list — the
    * clustering/community-density signal (spam-farm detection in crawl
    * graphs, botnet-ring detection over engagement graphs; ClickHouse
    * users run the same two-join SQL).
    *
    * The scalable formulation (Suri & Vassilvitskii's MR-triangles):
    * ORIENT each undirected edge from its lower-degree endpoint to the
    * higher (ties by node id). Every triangle then has exactly one
    * "pivot" node with two out-edges, so counting wedges
    * pivot→{b, c} that close with an oriented edge b→c counts each
    * triangle exactly once — and out-degree under this orientation is
    * O(√m), so the wedge join's fan-out per node is bounded by
    * structure, not by the hottest hub's raw degree (a star node has
    * huge in-degree but tiny out-degree). Edge/degree tables are
    * corpus-derived → [[Joins.corpusSide]] sort-merge pins on every
    * join.
    *
    * Output: (node, n_tri) for every node with n_tri >= 1, where n_tri
    * counts triangles containing the node (each triangle contributes
    * to all three corners). */
  def triangleCounts(rawEdges: DataFrame, a: Column, b: Column): DataFrame = {
    // canonical undirected edge set: (lo, hi), self-loops dropped
    val und = rawEdges
      .select(least(a, b).as("lo"), greatest(a, b).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val deg = und.select(col("lo").as("n")).unionAll(und.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient: lower (degree, id) endpoint points at the higher
    val withDeg = und
      .join(Joins.corpusSide(deg.withColumnRenamed("n", "lo")
        .withColumnRenamed("d", "dlo")), Seq("lo"))
      .join(Joins.corpusSide(deg.withColumnRenamed("n", "hi")
        .withColumnRenamed("d", "dhi")), Seq("hi"))
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
        .otherwise(col("hi")).as("src"),
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
        .otherwise(col("lo")).as("dst"))
    // wedges at the pivot: the unordered out-pair {x, y} appears in
    // both orders here, but the closure edge exists oriented in only
    // ONE direction (the orientation is a DAG over the (degree, id)
    // total order), so each triangle joins exactly once — the filter
    // must be x ≠ y, NOT x < y by raw id, which is a different order
    // than the orientation's and would drop closures running against it
    val e1 = oriented.select(col("src").as("p"), col("dst").as("x"))
    val e2 = oriented.select(col("src").as("p"), col("dst").as("y"))
    val wedges = e1.join(Joins.corpusSide(e2), Seq("p"))
      .filter(col("x") =!= col("y"))
    val tris = wedges.join(Joins.corpusSide(
        oriented.select(col("src").as("x"), col("dst").as("y"))),
      Seq("x", "y"))
    // each triangle (p, x, y) credits all three corners
    tris.select(explode(array(col("p"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** DuckDB replica of [[triangleCounts]] over an edge CTE named
    * `rawe(a, b)` that the caller prepends. */
  def triangleCountsOracleSql(): String =
    """und AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM rawe WHERE a <> b),
deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM (SELECT lo AS n FROM und UNION ALL SELECT hi FROM und) GROUP BY 1),
oriented AS (SELECT CASE WHEN dl.d < dh.d OR (dl.d = dh.d AND lo < hi) THEN lo ELSE hi END AS src, CASE WHEN dl.d < dh.d OR (dl.d = dh.d AND lo < hi) THEN hi ELSE lo END AS dst FROM und JOIN deg dl ON dl.n = lo JOIN deg dh ON dh.n = hi),
tris AS (SELECT e1.p, e1.x, e2.y FROM (SELECT src AS p, dst AS x FROM oriented) e1 JOIN (SELECT src AS p, dst AS y FROM oriented) e2 USING (p) JOIN oriented cl ON cl.src = e1.x AND cl.dst = e2.y WHERE e1.x <> e2.y),
corners AS (SELECT p AS node FROM tris UNION ALL SELECT x FROM tris UNION ALL SELECT y FROM tris)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1"""
}
