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
}
