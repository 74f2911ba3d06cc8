package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D spatial band join — the distributed "points within a box"
  * primitive behind radius search and geo dedup (the spatial analog of
  * [[RangeJoin]]'s 1-D interval compile-out, and the join pattern a
  * geohash/grid bucketing exists to serve).
  *
  * Grid-stencil shape: coordinates are integer µ-degrees (exact);
  * cells are box-sized, so any qualifying pair sits within one cell of
  * each other; the LEFT side explodes to its 3×3 cell stencil and
  * joins the RIGHT side's exact cell — every qualifying pair is found
  * exactly once (the right point's cell is unique), and the exact box
  * filter runs in integer arithmetic. NO all-pairs stage exists at any
  * scale: shuffle is 9× points plus density-bounded candidate pairs.
  *
  * At 100 TB the cell size is the knob: cells ≈ box keep the stencil
  * at 9; a hot cell (urban density) bounds candidates by its own
  * population — the Skew.saltedJoin treatment applies above that. */
object Spatial {

  /** Unordered pairs of points within `boxMicroDeg` in BOTH axes
    * (Chebyshev box, exact). Output: (id_a, id_b, dlon_u, dlat_u) with
    * id_a < id_b and deltas oriented a→b.
    *
    * Half-stencil: a symmetric self-join doesn't need the full 3×3 —
    * the expanded side visits only its own cell and the four
    * "positive" neighbors {(1,−1),(1,0),(1,1),(0,1)}. A same-cell pair
    * is found once under the id ordering; a cross-cell pair is found
    * via exactly ONE direction (whichever point's positive offset
    * reaches the other's cell), so no distinct pass is needed and the
    * replication factor drops 9 → 5. */
  def boxPairs(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, boxMicroDeg: Long): DataFrame =
    boxPairsCoords(points, id, lonMicro, latMicro, boxMicroDeg)
      .select(col("id_a"), col("id_b"), col("dlon_u"), col("dlat_u"))

  /** [[boxPairs]] plus id_a's own coordinates (x_a, y_a µ-degrees) —
    * the refine stage of [[radiusPairs]] reconstructs id_b's exactly
    * as (x_a + dlon_u, y_a + dlat_u). */
  def boxPairsCoords(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, boxMicroDeg: Long): DataFrame = {
    require(boxMicroDeg > 0, "box must be positive")
    val pts = points.select(id.as("pid"), lonMicro.as("x"), latMicro.as("y"))
    def cellOf(c: Column): Column =
      ((c - pmod(c, lit(boxMicroDeg))) / lit(boxMicroDeg)).cast("long")
    val right = pts.select(col("pid").as("id_r"), col("x").as("xr"),
      col("y").as("yr"), cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
    val offsets = Seq((0, 0), (1, -1), (1, 0), (1, 1), (0, 1))
    val left = pts
      .withColumn("o", explode(typedLit(offsets)))
      .select(col("pid").as("id_l"), col("x").as("xl"), col("y").as("yl"),
        col("o._1").as("own"),
        (cellOf(col("x")) + col("o._1")).as("cx"),
        (cellOf(col("y")) + col("o._2")).as("cy"))
      .withColumn("same_cell", col("own") === 0 &&
        col("cy") === cellOf(col("yl")))
    val joined = left.join(Joins.corpusSide(right), Seq("cx", "cy"))
      .filter(abs(col("xl") - col("xr")) <= boxMicroDeg &&
        abs(col("yl") - col("yr")) <= boxMicroDeg &&
        // same-cell meetings dedupe by id order; cross-cell meetings
        // are unique by construction (one positive direction)
        (!col("same_cell") || col("id_l") < col("id_r")))
    val aFirst = col("id_l") < col("id_r")
    joined.select(
      when(aFirst, col("id_l")).otherwise(col("id_r")).as("id_a"),
      when(aFirst, col("id_r")).otherwise(col("id_l")).as("id_b"),
      when(aFirst, col("xr") - col("xl")).otherwise(col("xl") - col("xr"))
        .as("dlon_u"),
      when(aFirst, col("yr") - col("yl")).otherwise(col("yl") - col("yr"))
        .as("dlat_u"),
      when(aFirst, col("xl")).otherwise(col("xr")).as("x_a"),
      when(aFirst, col("yl")).otherwise(col("yr")).as("y_a"))
  }

  /** DuckDB replica (brute-force spec — valid because the registered
    * query samples the point set). */
  def boxPairsOracleSql(sampleMod: Long, boxMicroDeg: Long): String =
    s"""WITH pts AS (SELECT event_id AS pid,
 CAST(round((CAST(user_id % 3600 AS DOUBLE)/10 - 180) * 1e6, 0) AS BIGINT) AS x,
 CAST(round((CAST(event_id % 1700 AS DOUBLE)/10 - 85) * 1e6, 0) AS BIGINT) AS y
 FROM events WHERE user_id % $sampleMod = 0)
SELECT a.pid AS id_a, b.pid AS id_b, b.x - a.x AS dlon_u, b.y - a.y AS dlat_u
FROM pts a JOIN pts b ON a.pid < b.pid
 AND abs(a.x - b.x) <= $boxMicroDeg AND abs(a.y - b.y) <= $boxMicroDeg"""

  /** Candidate box size (µ-degrees) that makes the grid COMPLETE for a
    * metric radius up to |lat| ≤ latCapDeg. Latitude separation is the
    * linear bound r/(π·R/180) exactly. Longitude is NOT linear: from
    * the haversine, two points at latitude φ and distance ≤ r satisfy
    * Δλ ≤ 2·asin(sin(r/2R)/cos φ), which EXCEEDS the naive
    * r/(mPerDeg·cos φ) (asin convexity amplified by 1/cos φ — at
    * r = 300 km, φ = 66° the linear bound loses ~2,500 µdeg of real
    * pairs near the radius boundary). The box is the max of the two
    * bounds (one Chebyshev cell size serves both axes; the refine
    * filter discards the slack). Shared by engine and oracle so the
    * prefilter is one expression. */
  def radiusBoxMicro(radiusMeters: Double, latCapDeg: Double): Long = {
    require(radiusMeters > 0, "radius must be positive")
    require(latCapDeg > 0 && latCapDeg < 90, "latCap must be in (0, 90)")
    val r = 6371000.0
    val latBound = math.ceil(radiusMeters / (math.Pi * r / 180.0) * 1e6).toLong
    val lonBound = math.ceil(math.toDegrees(2.0 * math.asin(math.min(1.0,
      math.sin(radiusMeters / (2.0 * r)) /
        math.cos(math.toRadians(latCapDeg))))) * 1e6).toLong
    math.max(latBound, lonBound)
  }

  /** Radius search in METERS — unordered point pairs within
    * `radiusMeters` great-circle distance: [[boxPairsCoords]] generates
    * the grid candidates (box sized by [[radiusBoxMicro]], so the grid
    * is complete up to |lat| ≤ latCapDeg), then the bit-portable
    * polynomial haversine ([[graft.functions.GeoFunctions
    * .greatCircleDistance]]) refines — the comparison runs on doubles
    * both engines reproduce bit-for-bit, so even boundary pairs agree.
    *
    * Contract (documented flat-grid semantics, mirrored by the oracle):
    * points with |lat| > latCapDeg are EXCLUDED from pairing (partition
    * polar caps separately — at cos(82°)≈0.14 the box inflation makes
    * grids pointless anyway), and pairs do not wrap the ±180 dateline
    * (pre-rotate longitudes if the corpus straddles it).
    *
    * Scale: the [[boxPairs]] posture verbatim (5-cell half-stencil,
    * density-bounded candidates, no all-pairs stage) plus a codegen'd
    * per-candidate refine — no extra shuffle, no join-back (id_b's
    * coordinates reconstruct exactly from integer deltas).
    *
    * Output: (id_a, id_b, dist_m DOUBLE) with id_a < id_b. */
  def radiusPairs(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, radiusMeters: Double,
      latCapDeg: Double = 66.0): DataFrame = {
    val boxMicro = radiusBoxMicro(radiusMeters, latCapDeg)
    val latCapMicro = math.round(latCapDeg * 1e6)
    val cands = boxPairsCoords(
      points.filter(abs(latMicro) <= latCapMicro),
      id, lonMicro, latMicro, boxMicro)
    def degs(c: Column): Column = c.cast("double") / lit(1e6)
    cands
      .select(col("id_a"), col("id_b"),
        graft.functions.GeoFunctions.greatCircleDistance(
          degs(col("x_a")), degs(col("y_a")),
          degs(col("x_a") + col("dlon_u")),
          degs(col("y_a") + col("dlat_u"))).as("dist_m"))
      .filter(col("dist_m") <= radiusMeters)
  }

  /** DuckDB replica of [[radiusPairs]] over the sampled fixture
    * (brute-force pairs under the SAME box prefilter — the documented
    * grid contract — then the identical rendered haversine). */
  def radiusPairsOracleSql(sampleMod: Long, radiusMeters: Double,
      latCapDeg: Double = 66.0): String = {
    val boxMicro = radiusBoxMicro(radiusMeters, latCapDeg)
    val latCapMicro = math.round(latCapDeg * 1e6)
    val cand = s"""(WITH pts AS (SELECT event_id AS pid,
 CAST(round((CAST(user_id % 3600 AS DOUBLE)/10 - 180) * 1e6, 0) AS BIGINT) AS x,
 CAST(round((CAST(event_id % 1700 AS DOUBLE)/10 - 85) * 1e6, 0) AS BIGINT) AS y
 FROM events WHERE user_id % $sampleMod = 0)
SELECT a.pid AS id_a, b.pid AS id_b,
 CAST(a.x AS DOUBLE) / 1000000.0 AS lon1, CAST(a.y AS DOUBLE) / 1000000.0 AS lat1,
 CAST(a.x + (b.x - a.x) AS DOUBLE) / 1000000.0 AS lon2,
 CAST(a.y + (b.y - a.y) AS DOUBLE) / 1000000.0 AS lat2
FROM pts a JOIN pts b ON a.pid < b.pid
 AND abs(a.x - b.x) <= $boxMicro AND abs(a.y - b.y) <= $boxMicro
 AND abs(a.y) <= $latCapMicro AND abs(b.y) <= $latCapMicro) cand"""
    val sel = graft.functions.GeoFunctions.greatCircleDistanceSql(
      srcSql = cand, keepSql = "id_a, id_b", alias = "dist_m",
      lon1 = "lon1", lat1 = "lat1", lon2 = "lon2", lat2 = "lat2")
    // MATERIALIZED is an optimizer fence: without it DuckDB pushes the
    // dist_m filter down through the 22 let-binding projections,
    // substituting each _gbN by its definition transitively — the same
    // combinatorial inlining the let-bindings exist to prevent (a
    // filter that planned for minutes at sf0.1; 0.5 s fenced).
    s"WITH d AS MATERIALIZED ($sel) SELECT * FROM d WHERE dist_m <= $radiusMeters"
  }

  /** Exact latitude bound (µ-degrees) for a metric radius: 1° of
    * latitude is π·R/180 m everywhere. */
  def latBandMicro(radiusMeters: Double): Long =
    math.ceil(radiusMeters / (math.Pi * 6371000.0 / 180.0) * 1e6).toLong

  /** 180°-rotated longitude (µ-degrees): x' = wrap(x + 180°), i.e.
    * pmod(x, 360°) − 180° — moves the ±180 seam to 0, so a grid in the
    * rotated frame finds the pairs the original frame's seam splits.
    * (NOT ((x+180°) mod 360°) − 180°, which is the IDENTITY on
    * [−180°, 180°) — the hand fixture pins the distinction.) Exact
    * integer arithmetic, its own inverse. */
  def rotLon(c: Column): Column =
    pmod(c, lit(360000000L)) - lit(180000000L)

  /** [[radiusPairs]] COMPLETED across its two documented exclusions —
    * the ±180 dateline and the polar caps:
    *
    *  - SEAM: the mid-latitude zone (|lat| ≤ latCapDeg) runs the grid
    *    TWICE — once in the original frame, once with longitudes
    *    rotated by 180° ([[rotLon]]) so seam-straddling pairs become
    *    local. Both frames' candidates un-rotate to the ORIGINAL
    *    coordinates before the refine, so a pair found in both frames
    *    produces bit-identical rows and one `distinct` dedups — no
    *    preference logic, no cross-frame float drift. (The polynomial
    *    haversine is wrap-correct by construction: sin²(Δλ/2) folds
    *    |Δλ| up to 360° into [−π, π], inside sinF's reduction domain.)
    *  - POLAR CAPS: above the cap a longitude grid degenerates
    *    (cos φ → 0), but latitude never does — cap points (widened by
    *    one latitude band so cap↔main-zone pairs are caught) pair via
    *    a 1-D latitude-band half-stencil (own cell + next, the
    *    [[boxPairs]] dedup logic in one dimension), with the exact
    *    |Δlat| ≤ band filter and the wrap-safe haversine refine — no
    *    longitude prefilter at all, which is what makes it pole- and
    *    seam-proof. Pairs emit from the cap partition only when at
    *    least one point is strictly above the cap, so the zones
    *    partition the pair space exactly.
    *
    * Scale: the main zone is [[radiusPairs]] × 2 (two grid passes, the
    * same density-bounded candidates). The cap partition's candidates
    * are quadratic in per-latitude-band population WITHIN the caps —
    * the caps cover (1−sin latCap)/1... ~4% of the sphere at 66° and
    * real corpora are near-empty there; a polar-dense corpus salts the
    * band key (Skew.saltedJoin) or lowers latCap to shrink the cap.
    *
    * Output: (id_a, id_b, dist_m) with id_a < id_b, distances always
    * computed from the ORIGINAL coordinates. */
  def radiusPairsWrapped(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, radiusMeters: Double,
      latCapDeg: Double = 66.0): DataFrame = {
    val boxMicro = radiusBoxMicro(radiusMeters, latCapDeg)
    val latBand = latBandMicro(radiusMeters)
    val capMicro = math.round(latCapDeg * 1e6)
    val pts = points.select(id.as("pid"), lonMicro.as("x"), latMicro.as("y"))
    def degs(c: Column): Column = c.cast("double") / lit(1e6)
    def dist(lonA: Column, latA: Column, lonB: Column, latB: Column): Column =
      graft.functions.GeoFunctions.greatCircleDistance(
        degs(lonA), degs(latA), degs(lonB), degs(latB))

    // main zone: grid candidates in both frames, un-rotated to original
    // coordinates, distinct, one refine
    val main = pts.filter(abs(col("y")) <= capMicro)
    val candA = boxPairsCoords(main, col("pid"), col("x"), col("y"), boxMicro)
      .select(col("id_a"), col("id_b"), col("x_a").as("lon_a"),
        col("y_a").as("lat_a"), (col("x_a") + col("dlon_u")).as("lon_b"),
        (col("y_a") + col("dlat_u")).as("lat_b"))
    val candB = boxPairsCoords(
        main.select(col("pid"), rotLon(col("x")).as("x"), col("y")),
        col("pid"), col("x"), col("y"), boxMicro)
      .select(col("id_a"), col("id_b"), rotLon(col("x_a")).as("lon_a"),
        col("y_a").as("lat_a"),
        rotLon(col("x_a") + col("dlon_u")).as("lon_b"),
        (col("y_a") + col("dlat_u")).as("lat_b"))
    val mainPairs = candA.unionByName(candB).distinct()
      .select(col("id_a"), col("id_b"),
        dist(col("lon_a"), col("lat_a"), col("lon_b"), col("lat_b")).as("dist_m"))
      .filter(col("dist_m") <= radiusMeters)

    // polar caps (north and south land in far-apart latitude cells, so
    // one band join serves both): 1-D half-stencil on the lat cell
    val cap = pts.filter(abs(col("y")) >= capMicro - latBand)
    def cellOf(c: Column): Column =
      ((c - pmod(c, lit(latBand))) / lit(latBand)).cast("long")
    val right = cap.select(col("pid").as("id_r"), col("x").as("xr"),
      col("y").as("yr"), cellOf(col("y")).as("cy"))
    val capJoined = cap
      .withColumn("o", explode(typedLit(Seq(0, 1))))
      .select(col("pid").as("id_l"), col("x").as("xl"), col("y").as("yl"),
        col("o"), (cellOf(col("y")) + col("o")).as("cy"))
      .join(Joins.corpusSide(right), Seq("cy"))
      .filter(abs(col("yl") - col("yr")) <= latBand &&
        greatest(abs(col("yl")), abs(col("yr"))) > capMicro &&
        (col("o") =!= 0 || col("id_l") < col("id_r")))
    val aFirst = col("id_l") < col("id_r")
    val capPairs = capJoined
      .select(
        when(aFirst, col("id_l")).otherwise(col("id_r")).as("id_a"),
        when(aFirst, col("id_r")).otherwise(col("id_l")).as("id_b"),
        when(aFirst, col("xl")).otherwise(col("xr")).as("lon_a"),
        when(aFirst, col("yl")).otherwise(col("yr")).as("lat_a"),
        when(aFirst, col("xr")).otherwise(col("xl")).as("lon_b"),
        when(aFirst, col("yr")).otherwise(col("yl")).as("lat_b"))
      .select(col("id_a"), col("id_b"),
        dist(col("lon_a"), col("lat_a"), col("lon_b"), col("lat_b")).as("dist_m"))
      .filter(col("dist_m") <= radiusMeters)

    mainPairs.unionByName(capPairs)
  }

  /** DuckDB replica of [[radiusPairsWrapped]] over the sampled fixture:
    * the identical zone partition (two-frame box prefilter in the main
    * zone, lat-band prefilter in the caps), the identical rendered
    * haversine on original coordinates.
    *
    * FIXTURE (mirrored by the registered query): longitudes sit in a
    * 12° strip STRADDLING ±180 ([174°, 186°) wrapped), latitudes span
    * ±85° — so the gate's corpus actually populates all three pair
    * classes at every SF: seam-crossing (frame-B-only), polar-cap, and
    * plain. The first fixture derived lon from user_id across the full
    * circle; a class audit found ZERO seam pairs at both gate SFs
    * (sf0.001 has only 15 distinct user_ids), i.e. the rotation path
    * was gated only by the hand spec — the round-10 polygon-fixture
    * lesson, reapplied. FixtureCoverageSpec pins the class counts so
    * a future testdata regeneration that empties a class fails CI. */
  def radiusPairsWrappedOracleSql(sampleMod: Long, radiusMeters: Double,
      latCapDeg: Double = 66.0): String = {
    val boxMicro = radiusBoxMicro(radiusMeters, latCapDeg)
    val latBand = latBandMicro(radiusMeters)
    val capMicro = math.round(latCapDeg * 1e6)
    def rot(c: String) = s"((((($c) % 360000000) + 360000000) % 360000000) - 180000000)"
    val cand = s"""(WITH pts AS (SELECT event_id AS pid,
 CASE WHEN lr >= 180000000 THEN lr - 360000000 ELSE lr END AS x, y FROM (
  SELECT event_id, CAST(round((CAST(event_id % 120 AS DOUBLE)/10 + 174) * 1e6, 0) AS BIGINT) AS lr,
   CAST(round((CAST((event_id * 7) % 1700 AS DOUBLE)/10 - 85) * 1e6, 0) AS BIGINT) AS y
  FROM events WHERE event_id % $sampleMod = 0)),
mcand AS (SELECT a.pid AS id_a, b.pid AS id_b, a.x AS lon_a, a.y AS lat_a, b.x AS lon_b, b.y AS lat_b
 FROM pts a JOIN pts b ON a.pid < b.pid
 WHERE abs(a.y) <= $capMicro AND abs(b.y) <= $capMicro AND abs(a.y - b.y) <= $boxMicro
  AND (abs(a.x - b.x) <= $boxMicro OR abs(${rot("a.x")} - ${rot("b.x")}) <= $boxMicro)),
ccand AS (SELECT a.pid AS id_a, b.pid AS id_b, a.x AS lon_a, a.y AS lat_a, b.x AS lon_b, b.y AS lat_b
 FROM pts a JOIN pts b ON a.pid < b.pid
 WHERE abs(a.y) >= ${capMicro - latBand} AND abs(b.y) >= ${capMicro - latBand}
  AND greatest(abs(a.y), abs(b.y)) > $capMicro AND abs(a.y - b.y) <= $latBand)
SELECT id_a, id_b,
 CAST(lon_a AS DOUBLE) / 1000000.0 AS lon1, CAST(lat_a AS DOUBLE) / 1000000.0 AS lat1,
 CAST(lon_b AS DOUBLE) / 1000000.0 AS lon2, CAST(lat_b AS DOUBLE) / 1000000.0 AS lat2
FROM (SELECT * FROM mcand UNION ALL SELECT * FROM ccand)) cand"""
    val sel = graft.functions.GeoFunctions.greatCircleDistanceSql(
      srcSql = cand, keepSql = "id_a, id_b", alias = "dist_m",
      lon1 = "lon1", lat1 = "lat1", lon2 = "lon2", lat2 = "lat2")
    s"WITH d AS MATERIALIZED ($sel) SELECT * FROM d WHERE dist_m <= $radiusMeters"
  }

  /** Point-in-polygon (ClickHouse `pointInPolygon`) by the crossing-
    * number rule, EXACT in integer µ-degrees: a horizontal ray from
    * the point crosses edge (x1,y1)→(x2,y2) iff the edge spans the
    * point's latitude (half-open: y1 ≤ py xor y2 ≤ py, which counts a
    * vertex hit exactly once) and the point lies strictly on the
    * interior side of the edge line — a 64-bit cross-product SIGN
    * test, no division, no floats (|coords| ≤ 3.6e8 → products ≤
    * ~6e16, far inside Long). Handles CONCAVE polygons (odd/even
    * crossings); horizontal edges never span and drop out.
    *
    * The polygon is a compile-time literal, so the whole test unrolls
    * to one codegen'd arithmetic expression per row — a pure
    * projection over the point set: no shuffle, no join, trivially
    * 100 TB-parallel. (A per-row polygon COLUMN would use the same
    * terms under `aggregate()` over the edge array.) */
  def pointInPolygon(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, poly: Seq[(Long, Long)]): DataFrame =
    pointInPolygonRings(points, id, lonMicro, latMicro, Seq(poly))

  /** Multi-ring [[pointInPolygon]] — the full ClickHouse signature
    * `pointInPolygon(pt, outer, hole1, …)`: the first ring is the
    * outer boundary, the rest are holes. Under the even-odd rule the
    * generalization is free: crossings sum over ALL rings' edges, and
    * a point inside the outer ring AND inside a hole accumulates an
    * even total (1 + 1) → outside, which is exactly outer-minus-holes
    * when holes nest inside the outer ring (the ClickHouse contract;
    * nested-hole-islands follow the same parity and also match).
    * Same per-row codegen'd projection — ring count only widens the
    * unrolled expression. */
  def pointInPolygonRings(points: DataFrame, id: Column, lonMicro: Column,
      latMicro: Column, rings: Seq[Seq[(Long, Long)]]): DataFrame = {
    require(rings.nonEmpty && rings.forall(_.length >= 3),
      "each ring needs >= 3 vertices")
    val base = points.select(id.as("pid"), lonMicro.as("px"), latMicro.as("py"))
    val px = col("px"); val py = col("py")
    val crossings: Column = rings.flatMap { poly =>
      poly.indices.map { i =>
        val (x1, y1) = poly(i)
        val (x2, y2) = poly((i + 1) % poly.length)
        val spans = (lit(y1) <= py) =!= (lit(y2) <= py)
        val cross = lit(x2 - x1) * (py - lit(y1)) - (px - lit(x1)) * lit(y2 - y1)
        val hit = if (y2 > y1) cross > 0 else cross < 0
        when(spans && hit, 1).otherwise(0)
      }
    }.reduce(_ + _)
    base.select(col("pid"), px.as("lon_u"), py.as("lat_u"),
      crossings.as("crossings"),
      (crossings % 2 === 1).as("inside"))
  }

  /** DuckDB replica of [[pointInPolygon]]: the identical per-edge
    * terms, unrolled from the same vertex list. `pointsSql` must
    * yield (pid, px, py). */
  def pointInPolygonOracleSql(pointsSql: String,
      poly: Seq[(Long, Long)]): String =
    pointInPolygonRingsOracleSql(pointsSql, Seq(poly))

  /** DuckDB replica of [[pointInPolygonRings]]. */
  def pointInPolygonRingsOracleSql(pointsSql: String,
      rings: Seq[Seq[(Long, Long)]]): String = {
    val terms = rings.flatMap { poly =>
      poly.indices.map { i =>
        val (x1, y1) = poly(i)
        val (x2, y2) = poly((i + 1) % poly.length)
        val cmp = if (y2 > y1) ">" else "<"
        s"(CASE WHEN (($y1 <= py) <> ($y2 <= py)) AND ((${x2 - x1}) * (py - ($y1)) - (px - ($x1)) * (${y2 - y1}) $cmp 0) THEN 1 ELSE 0 END)"
      }
    }.mkString(" + ")
    s"""WITH pts AS ($pointsSql),
c AS (SELECT pid, px, py, $terms AS crossings FROM pts)
SELECT pid, px AS lon_u, py AS lat_u, crossings, crossings % 2 = 1 AS inside FROM c"""
  }
}
