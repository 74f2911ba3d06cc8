package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnyJoin, ArrayFuncs, Spatial}

/** Hand-checkable fixtures for the ANY JOIN, array-function, and
  * point-in-polygon operators (their registered queries oracle-gate
  * them corpus-wide; these pin the semantics). */
class AnyJoinArraySpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    (1L, 30.0, "r13"), (1L, 10.0, "r11"), (1L, 20.0, "r12"),
    (2L, 5.0, "r25")).toDF("k", "price", "tag")
  private val left = Seq((1L, "L1"), (2L, "L2"), (3L, "L3")).toDF("k", "name")

  test("anyJoin left: tiebreak-minimal right row per key; unmatched left keeps nulls") {
    val out = AnyJoin.anyJoin(left, right, Seq("k"), Seq("price"))
      .orderBy("k").collect()
    assert(out.length === 3)
    assert(out(0).getString(1) === "L1" && out(0).getDouble(2) === 10.0 &&
      out(0).getString(3) === "r11")
    assert(out(1).getDouble(2) === 5.0 && out(1).getString(3) === "r25")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3), "unmatched left row must survive with nulls")
  }

  test("anyJoin inner drops unmatched; ties on the tiebreak fall through to payload order") {
    val tied = Seq((1L, 10.0, "b"), (1L, 10.0, "a")).toDF("k", "price", "tag")
    val out = AnyJoin.anyJoin(left, tied, Seq("k"), Seq("price"), joinType = "inner")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(3) === "a", "payload extends the tiebreak to a total order")
  }

  test("anyJoin output is one row per left row regardless of right fanout") {
    val out = AnyJoin.anyJoin(left, right, Seq("k"), Seq("price"))
    assert(out.count() === left.count())
  }

  test("array sweep: cum/dif/compact/distinct match hand computation") {
    val evs = Seq(
      // user 7, one day: values 1.0, 1.0, 2.0 in ts order
      (100L, "2024-03-01 10:00:00", 7L, 1.0),
      (101L, "2024-03-01 11:00:00", 7L, 1.0),
      (102L, "2024-03-01 12:00:00", 7L, 2.0),
      // user 7, next day: single value
      (103L, "2024-03-02 09:00:00", 7L, 5.0))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = ArrayFuncs.sweep(evs)
      .orderBy("day", "idx")
      .select("day", "idx", "v", "cum", "dif", "n", "n_distinct", "n_compact")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq === Seq(
      ("2024-03-01", 0, 1000L, 1000L, 0L, 3L, 2L, 2L),
      ("2024-03-01", 1, 1000L, 2000L, 0L, 3L, 2L, 2L),
      ("2024-03-01", 2, 2000L, 4000L, 1000L, 3L, 2L, 2L),
      ("2024-03-02", 0, 5000L, 5000L, 0L, 1L, 1L, 1L)))
  }

  test("pointInPolygon: concave dart — notch point outside, wing point inside") {
    val pts = Seq(
      (1L, 0L, 20000000L),     // inside the dart body
      (2L, 0L, -30000000L),    // inside triangle ABC but in the notch -> outside
      (3L, -200000000L, 0L),   // left of everything -> outside
      (4L, -60000000L, -20000000L)) // left wing interior -> inside
      .toDF("pid", "x", "y")
    val out = Spatial.pointInPolygon(pts, col("pid"), col("x"), col("y"),
      graft.queries.Queries.dartPolygon)
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 1, true), (2L, 2, false), (3L, 2, false), (4L, 3, true)))
  }

  test("pointInPolygonRings: hole ring flips interior points out, even-odd") {
    // dart + diamond hole around (0, 25M): a point in the hole counts
    // one dart crossing + one hole crossing = even -> outside
    val pts = Seq(
      (1L, 0L, 20000000L),      // dart body, INSIDE the hole -> outside
      (2L, 0L, 60000000L),      // dart body, above the hole -> inside
      (3L, 0L, -30000000L),     // notch -> outside (unchanged by hole)
      (4L, -60000000L, -20000000L)) // left wing, far from hole -> inside
      .toDF("pid", "x", "y")
    val out = Spatial.pointInPolygonRings(pts, col("pid"), col("x"),
      col("y"), Seq(graft.queries.Queries.dartPolygon,
        graft.queries.Queries.dartHole))
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 2, false), (2L, 1, true), (3L, 2, false), (4L, 3, true)))
    // single-ring call is the rings form with one ring — same bits
    val single = Spatial.pointInPolygon(pts, col("pid"), col("x"), col("y"),
      graft.queries.Queries.dartPolygon).orderBy("pid").collect()
      .map(_.getBoolean(4)).toSeq
    assert(single === Seq(true, true, false, true))
  }

  test("radiusPairs: metric refine over grid candidates, lon shrink at high lat") {
    // µ-degree points: p1=(0,0), p2=(0.5°E,0) ≈ 55.6 km from p1;
    // p3=(0, 2.6°N) ≈ 289 km (outside radius AND outside the box);
    // p4 far away; p5/p6 at 65°N, 1° of lon apart ≈ 47 km — INSIDE the
    // 60 km radius only because longitude degrees shrink by cos(lat),
    // which the inflated candidate box must not lose; p7 above the
    // 66° cap is excluded from pairing entirely (documented contract).
    val pts = Seq(
      (1L, 0L, 0L), (2L, 500000L, 0L), (3L, 0L, 2600000L),
      (4L, 100000000L, 0L),
      (5L, 0L, 65000000L), (6L, 1000000L, 65000000L),
      (7L, 0L, 80000000L))
      .toDF("pid", "x", "y")
    val out = graft.ops.Spatial.radiusPairs(pts, col("pid"), col("x"),
        col("y"), radiusMeters = 60000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out.keySet === Set((1L, 2L), (5L, 6L)))
    def ref(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val a = math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2)
      6371000.0 * 2 * math.asin(math.sqrt(a))
    }
    assert(math.abs(out((1L, 2L)) - ref(0, 0, 0.5, 0)) < 1e-4)
    assert(math.abs(out((5L, 6L)) - ref(0, 65, 1, 65)) < 1e-4)
  }

  test("radiusPairsWrapped: recovers seam, over-the-pole, and cap-boundary pairs") {
    // three pair classes the flat-grid radiusPairs documents as
    // excluded: (1,2) straddles the ±180 dateline 0.1° apart (~11 km);
    // (3,4) both at 89°N, 180° of longitude apart — over the pole,
    // ~222 km; (5,6) spans the 66° cap boundary, 0.7° of lat (~78 km).
    val pts = Seq(
      (1L, 179950000L, 0L), (2L, -179950000L, 0L),
      (3L, 0L, 89000000L), (4L, 180000000L, 89000000L),
      (5L, 0L, 65800000L), (6L, 0L, 66500000L),
      (7L, 90000000L, 0L))
      .toDF("pid", "x", "y")
    val plain = Spatial.radiusPairs(pts, col("pid"), col("x"), col("y"),
      radiusMeters = 300000.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain === Set.empty,
      s"flat grid must miss all three excluded classes, found $plain")
    val out = Spatial.radiusPairsWrapped(pts, col("pid"), col("x"), col("y"),
        radiusMeters = 300000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet === Set((1L, 2L), (3L, 4L), (5L, 6L)), s"got ${out.keySet}")
    def ref(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val a = math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2)
      6371000.0 * 2 * math.asin(math.sqrt(a))
    }
    assert(math.abs(out((1L, 2L)) - ref(179.95, 0, -179.95, 0)) < 1e-3)
    assert(math.abs(out((3L, 4L)) - ref(0, 89, 180, 89)) < 1e-3)
    assert(math.abs(out((5L, 6L)) - ref(0, 65.8, 0, 66.5)) < 1e-3)
  }

  test("radiusPairsWrapped: agrees with radiusPairs away from seam and caps") {
    // the mid-latitude fixture from the radiusPairs test: identical
    // pairs AND identical distances (same refine on original coords)
    val pts = Seq(
      (1L, 0L, 0L), (2L, 500000L, 0L), (3L, 0L, 2600000L),
      (4L, 100000000L, 0L),
      (5L, 0L, 65000000L), (6L, 1000000L, 65000000L))
      .toDF("pid", "x", "y")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = collect(Spatial.radiusPairs(pts, col("pid"), col("x"),
      col("y"), radiusMeters = 60000.0))
    val wrapped = collect(Spatial.radiusPairsWrapped(pts, col("pid"),
      col("x"), col("y"), radiusMeters = 60000.0))
    assert(wrapped === plain)
  }

  test("radiusPairs: boundary pair at the lat cap beyond the linear lon bound") {
    // At lat 66° and r = 300 km the true max longitude separation is
    // 2·asin(sin(r/2R)/cos 66°) ≈ 6.6360° — MORE than the naive linear
    // r/(mPerDeg·cos 66°) ≈ 6.6333° (asin convexity amplified by
    // 1/cos). This pair sits in that sliver: a linear-sized grid box
    // silently drops it; the asin-sized box must keep it.
    val r = 6371000.0
    val naive = math.ceil(300000.0 /
      (math.Pi * r / 180.0 * math.cos(math.toRadians(66.0))) * 1e6).toLong
    val box = Spatial.radiusBoxMicro(300000.0, 66.0)
    assert(box > naive, s"box=$box must exceed the linear lon bound $naive")
    val dlon = 6634500L // > naive; haversine dist ≈ 299.93 km < 300 km
    assert(dlon > naive && dlon <= box)
    val pts = Seq((1L, 0L, 66000000L), (2L, dlon, 66000000L))
      .toDF("pid", "x", "y")
    val out = Spatial.radiusPairs(pts, col("pid"), col("x"), col("y"),
      radiusMeters = 300000.0).collect()
    assert(out.length === 1 && out(0).getLong(0) === 1L &&
      out(0).getLong(1) === 2L)
    assert(out(0).getDouble(2) <= 300000.0 && out(0).getDouble(2) > 299000.0)
  }
}
