package graft

import org.apache.spark.sql.functions._

/** Gate-quality pin for q_geo_radius_wrap's FIXTURE (not its math —
  * AnyJoinArraySpec pins that on hand points): the corpus gate only
  * tests what the fixture populates, and the query's first fixture
  * silently gated ZERO seam-crossing pairs at both gate SFs (sf0.001
  * exposes 15 distinct user_ids, so a user_id-derived longitude never
  * straddled ±180 — the frame-B rotation path ran but matched nothing,
  * exactly the round-10 polygon-fixture failure mode). This spec runs
  * the registered query on the smallest SF and asserts every pair
  * class is NON-EMPTY, so a fixture or testdata-regeneration change
  * that empties a class fails CI instead of quietly weakening the
  * gate. */
class RadiusWrapFixtureSpec extends SparkSpec {

  test("wrap fixture populates seam-crossing, polar-cap, and plain pairs") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.queries.Queries.runners("q_geo_radius_wrap")(spark, dir)
    // rebuild each pair's coordinates from the same fixture synthesis
    val lr = round((pmod(col("event_id"), lit(120)).cast("double") / 10
      + 174) * 1e6, 0).cast("long")
    val pts = graft.Tables.events(spark, dir)
      .filter(pmod(col("event_id"), lit(7)) === 0)
      .select(col("event_id"),
        when(lr >= 180000000L, lr - 360000000L).otherwise(lr).as("x"),
        round((pmod(col("event_id") * 7, lit(1700)).cast("double") / 10 - 85)
          * 1e6, 0).cast("long").as("y"))
    val classed = pairs
      .join(pts.select(col("event_id").as("id_a"), col("x").as("xa"),
        col("y").as("ya")), Seq("id_a"))
      .join(pts.select(col("event_id").as("id_b"), col("x").as("xb"),
        col("y").as("yb")), Seq("id_b"))
      .select(
        (greatest(abs(col("ya")), abs(col("yb"))) > 66000000L).as("cap"),
        (abs(col("xa") - col("xb")) > 180000000L).as("seam"))
      .groupBy(col("cap"), col("seam")).count()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    val seam = classed.collect { case ((false, true), n) => n }.sum
    val cap = classed.filter(_._1._1).values.sum
    val plain = classed.getOrElse((false, false), 0L)
    assert(seam >= 1, s"fixture gates no seam-crossing pairs: $classed")
    assert(cap >= 1, s"fixture gates no polar-cap pairs: $classed")
    assert(plain >= 1, s"fixture gates no plain mid-zone pairs: $classed")
  }
}
