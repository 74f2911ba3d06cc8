package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bitmaps, Graph, Retrieval, Rollups, Sketches}

/** Unit fixtures for the round-7 analytics additions (the registered
  * queries oracle-gate them corpus-wide; these pin the semantics on
  * hand-checkable inputs). */
class SketchGraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("countMin: estimates are exact-or-over, exact on collision-free keys") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Sketches.countMinEstimates(df, col("k"), w = 64, d = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set("a", "b", "c"))
    out.foreach { case (k, (exact, est)) =>
      assert(est >= exact, s"$k estimated $est < exact $exact — CMS can never undercount")
    }
    assert(out("a")._1 === 5L && out("b")._1 === 3L && out("c")._1 === 1L)
    // 3 keys into 64x4 counters: collision-free, so estimates are exact
    out.foreach { case (k, (exact, est)) => assert(est === exact, s"$k collided") }
  }

  test("hll: estimate within raw-HLL error of the exact count; registers consistent") {
    val df = spark.range(2000).select(concat(lit("u"), col("id")).as("k"))
    val r = Sketches.hllDistinct(df, col("k"), m = 64).head()
    val (m, zeros, num, est, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(m === 64L && exact === 2000L)
    assert(zeros >= 0L && zeros < 64L) // 2000 keys: every register should fill
    assert(num > 0L)
    // raw HLL at m=64 has ~1.3/sqrt(64) ≈ 16% standard error; allow 3 sigma
    assert(math.abs(est - exact) <= exact / 2,
      s"estimate $est vs exact $exact — outside any plausible HLL error")
  }

  test("triangleCounts: square + one diagonal = two triangles sharing the diagonal") {
    // a-b-c-d-a plus diagonal a-c → triangles (a,b,c), (a,c,d)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val out = Graph.triangleCounts(edges, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("triangleCounts: duplicate/reversed/self edges collapse; K4 gives 3 per node") {
    val k4 = (for (i <- 1L to 4L; j <- 1L to 4L if i != j) yield (i, j))
      .toDF("a", "b") // both directions + dups → still one K4
    val withNoise = k4.unionAll(Seq((2L, 2L)).toDF("a", "b"))
    val out = Graph.triangleCounts(withNoise, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("decayedScore: whole-halflife shifts, horizon zeroes, frontier-relative") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-03 $h%02d:00:00")
    // halflife 1h, horizon 4: ages 0h,1h,2h,4h → weights 2^4,2^3,2^2,0
    val df = Seq(
      ("k1", ts(12), 10L), // frontier row: age 0 → 10 << 4 = 160
      ("k1", ts(11), 10L), // age 1 → 80
      ("k2", ts(10), 10L), // age 2 → 40
      ("k2", ts(8), 10L))  // age 4 = horizon → 0
      .toDF("key", "ts", "sc")
    val out = Rollups.decayedScore(df, col("key"), col("ts"), col("sc"),
        halflifeSec = 3600L, horizon = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("k1") === ((240L, 2L)))
    assert(out("k2") === ((40L, 2L)))
  }

  test("rrfFusion: a doc ranked by both arms beats single-arm docs; ranks carried") {
    // doc 1 contains the query term AND shares the query's hash-bucket
    // profile; doc 2 only lexical; doc 3 only similar-by-hash tokens
    val docsDf = Seq(
      (1L, "spark spark stream"),
      (2L, "spark unrelated words here"),
      (3L, "stream stream stream"),
      (4L, "nothing in common at all"))
      .toDF("doc_id", "text")
    val out = Retrieval.rrfFusion(docsDf, col("doc_id"), col("text"),
        terms = Seq("spark", "stream"), kEach = 4, k = 4)
      .collect()
    assert(out.head.getLong(0) === 1L, s"fused top-1 was ${out.head}")
    val byId = out.map(r => r.getLong(0) -> r.getAs[Long]("rrf_micros")).toMap
    // both-arm doc strictly dominates the no-overlap doc
    assert(byId(1L) > byId.getOrElse(4L, 0L))
    // every returned rrf contribution is positive and ranks are 1..n
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to out.length))
  }

  test("quantileSketch: exact below 2^m, bounded relative error above, merge-identical") {
    import spark.implicits._
    import graft.ops.Sketches
    // values spanning both regimes: exact small values + large values
    val vals = (1L to 31L) ++ Seq(100L, 1000L, 50000L, 1000000L, 999999999L)
    val df = vals.toDF("v")
    val sk = Sketches.quantileSketch(df, col("v"))
    val qs = Seq(1 -> 4, 1 -> 2, 3 -> 4, 1 -> 1)
    val est = Sketches.sketchQuantiles(sk, qs).collect()
      .map(r => (r.getAs[Int]("q_num"), r.getAs[Int]("q_den")) -> r.getAs[Long]("est")).toMap
    // type-1 exact quantiles of the 36 values
    val sorted = vals.sorted
    def exact(n: Int, d: Int): Long = sorted(math.max(0, (n * 36 + d - 1) / d - 1))
    qs.foreach { case (n, d) =>
      val e = est((n, d)); val x = exact(n, d)
      if (x < 32) assert(e === x, s"small-regime q=$n/$d")
      else {
        assert(e <= x && x.toDouble <= e * (1.0 + 1.0 / 32) + 32,
          s"q=$n/$d est=$e exact=$x out of grid bound")
      }
    }
    // merge: sketch of chunks, summed, equals the one-shot sketch
    val sk1 = Sketches.quantileSketch(vals.take(18).toDF("v"), col("v"))
    val sk2 = Sketches.quantileSketch(vals.drop(18).toDF("v"), col("v"))
    val merged = sk1.unionByName(sk2).groupBy(col("idx"))
      .agg(sum(col("cnt")).as("cnt"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(canon(merged) === canon(sk))
  }

  test("hllSegmentOverlap: union = register max; disjoint vs identical segments") {
    import spark.implicits._
    import graft.ops.Sketches
    // segments: p and q DISJOINT (1..800 vs 1001..1800), r IDENTICAL
    // to p — at 800 keys the raw estimator is in its working range
    val rows = (1 to 800).map(i => ("p", s"u$i")) ++
      (1001 to 1800).map(i => ("q", s"u$i")) ++
      (1 to 800).map(i => ("r", s"u$i"))
    val df = rows.toDF("seg", "uid")
    val out = Sketches.hllSegmentOverlap(df, col("seg"), col("uid"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val pq = out(("p", "q"))
    val pr = out(("p", "r"))
    // identical segments: identical registers → union estimate equals
    // the per-segment estimate exactly, intersect estimate = est_a
    assert(pr.getAs[Long]("est_union") === pr.getAs[Long]("est_a"))
    assert(pr.getAs[Long]("est_intersect") === pr.getAs[Long]("est_a"))
    assert(pr.getAs[Long]("exact_intersect") === 800L)
    // disjoint segments: union estimate well above either side, and the
    // intersect estimate is small relative to the sets (<20% of 800)
    assert(pq.getAs[Long]("exact_intersect") === 0L)
    assert(pq.getAs[Long]("est_union") > pq.getAs[Long]("est_a"))
    assert(pq.getAs[Long]("est_intersect") < 160L,
      s"disjoint intersect estimate ${pq.getAs[Long]("est_intersect")}")
  }

  test("bitmaps: word-boundary ids, duplicate collapse, exact pair algebra") {
    // ids straddle the 64-bit word boundary (63|64) and repeat; A∩B
    // spans two words. A = {0,63,64,200}, B = {63,64,65,300}
    val df = Seq(("a", 0L), ("a", 63L), ("a", 63L), ("a", 64L), ("a", 200L),
      ("b", 63L), ("b", 64L), ("b", 65L), ("b", 300L)).toDF("seg", "id")
    val bm = Bitmaps.build(df, col("seg"), col("id"))
    // non-empty words only: a → {0 (ids 0,63), 1 (64), 3 (200)}
    assert(bm.filter(col("key") === "a").count() === 3L)
    val card = Bitmaps.cardinality(bm).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("card")).toMap
    assert(card === Map("a" -> 4L, "b" -> 4L))
    val ov = Bitmaps.segmentOverlap(df, col("seg"), col("id")).collect().head
    assert(ov.getAs[Long]("and_card") === 2L) // {63, 64}
    assert(ov.getAs[Long]("or_card") === 6L)
    assert(ov.getAs[Long]("xor_card") === 4L)
    assert(ov.getAs[Long]("andnot_card") === 2L) // {0, 200}
    assert(math.abs(ov.getAs[Double]("jaccard") - 2.0 / 6.0) < 1e-5)
  }

  test("bitmaps: minMax reads extremes off the words, incl. bit 63 and word edges") {
    // ids planted at word boundaries and at bit 63 (the sign bit of
    // the word long — the unsigned-shift smear must not wrap)
    val df = Seq(("a", 63L), ("a", 64L), ("a", 127L), ("a", 100L),
      ("b", 0L), ("b", 5L)).toDF("seg", "id")
    val mm = Bitmaps.minMax(Bitmaps.build(df, col("seg"), col("id")))
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("min_id"), r.getAs[Long]("max_id")))).toMap
    assert(mm === Map("a" -> ((63L, 127L)), "b" -> ((0L, 5L))))
  }

  test("bitmaps: disjoint pair survives with and_card 0; merge law holds") {
    val x = Seq(("p", 1L), ("q", 2L)).toDF("seg", "id")
    val ov = Bitmaps.segmentOverlap(x, col("seg"), col("id")).collect().head
    assert(ov.getAs[Long]("and_card") === 0L && ov.getAs[Long]("or_card") === 2L)
    // merge law (the AggregatingMergeTree posture): union two builds
    // and re-aggregate bit_or == build of the unioned input
    val d1 = Seq(("s", 5L), ("s", 70L)).toDF("seg", "id")
    val d2 = Seq(("s", 5L), ("s", 71L), ("s", 200L)).toDF("seg", "id")
    val merged = Bitmaps.build(d1, col("seg"), col("id"))
      .unionByName(Bitmaps.build(d2, col("seg"), col("id")))
      .groupBy(col("key"), col("w"))
      .agg(expr("bit_or(bits)").as("bits"))
    val direct = Bitmaps.build(d1.unionByName(d2), col("seg"), col("id"))
    assert(merged.collect().toSet === direct.collect().toSet)
    assert(Bitmaps.cardinality(merged).collect().head.getAs[Long]("card") === 4L)
  }

  test("kmv: exact below k; full sketch estimates within KMV error; merge-order independent") {
    // 10 distinct ids with k=64: sketch never fills -> est is the exact count
    val small = spark.range(10).select(lit("g").as("g"), col("id"))
    val sRows = Sketches.kmvDistinct(small, col("g"), col("id"), k = 64).collect()
    assert(sRows.length === 10, "one exploded row per kept hash")
    assert(sRows.forall(_.getAs[Long]("est") === 10L))
    // 5000 distinct with k=64: estimator path; KMV stderr ~ 1/sqrt(k-2) ~ 13%
    val big = spark.range(5000).select(lit("g").as("g"), col("id"))
    val est = Sketches.kmvDistinct(big, col("g"), col("id"), k = 64)
      .select("est").head().getLong(0)
    assert(math.abs(est - 5000L) <= 2000L,
      s"estimate $est vs exact 5000 — outside any plausible KMV error")
    // merge-order independence: radically different partitionings agree
    val a = Sketches.kmvDistinct(big.repartition(13), col("g"), col("id"), k = 64)
      .collect().map(_.toSeq).toSet
    val b = Sketches.kmvDistinct(big.coalesce(1), col("g"), col("id"), k = 64)
      .collect().map(_.toSeq).toSet
    assert(a === b, "k smallest of a union is a function of the k-sets alone")
  }

  test("kmvSetOps: unfilled sketches give EXACT set algebra") {
    // A = {0..29}, B = {20..49}: |A∪B|=50, |A∩B|=10, |A\\B|=|B\\A|=20,
    // all under k=64 so theta stays 2^60 and every estimate is exact.
    val df = spark.range(30).select(lit("A").as("g"), col("id"))
      .union(spark.range(20, 50).select(lit("B").as("g"), col("id")))
    val r = Sketches.kmvSetOps(df, col("g"), col("id"), k = 64).head()
    assert(r.getAs[String]("g_a") === "A" && r.getAs[String]("g_b") === "B")
    assert(r.getAs[Long]("theta") === 1152921504606846976L)
    assert(r.getAs[Long]("union_est") === 50L)
    assert(r.getAs[Long]("inter_est") === 10L)
    assert(r.getAs[Long]("a_not_b_est") === 20L)
    assert(r.getAs[Long]("b_not_a_est") === 20L)
  }

  test("kmvSetOps: filled sketches are self-consistent and in KMV error") {
    // A = {0..3999}, B = {2000..5999}: truth 6000/2000/2000/2000
    val df = spark.range(4000).select(lit("A").as("g"), col("id"))
      .union(spark.range(2000, 6000).select(lit("B").as("g"), col("id")))
    val r = Sketches.kmvSetOps(df, col("g"), col("id"), k = 64).head()
    val (u, i, ab, ba) = (r.getAs[Long]("union_est"), r.getAs[Long]("inter_est"),
      r.getAs[Long]("a_not_b_est"), r.getAs[Long]("b_not_a_est"))
    // the sample partitions into (∩, A\\B, B\\A): directional estimates
    // sum to the union estimate up to the three independent floors
    assert(math.abs(u - (i + ab + ba)) <= 3L,
      s"union $u vs parts ${i + ab + ba} — partition identity broken")
    assert(math.abs(u - 6000L) <= 2500L, s"union_est $u vs 6000")
    assert(math.abs(i - 2000L) <= 1500L, s"inter_est $i vs 2000")
    // partition-order independence (merge is a set union of k-sets)
    val r2 = Sketches.kmvSetOps(df.repartition(17), col("g"), col("id"),
      k = 64).head()
    assert(r2.toSeq === r.toSeq)
  }

  test("kmvSetOps: null ids are skipped (engine contract = oracle guard)") {
    val df = Seq((Some("A"), Some(1L)), (Some("A"), None),
      (Some("B"), Some(1L)), (Some("B"), Some(2L)), (Some("B"), None))
      .toDF("g", "id")
    val r = Sketches.kmvSetOps(df, col("g"), col("id"), k = 8).head()
    assert(r.getAs[Long]("union_est") === 2L)
    assert(r.getAs[Long]("inter_est") === 1L)
    assert(r.getAs[Long]("b_not_a_est") === 1L)
  }

  test("kmvMergeSketches: per-chunk k-sets re-sketch to the one-shot sketch exactly") {
    val df = spark.range(5000).select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("g"), col("id"))
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val oneShot = toMap(
      Sketches.kmvSketchTable(df, col("g"), col("id"), 64).collect())
    val parts = (0 until 4).map(i =>
        Sketches.kmvSketchTable(df.filter(pmod(col("id"), lit(4)) === i),
          col("g"), col("id"), 64))
      .reduce(_ union _)
    val merged = toMap(Sketches.kmvMergeSketches(parts, 64).collect())
    assert(merged === oneShot,
      "k smallest of a union is a function of the k-sets alone")
  }
}
