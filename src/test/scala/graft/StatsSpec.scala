package graft

import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Semantics of the ClickHouse statistical-test analogs on planted
  * fixtures, each checked against a hand-computed closed form:
  * Welch/Student t on a tiny two-arm sample, Mann–Whitney exact U and
  * tie correction (doubled-rank identity), KS sup over value
  * boundaries with smallest-v argmax tiebreak, Cramér's V on a
  * perfectly-associated 2×2 table, Theil's U asymmetry, and the
  * degenerate guards (singleton arm, constant column → null stats).
  * Bucket invariance: the rank tests' two-phase cumulative must give
  * identical answers for any bucketWidth (values planted to straddle
  * bucket boundaries, including negatives exercising floorDiv).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  // arms: A = (1, 2, 3), B = (2, 4) — small enough for exact hand math
  private def armed = Seq(
    (true, 1L), (true, 2L), (true, 3L), (false, 2L), (false, 4L)
  ).toDF("is_a", "v")

  test("welchTTest matches the closed form on a tiny two-arm sample") {
    val r = Stats.welchTTest(armed, col("is_a"), col("v")).collect().head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[String]("s1_a") === "6" && r.getAs[String]("s2_a") === "14")
    // mean_a = 2, mean_b = 3; var_a = 1, var_b = 2
    // se = 1/3 + 2/2 = 4/3; t = (2-3)/sqrt(4/3) = -sqrt(3)/2
    assert(math.abs(r.getAs[Double]("mean_a") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_stat") - (-math.sqrt(3.0) / 2)) < 1e-5)
    // df_w = (4/3)² / ((1/3)²/2 + 1²/1) = (16/9)/(1/18 + 1) = 32/19
    assert(math.abs(r.getAs[Double]("df_w") - 32.0 / 19.0) < 1e-5)
  }

  test("studentTTest pooled variance and integer df") {
    val r = Stats.studentTTest(armed, col("is_a"), col("v")).collect().head
    // sp² = (2·1 + 1·2)/3 = 4/3; t = -1/sqrt((4/3)(1/3+1/2)) = -sqrt(0.9)
    assert(math.abs(r.getAs[Double]("t_stat") - (-math.sqrt(0.9))) < 1e-5)
    assert(r.getAs[Long]("df_s") === 3L)
  }

  test("degenerate guards: singleton arm and constant column null out") {
    val single = Seq((true, 5L), (false, 3L), (false, 4L)).toDF("is_a", "v")
    val r1 = Stats.welchTTest(single, col("is_a"), col("v")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("t_stat")) && r1.isNullAt(r1.fieldIndex("df_w")))
    val const = Seq((true, 7L), (true, 7L), (false, 7L), (false, 7L)).toDF("is_a", "v")
    val r2 = Stats.studentTTest(const, col("is_a"), col("v")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("t_stat")))
    val r3 = Stats.mannWhitneyU(const, col("is_a"), col("v")).collect().head
    assert(r3.isNullAt(r3.fieldIndex("z")))
  }

  test("mannWhitneyU exact U, tie correction, and bucket invariance") {
    // A = (1, 2), B = (2, 5): ranks 1, 2.5 | 2.5, 4
    // R_a = 3.5 → U_a = 3.5 − 3 = 0.5; ties: one group of 2 → Σ(t³−t)=6
    val df = Seq((true, 1L), (true, 2L), (false, 2L), (false, 5L))
      .toDF("is_a", "v")
    for (bw <- Seq(1L, 2L, 1L << 20)) {
      val r = Stats.mannWhitneyU(df, col("is_a"), col("v"), bw).collect().head
      assert(r.getAs[String]("u2_a") === "1", s"bw=$bw")   // 2·U_a
      assert(r.getAs[String]("u2_b") === "7", s"bw=$bw")
      assert(r.getAs[String]("tie_sum") === "6", s"bw=$bw")
      assert(math.abs(r.getAs[Double]("u_a") - 0.5) < 1e-12)
      // σ² = (2·2/12)·(5 − 6/(4·3)) = (1/3)·4.5 = 1.5; z = (0.5−2)/√1.5
      assert(math.abs(r.getAs[Double]("z") - (-1.5 / math.sqrt(1.5))) < 1e-5)
    }
  }

  test("rank tests handle negative values across bucket boundaries") {
    // values straddle 0 so floorDiv bucketing must order (−3,−1,2,4)
    val df = Seq((true, -3L), (true, 2L), (false, -1L), (false, 4L))
      .toDF("is_a", "v")
    val expected = Stats.mannWhitneyU(df, col("is_a"), col("v"), 1L << 40)
      .collect().head
    for (bw <- Seq(1L, 2L, 3L)) {
      val r = Stats.mannWhitneyU(df, col("is_a"), col("v"), bw).collect().head
      assert(r.getAs[String]("u2_a") === expected.getAs[String]("u2_a"), s"bw=$bw")
      assert(r.getAs[Double]("z") === expected.getAs[Double]("z"), s"bw=$bw")
    }
  }

  test("ksTest exact D and smallest-v argmax tiebreak") {
    // A = (1, 3), B = (2, 4): F diffs at v=1,2,3,4 are 1/2,0,1/2,0 —
    // D = 1/2 attained at v=1 and v=3; tiebreak must report v=1
    val df = Seq((true, 1L), (true, 3L), (false, 2L), (false, 4L))
      .toDF("is_a", "v")
    for (bw <- Seq(1L, 2L, 1L << 20)) {
      val r = Stats.ksTest(df, col("is_a"), col("v"), bw).collect().head
      assert(r.getAs[String]("d_num") === "2", s"bw=$bw") // |cwa·nb − cwb·na|
      assert(r.getAs[Long]("at_v") === 1L, s"bw=$bw")
      assert(math.abs(r.getAs[Double]("d_stat") - 0.5) < 1e-12)
      assert(math.abs(r.getAs[Double]("ks_z") - 0.5) < 1e-6) // √(4/4)·0.5
    }
  }

  test("cramersV is 1 on a perfectly-associated table, null on constant") {
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val r = Stats.cramersV(perfect, col("a"), col("b")).collect().head
    assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0) < 1e-5)
    val const = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    val r2 = Stats.cramersV(const, col("a"), col("b")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("v")))
  }

  test("rankCorr: Spearman with midrank ties, bucket-invariant") {
    // x = (1,2,2,4), y = (10,20,30,30): monotone up to ties.
    // rank_x = 1, 2.5, 2.5, 4 | rank_y = 1, 2, 3.5, 3.5
    // pairs (1,1) (2.5,2) (2.5,3.5) (4,3.5): devs x (−1.5,0,0,1.5),
    // y (−1.5,−0.5,1,1) → Σxy=3.75, Σx²=Σy²=4.5 → ρ = 5/6
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (4L, 30L)).toDF("x", "y")
    for (bw <- Seq(1L, 3L, 1L << 20)) {
      val r = Stats.rankCorr(df, col("x"), col("y"), bw).collect().head
      assert(r.getAs[Long]("n") === 4L, s"bw=$bw")
      assert(math.abs(r.getAs[Double]("rho") - 5.0 / 6.0) < 1e-5, s"bw=$bw")
    }
    // perfect monotone → ρ = 1; constant axis → null
    val mono = Seq((1L, 5L), (2L, 9L), (3L, 11L)).toDF("x", "y")
    val rm = Stats.rankCorr(mono, col("x"), col("y")).collect().head
    assert(math.abs(rm.getAs[Double]("rho") - 1.0) < 1e-12)
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    val rc = Stats.rankCorr(const, col("x"), col("y")).collect().head
    assert(rc.isNullAt(rc.fieldIndex("rho")))
  }

  test("meanZTest with known variances; empty arm nulls out") {
    // A = (2, 4) mean 3, B = (1,) mean 1; σ²_a = 8, σ²_b = 2
    // se = 8/2 + 2/1 = 6 → z = 2/√6
    val df = Seq((true, 2L), (true, 4L), (false, 1L)).toDF("is_a", "v")
    val r = Stats.meanZTest(df, col("is_a"), col("v"), 8.0, 2.0).collect().head
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(6.0)) < 1e-5)
    val oneArm = Seq((true, 2L)).toDF("is_a", "v")
    val r2 = Stats.meanZTest(oneArm, col("is_a"), col("v"), 1.0, 1.0).collect().head
    assert(r2.isNullAt(r2.fieldIndex("z")))
  }

  test("rounding ladders: exp2 boundaries, duration steps, age bands") {
    import graft.functions.Rounding
    val df = Seq(0L, 1L, 2L, 3L, 7L, 8L, 1023L, 1024L).toDF("x")
    val exp2 = df.select(Rounding.roundToExp2(col("x"))).collect()
      .map(_.getLong(0)).toSeq
    assert(exp2 === Seq(0L, 1L, 2L, 2L, 4L, 8L, 512L, 1024L))
    val dd = Seq(0L, 1L, 9L, 10L, 59L, 60L, 36001L).toDF("x")
    val dur = dd.select(Rounding.roundDuration(col("x"))).collect()
      .map(_.getLong(0)).toSeq
    assert(dur === Seq(0L, 1L, 1L, 10L, 30L, 60L, 36000L))
    val ad = Seq(0L, 1L, 17L, 18L, 24L, 25L, 54L, 55L, 90L).toDF("x")
    val age = ad.select(Rounding.roundAge(col("x"))).collect()
      .map(_.getLong(0)).toSeq
    // 1..17 rounds UP to 17 — the one non-monotone band, pinned
    assert(age === Seq(0L, 17L, 17L, 18L, 18L, 25L, 45L, 55L, 55L))
  }

  test("proportionsZTest: pooled and unpooled z and CI match hand computation") {
    // A: 3/4 successes, B: 1/4. p̂ = 4/8 = 0.5
    // pooled  se² = 0.5·0.5·(1/4+1/4) = 0.125 → z = 0.5/√0.125 = √2
    // unpooled se² = 0.75·0.25/4 + 0.25·0.75/4 = 0.09375
    val df = Seq((true, true), (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false))
      .toDF("is_a", "s")
    val rp = Stats.proportionsZTest(df, col("is_a"), col("s")).collect().head
    assert(math.abs(rp.getAs[Double]("p_a") - 0.75) < 1e-9)
    assert(math.abs(rp.getAs[Double]("p_b") - 0.25) < 1e-9)
    assert(math.abs(rp.getAs[Double]("z") - math.sqrt(2.0)) < 1e-5)
    val seP = math.sqrt(0.125)
    assert(math.abs(rp.getAs[Double]("ci_lo") - (0.5 - 1.959963984540054 * seP)) < 1e-5)
    assert(math.abs(rp.getAs[Double]("ci_hi") - (0.5 + 1.959963984540054 * seP)) < 1e-5)
    val ru = Stats.proportionsZTest(df, col("is_a"), col("s"),
      pooled = false).collect().head
    assert(math.abs(ru.getAs[Double]("z") - 0.5 / math.sqrt(0.09375)) < 1e-5)
    // degenerate: all-success both arms → pooled variance 0 → null z
    val allS = Seq((true, true), (false, true)).toDF("is_a", "s")
    val rd = Stats.proportionsZTest(allS, col("is_a"), col("s")).collect().head
    assert(rd.isNullAt(rd.fieldIndex("z")))
  }

  test("cramersV bias-corrected variant shrinks toward 0 on small n") {
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val r = Stats.cramersV(perfect, col("a"), col("b")).collect().head
    // φ² = 1, correction (r−1)(c−1)/(n−1) = 1/3 → φ²_bc = 2/3;
    // r_bc = c_bc = 2 − 1/3 = 5/3 → min−1 = 2/3 → v_bc = 1
    assert(math.abs(r.getAs[Double]("v_bc") - 1.0) < 1e-5)
    // independent 2×2 uniform: φ² = 0 → v_bc = 0
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L)).toDF("a", "b")
    val ri = Stats.cramersV(indep, col("a"), col("b")).collect().head
    assert(ri.getAs[Double]("v_bc") === 0.0)
  }

  test("linearRegression: exact slope/intercept per group; constant-x nulls") {
    // group g: y = 3x + 2 exactly → slope 3, intercept 2
    val df = Seq(("g", 0L, 2L), ("g", 1L, 5L), ("g", 2L, 8L),
      ("c", 4L, 1L), ("c", 4L, 9L)).toDF("k", "x", "y")
    val out = Stats.linearRegression(df, col("k"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(math.abs(out("g").getAs[Double]("slope") - 3.0) < 1e-12)
    assert(math.abs(out("g").getAs[Double]("intercept") - 2.0) < 1e-12)
    assert(out("c").isNullAt(out("c").fieldIndex("slope")))
  }

  test("columnEntropy: uniform 4 values → 2 bits; constant → 0") {
    val uniform = Seq(1L, 2L, 3L, 4L).toDF("v")
    val r = Stats.columnEntropy(uniform, col("v")).collect().head
    assert(r.getAs[Long]("card") === 4L)
    assert(math.abs(r.getAs[Double]("entropy_bits") - 2.0) < 1e-5)
    val const = Seq(9L, 9L).toDF("v")
    val rc = Stats.columnEntropy(const, col("v")).collect().head
    assert(rc.getAs[Double]("entropy_bits") === 0.0)
  }

  test("contingency coefficient: √(φ²/(φ²+1)) alongside v") {
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val r = Stats.cramersV(perfect, col("a"), col("b")).collect().head
    // φ² = 1 → C = √(1/2)
    assert(math.abs(r.getAs[Double]("c_coef") - math.sqrt(0.5)) < 1e-5)
  }

  test("equiDepthHistogram: whole ties per bin, exact rank cuts, bucket-invariant") {
    // 8 values into 4 bins of depth 2; value 30 has count 3 and its
    // FIRST element sits at rank 5 → bin 2 takes the whole tie (3 rows)
    val df = Seq(10L, 11L, 20L, 21L, 30L, 30L, 30L, 40L).toDF("v")
    for (bw <- Seq(1L, 7L, 1L << 20)) {
      val out = Stats.equiDepthHistogram(df, col("v"), nBins = 4, bw)
        .collect().map(r => (r.getAs[Long]("bin"),
          (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("cnt")))).toMap
      assert(out === Map(0L -> ((10L, 11L, 2L)), 1L -> ((20L, 21L, 2L)),
        2L -> ((30L, 30L, 3L)), 3L -> ((40L, 40L, 1L))), s"bw=$bw")
    }
  }

  test("anovaF: closed form on three groups; degenerate guards") {
    // groups: (1,2,3), (4,5,6), (7,8,9): means 2,5,8, grand 5
    // SSB = 3·(9+0+9) = 54, SSW = 3·2 = 6 → F = (54/2)/(6/6) = 27
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("g", "v")
    val r = Stats.anovaF(df, col("v"), col("g")).collect().head
    assert(math.abs(r.getAs[Double]("f_stat") - 27.0) < 1e-4)
    assert(r.getAs[Long]("df_between") === 2L && r.getAs[Long]("df_within") === 6L)
    // single group → null F; zero within-variance → null F
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r1 = Stats.anovaF(one, col("v"), col("g")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("f_stat")))
    val flat = Seq(("a", 3L), ("a", 3L), ("b", 7L), ("b", 7L)).toDF("g", "v")
    val r2 = Stats.anovaF(flat, col("v"), col("g")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_stat")))
  }

  test("tukeyOutliers: exact quartile fences, rational arithmetic, bucket-invariant") {
    // key a: values 1..8 plus spikes -100 and 200 (n=10)
    // type-1 quartiles: q1 = v at rank ceil(10/4)=3 → 2; q3 at rank
    // ceil(3·10/4)=8 → 7; IQR=5 → fences [2-7.5, 7+7.5] = [-5.5, 14.5]
    // → one low outlier (-100), one high (200)
    val vals = Seq(-100L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 200L)
    val df = vals.map(("a", _)).toDF("k", "v")
    for (bw <- Seq(1L, 3L, 1L << 20)) {
      val r = Stats.tukeyOutliers(df, col("k"), col("v"),
        bucketWidth = bw).collect().head
      assert(r.getAs[Long]("q1") === 2L && r.getAs[Long]("q3") === 7L, s"bw=$bw")
      assert(r.getAs[Long]("n_low") === 1L && r.getAs[Long]("n_high") === 1L, s"bw=$bw")
    }
    // constant series: IQR 0 → fences collapse to the value, 0 outliers
    val const = Seq(("a", 5L), ("a", 5L), ("a", 5L)).toDF("k", "v")
    val rc = Stats.tukeyOutliers(const, col("k"), col("v")).collect().head
    assert(rc.getAs[Long]("n_low") === 0L && rc.getAs[Long]("n_high") === 0L)
  }

  test("theilsU: U(a|b)=1 when b determines a; asymmetric when not") {
    // b determines a (each b value maps to one a), but a does NOT
    // determine b (a=x spreads over b=1,2) → U(a|b)=1, U(b|a)<1
    val df = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("y", 3L)).toDF("a", "b")
    val ab = Stats.theilsU(df, col("a"), col("b")).collect().head
    assert(math.abs(ab.getAs[Double]("u") - 1.0) < 1e-5)
    val ba = Stats.theilsU(df, col("b"), col("a")).collect().head
    assert(ba.getAs[Double]("u") < 0.999)
    val const = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    val r = Stats.theilsU(const, col("a"), col("b")).collect().head
    assert(r.isNullAt(r.fieldIndex("u")))
  }

  test("corrMatrix: one-pass pairwise Pearson; constant column nulls its pairs") {
    // y = 2x (corr 1), z = -x (corr -1 with x, -1 with y), c constant
    val df = Seq((1L, 2L, -1L, 5L), (2L, 4L, -2L, 5L), (3L, 6L, -3L, 5L))
      .toDF("x", "y", "z", "c")
    val out = Stats.corrMatrix(df, Seq("x" -> col("x"), "y" -> col("y"),
        "z" -> col("z"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size === 6)
    assert(out(("x", "y")) === Some(1.0))
    assert(out(("x", "z")) === Some(-1.0) && out(("y", "z")) === Some(-1.0))
    assert(out(("x", "c")) === None && out(("y", "c")) === None &&
      out(("z", "c")) === None)
    // underscore-bearing names whose NAME-derived aliases would
    // collide ((a, b_c) vs (a_b, c) → sp_a_b_c) must work: internal
    // aliases are positional and display names never enter parsed SQL
    val tricky = Seq((1L, 2L, 3L, 4L), (2L, 4L, 5L, 9L), (3L, 6L, 9L, 1L))
      .toDF("w1", "w2", "w3", "w4")
    val t = Stats.corrMatrix(tricky, Seq("a" -> col("w1"), "b_c" -> col("w2"),
        "a_b" -> col("w3"), "c" -> col("w4")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(t.size === 6 && t.contains(("a", "b_c")) && t.contains(("a_b", "c")))
  }

  test("rocAuc: exact AUC with midrank ties, bucket-invariant") {
    // pos = (1,2,3) vs neg = (2,4): of the 6 (pos, neg) pairs one is a
    // win (3>2) and one a tie (2=2) → U = 1.5, AUC = 1.5/6 = 0.25
    for (bw <- Seq(1L, 2L, 1L << 20)) {
      val r = Stats.rocAuc(armed, col("is_a"), col("v"),
        bucketWidth = bw).collect().head
      assert(r.getAs[Long]("n_pos") === 3L && r.getAs[Long]("n_neg") === 2L)
      assert(r.getAs[String]("u2_pos") === "3", s"bw=$bw") // 2·U exact
      assert(math.abs(r.getAs[Double]("auc") - 0.25) < 1e-9, s"bw=$bw")
    }
    // one-class input nulls out
    val oneClass = Seq((true, 1L), (true, 2L)).toDF("is_a", "v")
    val r1 = Stats.rocAuc(oneClass, col("is_a"), col("v")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("auc")))
  }

  test("categoricalWoe: hand WoE/IV; empty-side category nulls out") {
    // X: 3 pos / 1 neg, Y: 1 pos / 3 neg → goods = bads = 4
    // WoE_X = ln((3/4)/(1/4)) = ln 3; IV term = (3/4 − 1/4)·ln 3
    val df = Seq(("x", true), ("x", true), ("x", true), ("x", false),
      ("y", true), ("y", false), ("y", false), ("y", false))
      .toDF("cat", "p")
    val rows = Stats.categoricalWoe(df, col("cat"), col("p"))
      .collect().map(r => r.getAs[String]("cat") -> r).toMap
    val ln3 = math.log(3.0)
    assert(math.abs(rows("x").getAs[Double]("woe") - ln3) < 1e-5)
    assert(math.abs(rows("y").getAs[Double]("woe") + ln3) < 1e-5)
    // both categories contribute the same positive IV term 0.5·ln 3
    assert(math.abs(rows("x").getAs[Double]("iv") - 0.5 * ln3) < 1e-5)
    assert(math.abs(rows("y").getAs[Double]("iv") - 0.5 * ln3) < 1e-5)
    // a category with no negatives has infinite WoE → null, counts kept
    val withEmpty = df.union(Seq(("z", true), ("z", true)).toDF("cat", "p"))
    val z = Stats.categoricalWoe(withEmpty, col("cat"), col("p"))
      .collect().find(_.getAs[String]("cat") == "z").get
    assert(z.getAs[Long]("n_pos") === 2L && z.getAs[Long]("n_neg") === 0L)
    assert(z.isNullAt(z.fieldIndex("woe")) && z.isNullAt(z.fieldIndex("iv")))
  }

  test("cuped: perfectly-correlated covariate collapses variance; means stay unbiased") {
    // pair p = i/2 puts one unit in each arm with IDENTICAL pre value
    // (so cov(X, arm) = 0 and pooled theta = 1 exactly); post = pre +
    // 1000 + 500·arm — X fully predicts Y within arm, so var_adj = 0
    // while var_post is the raw post variance.
    val rows = (0L until 40L).map { i =>
      val arm = i % 2
      val pre = 1000L + (i / 2) * 10L
      Seq((i, arm, true, pre),
          (i, arm, false, pre + 1000L + arm * 500L))
    }.flatten
    val df = rows.toDF("u", "arm", "pre", "v")
    val out = Stats.cuped(df, col("u"), col("arm"), col("pre"), col("v"))
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    assert(out.keySet === Set(0L, 1L))
    val v0 = out(0L); val v1 = out(1L)
    assert(v0.getAs[Long]("n_units") === 20L)
    // raw post variance per arm: values step by 20 over 20 units
    assert(v0.getAs[Double]("var_post") > 1000.0)
    // theta = pooled cov/var = 1 exactly (Y = X + const within arm)
    assert(math.abs(v0.getAs[Double]("theta") - 1.0) < 1e-9)
    // adjustment removes ALL within-arm variance
    assert(math.abs(v0.getAs[Double]("var_adj")) < 1e-6)
    assert(math.abs(v1.getAs[Double]("var_adj")) < 1e-6)
    // adjusted-mean DIFFERENCE preserves the true effect (500):
    // CUPED shifts both arms by theta*(mean_x_g - mu_x) and the arm
    // pre-means differ here, so the per-arm shift is nonzero but the
    // contrast stays the designed uplift.
    val diff = v1.getAs[Double]("mean_adj") - v0.getAs[Double]("mean_adj")
    assert(math.abs(diff - 500.0) < 1.0, s"adjusted uplift $diff vs 500")
  }

  test("cuped: zero-variance covariate degrades to the raw estimator") {
    val rows = (0L until 10L).flatMap { i =>
      Seq((i, i % 2, true, 7L), (i, i % 2, false, 100L + i))
    }
    val df = rows.toDF("u", "arm", "pre", "v")
    val out = Stats.cuped(df, col("u"), col("arm"), col("pre"), col("v"))
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    // varnum = 0 → theta = 0 → adjusted == raw
    assert(out.values.forall(r => r.getAs[Double]("theta") === 0.0))
    out.values.foreach { r =>
      assert(r.getAs[Double]("mean_adj") === r.getAs[Double]("mean_post"))
      assert(r.getAs[Double]("var_adj") === r.getAs[Double]("var_post"))
    }
  }

  test("cuped: singleton arm nulls its variances, keeps sums") {
    val df = Seq((1L, 0L, true, 5L), (1L, 0L, false, 9L),
      (2L, 1L, true, 3L), (2L, 1L, false, 4L),
      (3L, 1L, true, 6L), (3L, 1L, false, 8L)).toDF("u", "arm", "pre", "v")
    val out = Stats.cuped(df, col("u"), col("arm"), col("pre"), col("v"))
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    val solo = out(0L)
    assert(solo.getAs[Long]("n_units") === 1L)
    assert(solo.getAs[String]("s_pre") === "5" && solo.getAs[String]("s_post") === "9")
    assert(solo.isNullAt(solo.fieldIndex("var_post")))
    assert(solo.isNullAt(solo.fieldIndex("var_adj")))
  }

  test("cupedWelch: composes cuped's per-arm rows; reduction realized on a noisy fixture") {
    // same paired design as the cuped fixture, plus a pair-alternating
    // mean-zero residual the covariate can't explain — so var_adj
    // shrinks toward the residual variance instead of 0
    val rows = (0L until 40L).map { i =>
      val arm = i % 2; val pair = i / 2
      val pre = 1000L + pair * 10L
      val noise = if (pair % 2 == 0) -50L else 50L
      Seq((i, arm, true, pre),
          (i, arm, false, pre + 1000L + arm * 500L + noise))
    }.flatten
    val df = rows.toDF("u", "arm", "pre", "v")
    val w = Stats.cupedWelch(df, col("u"), col("arm"), col("pre"), col("v"))
      .head()
    assert(w.getAs[Long]("n_a") === 20L && w.getAs[Long]("n_b") === 20L)
    val tRaw = w.getAs[Double]("t_raw"); val tAdj = w.getAs[Double]("t_adj")
    val red = w.getAs[Double]("var_reduction")
    assert(tRaw > 0 && tAdj > 0, "arm 1 is designed 500 higher")
    assert(red > 0.3 && red < 0.95, s"var_reduction $red out of band")
    assert(tAdj > tRaw, "smaller variance, same contrast => larger t")
    // structural parity: recompute both t's from cuped's own rows
    val c = Stats.cuped(df, col("u"), col("arm"), col("pre"), col("v"))
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    def t(m0: Double, m1: Double, v0: Double, v1: Double) =
      (m1 - m0) / math.sqrt(v0 / 20.0 + v1 / 20.0)
    val expRaw = t(c(0L).getAs[Double]("mean_post"), c(1L).getAs[Double]("mean_post"),
      c(0L).getAs[Double]("var_post"), c(1L).getAs[Double]("var_post"))
    val expAdj = t(c(0L).getAs[Double]("mean_adj"), c(1L).getAs[Double]("mean_adj"),
      c(0L).getAs[Double]("var_adj"), c(1L).getAs[Double]("var_adj"))
    assert(math.abs(tRaw - expRaw) < 2e-6 && math.abs(tAdj - expAdj) < 2e-6)
  }

  test("anovaPartials: chunked partials re-sum to the one-shot anovaF exactly") {
    val df = spark.range(300).select(col("id"),
      concat(lit("g"), pmod(col("id"), lit(4))).as("g"),
      (pmod(col("id") * 7, lit(1000)) + pmod(col("id"), lit(13))).as("v"))
    val whole = Stats.anovaF(df, col("v"), col("g")).head().toSeq
    val parts = (0 until 3).map(i =>
        Stats.anovaPartials(df.filter(pmod(col("id"), lit(3)) === i),
          col("v"), col("g")))
      .reduce(_ union _)
    val merged = parts.groupBy(col("g")).agg(
      sum(col("ng")).as("ng"), sum(col("s1g")).as("s1g"),
      sum(col("s2g")).as("s2g"))
    assert(Stats.anovaFromPartials(merged).head().toSeq === whole,
      "additive partials must be bit-identical to the one-shot build")
  }

  test("corrMatrixPartials: chunked partials re-sum to the one-shot corrMatrix exactly") {
    val df = spark.range(240).select(col("id"),
      pmod(col("id") * 17, lit(101)).as("a"),
      (pmod(col("id") * 17, lit(101)) * 2 + pmod(col("id"), lit(7))).as("b"),
      pmod(col("id") * 29, lit(53)).as("c"))
    val spec = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    val whole = Stats.corrMatrix(df, spec).collect().map(_.toSeq).toSet
    val parts = (0 until 3).map(i =>
        Stats.corrMatrixPartials(df.filter(pmod(col("id"), lit(3)) === i),
          spec))
      .reduce(_ union _)
    val adds = Stats.corrMatrixAddCols(3)
    val merged = parts.groupBy(col("k"))
      .agg(sum(col(adds.head)).as(adds.head),
        adds.tail.map(c => sum(col(c)).as(c)): _*)
    val inc = Stats.corrMatrixFromPartials(merged, spec.map(_._1))
      .collect().map(_.toSeq).toSet
    assert(inc === whole,
      "additive partials must be bit-identical to the one-shot build")
    // sanity: a-b strongly positive (b is 2a + small noise)
    val ab = Stats.corrMatrix(df, spec).collect()
      .find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Double]("corr") > 0.99)
  }

  test("minSampleSizeContinuous: closed form on a hand sample; degenerate guards") {
    import spark.implicits._
    // g=a: values 10,20,30 (mean 20, sample var 100); 5% MDE => delta=1
    // n = (z975+z80)^2 * 2*100 / 1 = 7.8489...*200 = 1569.79 -> 1570
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L), ("b", 7L),
      ("c", 5L)).toDF("g", "v")
    val out = Stats.minSampleSizeContinuous(df, col("g"), col("v"), 5)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("mean") === 20.0 && a.getAs[Double]("variance") === 100.0)
    val z = Stats.Z975 + Stats.Z80
    assert(a.getAs[Long]("n_needed") === math.ceil(z * z * 200.0).toLong)
    // constant column (var 0) and singleton group null out
    assert(out("b").isNullAt(out("b").fieldIndex("n_needed")))
    assert(out("c").isNullAt(out("c").fieldIndex("n_needed")))
  }

  test("minSampleSizeConversion: two-proportion form; p2 >= 1 nulls out") {
    import spark.implicits._
    // g=a: 1 conversion in 4 (p1=0.25, p2=0.275, delta=0.025)
    val df = Seq(("a", true), ("a", false), ("a", false), ("a", false),
      ("z", true), ("z", true)).toDF("g", "c")
    val out = Stats.minSampleSizeConversion(df, col("g"), col("c"), 10)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("p1") === 0.25 && a.getAs[Double]("p2") === 0.275)
    val p1 = 0.25; val p2 = 0.275; val pbar = (p1 + p2) / 2
    val num = Stats.Z975 * math.sqrt(2 * pbar * (1 - pbar)) +
      Stats.Z80 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    assert(a.getAs[Long]("n_needed") ===
      math.ceil(num * num / (0.025 * 0.025)).toLong)
    // p1 = 1 -> p2 = 1.1 >= 1: planning impossible, null
    assert(out("z").isNullAt(out("z").fieldIndex("n_needed")))
  }
}
