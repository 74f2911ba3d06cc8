package graft

import org.apache.spark.sql.functions._

import graft.ops.TDigest

/** TDigest semantics pinned by hand and by construction: grid
  * monotonicity + error bound, fixed compression size, ACCURACY vs the
  * exact quantiles, order/partitioning invariance (the property that
  * makes the sketch hash-gateable at all), and the heavy-value edge.
  * (q_quantile_tdigest / _inc oracle-gate the full pipeline corpus-
  * wide; these specs pin the claims the gate can't see.) */
class TDigestSpec extends SparkSpec {

  import spark.implicits._

  private val m = 8
  private val qs = Seq(1 -> 100, 1 -> 4, 1 -> 2, 3 -> 4, 99 -> 100)

  test("gridIdx is monotone and gridValue truncates within 2^-m relative error") {
    // mix of exact-region, large, boundary (2^m, 2^(m+1)), and negative
    val vals: Seq[Long] = Seq(Long.MinValue + 2, -987654321098L, -65537L,
      -65536L, -513L, -512L, -511L, -257L, -256L, -255L, -1L, 0L, 1L,
      255L, 256L, 257L, 511L, 512L, 513L, 65535L, 65536L, 1234567890123L,
      (1L << 61) - 1)
    val df = vals.toDF("v")
      .select(col("v"), TDigest.gridIdx(col("v"), m).as("idx"))
      .select(col("v"), col("idx"), TDigest.gridValue(col("idx"), m).as("dec"))
      .orderBy(col("v"))
      .collect()
    df.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1),
        s"idx must be monotone: v=${a.getLong(0)}→${a.getLong(1)}, " +
          s"v=${b.getLong(0)}→${b.getLong(1)}")
    }
    df.foreach { r =>
      val (v, dec) = (r.getLong(0), r.getLong(2))
      assert(math.signum(v.toDouble) == math.signum(dec.toDouble) || v == 0,
        s"decode must keep the sign: $v → $dec")
      assert(math.abs(dec) <= math.abs(v), s"decode truncates toward zero: $v → $dec")
      if (v != 0)
        assert(math.abs(v - dec).toDouble / math.abs(v).toDouble <= math.pow(2, -m),
          s"relative error bound: $v → $dec")
      if (math.abs(v) < (1L << m))
        assert(dec === v, s"small values are EXACT: $v → $dec")
    }
  }

  test("digest respects the fixed compression bound and covers all weight") {
    val df = spark.range(0, 50000)
      .select((pmod(hash(col("id")), lit(2000000L)) - 1000000L).as("v"))
    val st = TDigest.sketch(df, col("v"))
    val dig = TDigest.digest(st, delta = 64, m = m).collect()
    assert(dig.length <= 64, s"fixed compression: ${dig.length} centroids")
    assert(dig.length >= 32, "a continuous axis should fill most centroids")
    assert(dig.map(_.getLong(1)).sum === 50000L, "centroid weights cover N")
  }

  test("quantile estimates track the exact quantiles on a continuous axis") {
    val n = 200000L
    val df = spark.range(0, n)
      .select((pmod(hash(col("id")), lit(2000000000L)) - 1000000000L).as("v"))
    val est = TDigest.quantileTDigest(df, col("v"), qs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = df.stat
      .approxQuantile("v", qs.map { case (a, b) => a.toDouble / b }.toArray, 0.0)
    qs.zip(exact).foreach { case ((qn, qd), ex) =>
      val e = est((qn, qd)).toDouble
      // grid resolution 2^-8 + k0 rank resolution ~1/delta of the range
      // around the quantile; on ~uniform data 2% of |range| is generous
      assert(math.abs(e - ex) <= 0.02 * 2000000000L,
        s"q=$qn/$qd: est $e vs exact $ex")
    }
  }

  test("sketch/digest/quantiles are invariant to partitioning and chunked merge") {
    val df = spark.range(0, 30000)
      .select((pmod(hash(col("id")), lit(3000000L)) - 1500000L).as("v"),
        (lit(1L) + pmod(col("id"), lit(7L))).as("w"))
    val whole = TDigest.quantileTDigest(df.repartition(1), col("v"), qs,
      w = col("w")).collect().map(_.toSeq).toSet
    val shredded = TDigest.quantileTDigest(df.repartition(17), col("v"), qs,
      w = col("w")).collect().map(_.toSeq).toSet
    assert(whole === shredded, "partitioning must not change a single bit")
    // chunked build: sum three partial histograms, then digest — must
    // equal the one-shot build exactly (the MV merge-on-read path)
    val parts = (0 until 3).map { i =>
      TDigest.sketch(df.filter(pmod(col("id"), lit(3)) === i), col("v"),
        col("w"))
    }
    val merged = parts.reduce(_ union _)
      .groupBy(col("idx")).agg(sum(col("w")).as("w"))
    val viaMerge = TDigest.quantiles(TDigest.digest(merged), qs)
      .collect().map(_.toSeq).toSet
    assert(viaMerge === whole, "chunked merge must be bit-identical")
  }

  test("a dominant single value anchors the median to its neighborhood") {
    // half of all weight on exactly 777000: the median's centroid is
    // dominated by that atom, so the estimate must land within the
    // grid's relative resolution of it (plus the pull of the few
    // cohabiting buckets — 2^-(m-1) covers both). A skew-blind sketch
    // (uniform bins over the range) would miss by ~the bin width here.
    val heavy = spark.range(0, 10000).select(lit(777000L).as("v"))
    val rest = spark.range(0, 9999)
      .select(pmod(hash(col("id")), lit(2000000L)).as("v"))
    val est = TDigest.quantileTDigest(heavy.union(rest), col("v"),
      Seq(1 -> 2)).collect().head.getLong(2)
    assert(math.abs(est - 777000L) <= 777000L * math.pow(2, -(m - 1)),
      s"median must sit in the heavy atom's neighborhood: $est vs 777000")
  }
}
