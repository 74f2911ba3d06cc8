package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, mergeable t-digest — the approximate-quantile
  * workhorse ClickHouse dashboards run at scale (`quantileTDigest` /
  * `quantileBFloat16`), re-derived so that parallel, incremental, and
  * one-shot builds are all BIT-IDENTICAL and the whole pipeline
  * replays exactly in the DuckDB oracle (the KMV/HLL precedent).
  *
  * Why the stock t-digest can't be the hash-gated form: its centroids
  * depend on insertion/merge ORDER, and Spark's partial-aggregate
  * order is nondeterministic by design. The fix is the two-layer
  * architecture ClickHouse itself uses for `quantileBFloat16`:
  *
  *  1. STATE — a signed log-linear grid histogram over µ-quantized
  *     integers (exact below 2^m in magnitude; above, the bucket keeps
  *     the top m mantissa bits, i.e. relative error ≤ 2^−m — m = 8 is
  *     the bfloat16-class resolution). The grid is FIXED, so the state
  *     is a plain additive (idx, w) counter map: order-insensitive,
  *     mergeable by addition (a SummingStore MV maintains it like any
  *     rollup), and bounded by CONSTRUCTION at ≤ 2·((64−m)·2^m + 2^m)
  *     counters (m = 8 → ≤ 29k) regardless of data volume. The msb
  *     exponent derives from `length(bin(v))` — the exact integer path
  *     both engines share ([[Sketches.quantileSketch]]'s discipline;
  *     `floor(log2 v)` in doubles mis-rounds near 2^k−1). Negative
  *     values mirror through `idx(v) = −idx(−v)`, keeping the index
  *     MONOTONE in v across the full signed domain.
  *
  *  2. DIGEST — fixed compression of the sorted grid into ≤ `delta`
  *     integer-centroid rows with the k0 (uniform) scale function:
  *     bucket b with cumulative-weight-before cw joins centroid
  *     ⌊cw·delta/W⌋. Deterministic GIVEN the histogram — which layer 1
  *     made order-free — so the digest inherits bit-identity under any
  *     partitioning or merge schedule. Centroid sums are exact
  *     DECIMAL(38,0) (value·weight products as DECIMAL(20,0)×(18,0),
  *     within both engines' exact-multiply precision caps); means
  *     become doubles only at the final readout, mirrored
  *     operation-for-operation in the oracle.
  *
  * Quantile readout is the t-digest midpoint rule: centroid i covers
  * cumulative midpoint C2_i = 2·cwBefore_i + w_i (half-units, exact
  * integers); the target 2·W·q is bracketed between adjacent C2s and
  * the means interpolate linearly. Centroid means are non-decreasing
  * (they partition a value-sorted stream), which lets the bracket
  * resolve with conditional min/max aggregates instead of a
  * per-quantile rescan — the [[TimeSeries.interpolatedQuantiles]]
  * probe discipline.
  *
  * Scale: layer 1 is ONE map-side-combined hash aggregate over the
  * facts (the only pass that sees data volume); everything after runs
  * on the ≤29k-row state / ≤delta-row digest — the windows there are
  * graceful BOUNDED sorts (bounded by the grid, not the data), the
  * repo's sanctioned class. The MV path appends per-batch partial
  * histograms and re-sums on read: refresh cost is sketch-sized, not
  * data-sized — the gap this family closes over the exact
  * per-distinct-value quantile MVs.
  */
object TDigest {

  import graft.functions.TextFunctions.bindOnce

  private def shr(a: Column, n: Column): Column =
    call_function("shiftright", a, n.cast("int"))
  private def shl(a: Column, n: Column): Column =
    call_function("shiftleft", a, n.cast("int"))

  /** Exact ⌊n/den⌋ for non-negative longs whose product context can
    * pass 2^52 (where [[TimeSeries]]'s double-division floorDiv loses
    * ulps): route the exactly-divisible numerator through DECIMAL.
    * Shared package-wide ([[Packing]], [[Corpus.epochPlan]]) so every
    * corpus-scale prefix-sum division has the same 2^53-proof route. */
  private[ops] def exactDiv(n: Column, den: Column): Column =
    ((n - pmod(n, den)).cast("decimal(38,0)") /
      den.cast("decimal(38,0)")).cast("long")

  /** cwb·delta with DECIMAL headroom: cwb ranges up to the full total
    * weight W (a BIGINT) and delta ≤ 4096, so the 64-bit product wraps
    * silently in Spark above W ≈ 2^51 while DuckDB raises — the engine
    * and the oracle would diverge instead of failing loudly. Both now
    * route the product through DECIMAL (engine) / HUGEINT (oracle):
    * overflow-proof for ANY W that itself fits BIGINT, which is the
    * only remaining total-weight contract (sum(w) is stored as long). */
  private def centProd(cwb: Column, delta: Int): Column =
    cwb.cast("decimal(20,0)") * lit(delta).cast("decimal(4,0)")

  /** 2·tw·q_num and c2·q_den with the same DECIMAL headroom as
    * [[centProd]] — the bracket compare and interpolation numerators
    * stay exact integers for any BIGINT total weight. The c2 column
    * itself is BUILT in DECIMAL too ([[c2Col]]), so no stage of the
    * bracket arithmetic ever runs a 64-bit product or sum that W >
    * 2^62 could wrap. */
  private def q2Prod(a: Column, b: Column): Column =
    a.cast("decimal(21,0)") * b.cast("decimal(9,0)")

  /** Cumulative midpoint key c2 = 2·(Σ w before) + w, routed through
    * DECIMAL: cumw approaches the total weight W, and 2·cumw computed
    * as a 64-bit long wraps SILENTLY for W > 2^62 in Spark while the
    * DuckDB oracle's HUGEINT side keeps going — the engines would
    * diverge without an error. c2 ≤ 2W < 2^64 always fits
    * DECIMAL(21,0), so the DECIMAL route is exact for ANY W that
    * itself fits BIGINT — the same total-weight contract as
    * [[centProd]] (sum(w) is stored as long). */
  private def c2Col(cumw: Column, w: Column): Column =
    (cumw.cast("decimal(20,0)") * lit(2) + w.cast("decimal(20,0)"))
      .cast("decimal(21,0)")

  /** Signed log-linear grid index, MONOTONE in v: 0 maps to 0,
    * positive v to [[Sketches.quantileSketch]]'s grid, negative v to
    * its mirror image. Contract: |v| < 2^62 (µ-unit metrics). */
  def gridIdx(v: Column, m: Int): Column = {
    require(m >= 1 && m <= 16, "m must be in [1, 16]")
    val base = 1L << m
    def mag(a: Column): Column = {
      val s = length(bin(a)) - 1 - m // msb index − m; > 0 iff a ≥ 2^(m+1)
      when(a < base, a).otherwise(s.cast("long") * base + shr(a, s))
    }
    bindOnce(v) { vv => when(vv >= 0, mag(vv)).otherwise(-mag(-vv)) }
  }

  /** Inverse of [[gridIdx]]: the bucket's representative value —
    * magnitude truncated toward zero to m+1 significant bits, so the
    * decode is monotone and |decode(idx) − v| / |v| ≤ 2^−m. */
  def gridValue(idx: Column, m: Int): Column = {
    val base = 1L << m
    def dec(a: Column): Column = when(a < base, a).otherwise(
      shl(lit(base) + pmod(a, lit(base)), exactDiv(a, lit(base)) - 1))
    bindOnce(idx) { i => when(i >= 0, dec(i)).otherwise(-dec(-i)) }
  }

  /** Layer-1 state: the additive (idx, w) grid histogram. One hash
    * aggregate over the facts; every later stage is sketch-sized.
    * Integer weights > 0 (pass `lit(1L)` for plain counts). The output
    * IS the MV part shape — append per-batch results to a SummingStore
    * keyed on idx and re-sum on read. */
  def sketch(df: DataFrame, v: Column, w: Column = lit(1L),
      m: Int = 8): DataFrame =
    df.select(gridIdx(v.cast("long"), m).as("idx"), w.cast("long").as("w0"))
      .groupBy(col("idx")).agg(sum(col("w0")).as("w"))

  /** Layer-2 fixed compression: ≤ `delta` centroids
    * (cent_id, w, vsum DECIMAL(38,0), c2) from a [[sketch]] state.
    * k0 scale: bucket with cumulative-before cw → centroid
    * ⌊cw·delta/W⌋. The two windows run over the grid (≤29k rows) and
    * the centroid list (≤delta rows) — bounded by construction. */
  def digest(state: DataFrame, delta: Int = 64, m: Int = 8): DataFrame = {
    require(delta >= 2 && delta <= 4096, "delta must be in [2, 4096]")
    val cumW = Window.orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = state.agg(sum(col("w")).as("tw"))
    val assigned = state
      .withColumn("cwb", coalesce(sum(col("w")).over(cumW), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("cent_id", exactDiv(centProd(col("cwb"), delta), col("tw")))
    val cents = assigned.groupBy(col("cent_id"))
      .agg(sum(col("w")).as("w"),
        sum(gridValue(col("idx"), m).cast("decimal(20,0)") *
          col("w").cast("decimal(18,0)")).as("vsum"))
    val cumC = Window.orderBy(col("cent_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cents
      .withColumn("c2",
        c2Col(coalesce(sum(col("w")).over(cumC), lit(0L)), col("w")))
      .select(col("cent_id"), col("w"), col("vsum"), col("c2"))
  }

  /** Midpoint-interpolated quantiles from a [[digest]]: for each
    * rational q = n/d, bracket target 2·W·n between adjacent centroid
    * midpoints C2 (exact integer compares via ·d), then interpolate
    * the centroid means — the only doubles in the pipeline, mirrored
    * op-for-op in the oracle. Output (q_num, q_den, est BIGINT in the
    * input's µ units, half-up rounded). */
  def quantiles(dig: DataFrame, qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => d > 0 && n >= 0 && n <= d },
      "quantiles must be rationals in [0,1]")
    val spark = dig.sparkSession
    import spark.implicits._
    val tot = dig.agg(sum(col("w")).as("tw"))
    val qdf = qs.toDF("q_num", "q_den")
    val mean = col("vsum").cast("double") / col("w").cast("double")
    val t2n = lit(2L) * q2Prod(col("tw"), col("q_num")) // target ·q_den
    val isLo = q2Prod(col("c2"), col("q_den")) <= t2n
    val br = dig.crossJoin(broadcast(tot)).crossJoin(broadcast(qdf))
      .groupBy(col("q_num"), col("q_den"))
      .agg(max(when(isLo, col("c2"))).as("c2_lo"),
        max(when(isLo, mean)).as("m_lo"), // means non-decreasing in c2
        min(when(!isLo, col("c2"))).as("c2_hi"),
        min(when(!isLo, mean)).as("m_hi"),
        first(col("tw")).as("tw"))
    val frac = (lit(2L) * q2Prod(col("tw"), col("q_num")) -
        q2Prod(col("c2_lo"), col("q_den"))).cast("double") /
      q2Prod(col("c2_hi") - col("c2_lo"), col("q_den")).cast("double")
    br.select(col("q_num"), col("q_den"),
      floor(
        when(col("c2_lo").isNull, col("m_hi"))
          .when(col("c2_hi").isNull, col("m_lo"))
          .otherwise(col("m_lo") + (col("m_hi") - col("m_lo")) * frac)
        + lit(0.5)).cast("long").as("est"))
  }

  /** [[sketch]] → [[digest]] → [[quantiles]] in one call. */
  def quantileTDigest(df: DataFrame, v: Column, qs: Seq[(Int, Int)],
      w: Column = lit(1L), delta: Int = 64, m: Int = 8): DataFrame =
    quantiles(digest(sketch(df, v, w, m), delta, m), qs)

  // ------------------------------------------------- grouped (BY key)

  /** GROUPED [[sketch]]: one additive (k, idx, w) histogram per key —
    * the per-segment dashboard form (`quantileTDigest(v) ... GROUP BY
    * segment`). Still one map-side-combined hash aggregate; state per
    * key is grid-bounded, keys may be corpus-sized. The output is the
    * per-group MV part shape (SummingStore keys = (k, idx)). */
  def sketchBy(df: DataFrame, key: Column, v: Column,
      w: Column = lit(1L), m: Int = 8): DataFrame =
    df.select(key.as("k"), gridIdx(v.cast("long"), m).as("idx"),
        w.cast("long").as("w0"))
      .groupBy(col("k"), col("idx")).agg(sum(col("w0")).as("w"))

  /** GROUPED [[digest]]: the same fixed k0 compression per key. The
    * windows partition by key (each group ≤ grid-size rows); per-key
    * totals join back CORPUS-SIDE — |keys| is corpus-derived, so the
    * totals table must never broadcast ([[Joins.corpusSide]]). */
  def digestBy(state: DataFrame, delta: Int = 64, m: Int = 8): DataFrame = {
    require(delta >= 2 && delta <= 4096, "delta must be in [2, 4096]")
    val cumW = Window.partitionBy(col("k")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = state.groupBy(col("k")).agg(sum(col("w")).as("tw"))
    val assigned = state
      .withColumn("cwb", coalesce(sum(col("w")).over(cumW), lit(0L)))
      .join(Joins.corpusSide(tot), Seq("k"))
      .withColumn("cent_id", exactDiv(centProd(col("cwb"), delta), col("tw")))
    val cents = assigned.groupBy(col("k"), col("cent_id"))
      .agg(sum(col("w")).as("w"),
        sum(gridValue(col("idx"), m).cast("decimal(20,0)") *
          col("w").cast("decimal(18,0)")).as("vsum"))
    val cumC = Window.partitionBy(col("k")).orderBy(col("cent_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cents
      .withColumn("c2",
        c2Col(coalesce(sum(col("w")).over(cumC), lit(0L)), col("w")))
      .select(col("k"), col("cent_id"), col("w"), col("vsum"), col("c2"))
  }

  /** GROUPED [[quantiles]]: the same bracket probe per (key, q). */
  def quantilesBy(dig: DataFrame, qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => d > 0 && n >= 0 && n <= d },
      "quantiles must be rationals in [0,1]")
    val spark = dig.sparkSession
    import spark.implicits._
    val tot = dig.groupBy(col("k")).agg(sum(col("w")).as("tw"))
    val qdf = qs.toDF("q_num", "q_den")
    val mean = col("vsum").cast("double") / col("w").cast("double")
    val t2n = lit(2L) * q2Prod(col("tw"), col("q_num"))
    val isLo = q2Prod(col("c2"), col("q_den")) <= t2n
    val br = dig.join(Joins.corpusSide(tot), Seq("k"))
      .crossJoin(broadcast(qdf))
      .groupBy(col("k"), col("q_num"), col("q_den"))
      .agg(max(when(isLo, col("c2"))).as("c2_lo"),
        max(when(isLo, mean)).as("m_lo"),
        min(when(!isLo, col("c2"))).as("c2_hi"),
        min(when(!isLo, mean)).as("m_hi"),
        first(col("tw")).as("tw"))
    val frac = (lit(2L) * q2Prod(col("tw"), col("q_num")) -
        q2Prod(col("c2_lo"), col("q_den"))).cast("double") /
      q2Prod(col("c2_hi") - col("c2_lo"), col("q_den")).cast("double")
    br.select(col("k"), col("q_num"), col("q_den"),
      floor(
        when(col("c2_lo").isNull, col("m_hi"))
          .when(col("c2_hi").isNull, col("m_lo"))
          .otherwise(col("m_lo") + (col("m_hi") - col("m_lo")) * frac)
        + lit(0.5)).cast("long").as("est"))
  }

  /** SINGLE source of truth for the oracle SQL — grid, compression,
    * bracket, interpolation — parameterized by an optional group key
    * (PARTITION BY / GROUP BY k threads through every stage) and a
    * CTE-name prefix `p` GENERATED into the names (never a post-hoc
    * rewrite, which would also mangle caller-supplied SQL fragments
    * that happen to contain a CTE name). One copy is load-bearing:
    * these strings must stay op-identical to the engine for the hash
    * gates to mean anything — a fix applied to one of two copies
    * would leave the other registered query gating a stale spec. */
  private def oracleChain(valueSql: String, weightSql: String, src: String,
      qs: Seq[(Int, Int)], delta: Int, m: Int, p: String,
      keySql: Option[String]): String = {
    val base = 1L << m
    def magSql(a: String) =
      s"CASE WHEN $a < $base THEN $a ELSE CAST(length(bin($a)) - 1 - $m AS BIGINT) * $base + ($a >> CAST(length(bin($a)) - 1 - $m AS BIGINT)) END"
    def decSql(a: String) =
      s"CASE WHEN $a < $base THEN $a ELSE ($base + $a % $base) << CAST($a // $base - 1 AS BIGINT) END"
    val qrows = qs.map { case (n, d) => s"($n, $d)" }.mkString(", ")
    val keyed = keySql.isDefined
    val kSel = keySql.fold("")(k => s"$k AS k, ")
    val kCol = if (keyed) "k, " else ""
    val part = if (keyed) "PARTITION BY k " else ""
    val twOver = if (keyed) "sum(w) OVER (PARTITION BY k)" else "sum(w) OVER ()"
    val grpIdx = if (keyed) "GROUP BY 1, 2" else "GROUP BY 1"
    val totSql = if (keyed) s"SELECT k, sum(w) AS tw FROM ${p}dig GROUP BY 1"
                 else s"SELECT sum(w) AS tw FROM ${p}dig"
    val brKey = if (keyed) s"${p}dig.k, " else ""
    val brFrom = if (keyed) s"FROM ${p}dig JOIN ${p}qtot ON ${p}dig.k = ${p}qtot.k, ${p}qq"
                 else s"FROM ${p}dig, ${p}qtot, ${p}qq"
    val brGrp = if (keyed) "GROUP BY 1, 2, 3" else "GROUP BY 1, 2"
    s"""${p}vals AS (SELECT ${kSel}CAST($valueSql AS BIGINT) AS v, CAST($weightSql AS BIGINT) AS w0 FROM $src),
${p}sk AS (SELECT ${kCol}CASE WHEN v >= 0 THEN ${magSql("v")} ELSE -(${magSql("(-v)")}) END AS idx, sum(w0) AS w FROM ${p}vals $grpIdx),
${p}asg AS (SELECT ${kCol}idx, w, coalesce(sum(w) OVER (${part}ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cwb, $twOver AS tw FROM ${p}sk),
${p}cents AS (SELECT ${kCol}(CAST(cwb AS HUGEINT) * $delta) // tw AS cent_id, sum(w) AS w,
  sum(CAST(CASE WHEN idx >= 0 THEN ${decSql("idx")} ELSE -(${decSql("(-idx)")}) END AS DECIMAL(20,0)) * CAST(w AS DECIMAL(18,0))) AS vsum
 FROM ${p}asg $grpIdx),
${p}dig AS (SELECT ${kCol}cent_id, w, vsum, 2 * CAST(coalesce(sum(w) OVER (${part}ORDER BY cent_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) + w AS c2 FROM ${p}cents),
${p}qtot AS ($totSql),
${p}qq(q_num, q_den) AS (VALUES $qrows),
${p}br AS (SELECT ${brKey}q_num, q_den,
  max(CASE WHEN CAST(c2 AS HUGEINT) * q_den <= 2 * CAST(tw AS HUGEINT) * q_num THEN c2 END) AS c2_lo,
  max(CASE WHEN CAST(c2 AS HUGEINT) * q_den <= 2 * CAST(tw AS HUGEINT) * q_num THEN CAST(vsum AS DOUBLE) / CAST(w AS DOUBLE) END) AS m_lo,
  min(CASE WHEN CAST(c2 AS HUGEINT) * q_den > 2 * CAST(tw AS HUGEINT) * q_num THEN c2 END) AS c2_hi,
  min(CASE WHEN CAST(c2 AS HUGEINT) * q_den > 2 * CAST(tw AS HUGEINT) * q_num THEN CAST(vsum AS DOUBLE) / CAST(w AS DOUBLE) END) AS m_hi,
  min(tw) AS tw
 $brFrom $brGrp)
SELECT ${kCol}q_num, q_den, CAST(floor(
  CASE WHEN c2_lo IS NULL THEN m_hi WHEN c2_hi IS NULL THEN m_lo
    ELSE m_lo + (m_hi - m_lo) * (CAST(2 * CAST(tw AS HUGEINT) * q_num - CAST(c2_lo AS HUGEINT) * q_den AS DOUBLE) / CAST(CAST(c2_hi - c2_lo AS HUGEINT) * q_den AS DOUBLE)) END
  + 0.5) AS BIGINT) AS est
FROM ${p}br"""
  }

  /** DuckDB replica of the grouped pipeline over `keySql`/`valueSql`/
    * `weightSql` from `src` — [[oracleSql]] with PARTITION BY k. */
  def oracleByKeySql(keySql: String, valueSql: String, weightSql: String,
      src: String, qs: Seq[(Int, Int)], delta: Int = 64,
      m: Int = 8): String =
    s"WITH ${oracleChain(valueSql, weightSql, src, qs, delta, m, p = "", keySql = Some(keySql))}"

  /** Oracle BODY (no leading WITH): "ctes…, final SELECT" — the form
    * composable as the tail of a larger CTE chain (the streaming
    * monitor oracle appends it after the batch-replay CTEs). `p`
    * prefixes every CTE name against collisions with the host chain. */
  def oracleBodySql(valueSql: String, weightSql: String, src: String,
      qs: Seq[(Int, Int)], delta: Int = 64, m: Int = 8,
      p: String = ""): String =
    oracleChain(valueSql, weightSql, src, qs, delta, m, p, keySql = None)

  /** Full DuckDB replica: the whole chain + the [[quantiles]] probe,
    * identical bracket logic and final doubles. */
  def oracleSql(valueSql: String, weightSql: String, src: String,
      qs: Seq[(Int, Int)], delta: Int = 64, m: Int = 8): String =
    s"WITH ${oracleChain(valueSql, weightSql, src, qs, delta, m, p = "", keySql = None)}"
}
