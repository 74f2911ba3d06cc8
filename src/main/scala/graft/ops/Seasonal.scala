package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seasonality analysis — the ClickHouse `seriesPeriodDetectFFT` /
  * `seriesDecomposeSTL` surface, re-derived deterministically: period
  * detection is exact-integer autocorrelation over the regular bucket
  * grid (argmax of the tie-broken quantized ACF — an FFT finds the
  * same dominant cycle for series whose length is a few thousand
  * buckets, without float butterflies that no two engines order
  * identically), and decomposition is the classical
  * moving-average/seasonal-means form with every intermediate kept as
  * an exact integer numerator over a constant denominator.
  *
  * Scale posture: the series table is |keys| × span-buckets (built by
  * the [[TimeSeries.gapFillDaily]] per-key grid trick — never event
  * volume); the lag fan-out is series × maxLag with maxLag a bounded
  * parameter; every aggregate is a (key, lag)- or (key, phase)-keyed
  * hash agg; no global window anywhere.
  */
object Seasonal {

  private val dec = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(dec)
  private def dbl(c: Column): Column = c.cast("double")
  private def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  private def floorDiv(n: Column, den: Column): Column =
    ((n - pmod(n, den)) / den).cast("long")

  /** Per-(key, bucket) µ-sum observations (k, b, v) — the aggregate a
    * SummingStore MV maintains incrementally; [[zeroFill]] +
    * the `FromSeries` cores below serve batch and MV paths through
    * the SAME operators (the Dashboard parity discipline). */
  def obs(df: DataFrame, key: Column, ts: Column, valueMicros: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    df.select(key.as("k"),
        floorDiv(unix_micros(ts), lit(bucketUs)).as("b"),
        valueMicros.as("v"))
      .groupBy(col("k"), col("b")).agg(sum(col("v")).as("v"))
  }

  /** Dense zero-filled per-key series from (k, b, v) observations:
    * missing buckets genuinely mean "sum of nothing" for an additive
    * metric, so the grid join closes the gaps with 0. Grid rows are
    * generated per key from its own [min, max] span — keys ×
    * span-buckets, independent of event volume. */
  def zeroFill(obs: DataFrame): DataFrame = {
    val grid = obs.groupBy(col("k"))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("b"))
    grid.join(obs, Seq("k", "b"), "left")
      .select(col("k"), col("b"),
        coalesce(col("v").cast("long"), lit(0L)).as("v"))
  }

  /** [[obs]] ∘ [[zeroFill]]. */
  def bucketSeries(df: DataFrame, key: Column, ts: Column,
      valueMicros: Column, bucketUs: Long): DataFrame =
    zeroFill(obs(df, key, ts, valueMicros, bucketUs))

  /** Dominant period per key: argmax over lags 1..maxLag of the
    * mean-centered autocorrelation, computed from exact decimal sums
    * (acf = (m·Σxy − Σx·Σy) / √((m·Σxx − Σx²)(m·Σyy − Σy²)) — the
    * only doubles are the final ratio, quantized r6, with a
    * smallest-lag tiebreak). Lags with degenerate windows (m < 2 or a
    * constant side) are skipped; a key with no valid lag is omitted.
    *
    * Output: (k, period BIGINT, acf r6). */
  def periodDetect(df: DataFrame, key: Column, ts: Column,
      valueMicros: Column, bucketUs: Long, maxLag: Int): DataFrame =
    periodDetectFromSeries(
      bucketSeries(df, key, ts, valueMicros, bucketUs), maxLag)

  /** [[periodDetect]] core over a prepared dense (k, b, v) series —
    * the serving entry for an incrementally-maintained bucket-sum MV
    * ([[graft.streaming.Dashboard.servedPeriod]]). */
  def periodDetectFromSeries(s: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    // .toList, not .toSeq — a Range IS a Seq and typedLit rejects it
    val left = s.withColumn("lag", explode(typedLit((1 to maxLag).toList)))
      .select(col("k"), col("lag"), col("v").as("vx"),
        (col("b") + col("lag")).as("b2"))
    val right = s.select(col("k"), col("b").as("b2"), col("v").as("vy"))
    val agg = left.join(Joins.corpusSide(right), Seq("k", "b2"))
      .groupBy(col("k"), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(d(col("vx"))).as("sx"), sum(d(col("vy"))).as("sy"),
        sum(d(col("vx")) * d(col("vx"))).as("sxx"),
        sum(d(col("vy")) * d(col("vy"))).as("syy"),
        sum(d(col("vx")) * d(col("vy"))).as("sxy"))
    val num = d(col("m")) * col("sxy") - col("sx") * col("sy")
    val vx = d(col("m")) * col("sxx") - col("sx") * col("sx")
    val vy = d(col("m")) * col("syy") - col("sy") * col("sy")
    val scored = agg.select(col("k"), col("lag"),
        when(col("m") >= 2 && dbl(vx) > lit(0.0) && dbl(vy) > lit(0.0),
          r6(dbl(num) / sqrt(dbl(vx) * dbl(vy)))).as("acf"))
      .filter(col("acf").isNotNull)
    scored.groupBy(col("k"))
      .agg(max(struct(col("acf"),
        (lit(0) - col("lag")).as("neglag"))).as("mx"))
      .select(col("k"), (lit(0L) - col("mx.neglag")).cast("long").as("period"),
        col("mx.acf").as("acf"))
  }

  /** DuckDB replica of [[periodDetect]] over
    * (event_type, hourly buckets, µ-value sums). */
  def periodDetectOracleSql(bucketUs: Long, maxLag: Int): String =
    s"""WITH obs AS (SELECT event_type AS k, CAST((epoch_us(ts) - ((epoch_us(ts) % $bucketUs) + $bucketUs) % $bucketUs) / $bucketUs AS BIGINT) AS b, sum(CAST(round(value*1000000,0) AS BIGINT)) AS v FROM events GROUP BY 1, 2),
grid AS (SELECT k, unnest(range(b0, b1 + 1)) AS b FROM (SELECT k, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1)),
s AS (SELECT g.k, g.b, coalesce(CAST(o.v AS BIGINT), 0) AS v FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b),
lg AS (SELECT unnest(range(1, $maxLag + 1)) AS lag),
a AS (SELECT s.k, lg.lag, count(*) AS m,
 sum(CAST(s.v AS DECIMAL(38,0))) AS sx, sum(CAST(s2.v AS DECIMAL(38,0))) AS sy,
 sum(CAST(s.v AS DECIMAL(38,0)) * CAST(s.v AS DECIMAL(38,0))) AS sxx,
 sum(CAST(s2.v AS DECIMAL(38,0)) * CAST(s2.v AS DECIMAL(38,0))) AS syy,
 sum(CAST(s.v AS DECIMAL(38,0)) * CAST(s2.v AS DECIMAL(38,0))) AS sxy
 FROM s CROSS JOIN lg JOIN s s2 ON s2.k = s.k AND s2.b = s.b + lg.lag
 GROUP BY 1, 2),
sc AS (SELECT k, lag,
 CASE WHEN m >= 2
  AND CAST(CAST(m AS DECIMAL(38,0))*sxx - sx*sx AS DOUBLE) > 0.0
  AND CAST(CAST(m AS DECIMAL(38,0))*syy - sy*sy AS DOUBLE) > 0.0
 THEN floor(CAST(CAST(m AS DECIMAL(38,0))*sxy - sx*sy AS DOUBLE)
  / sqrt(CAST(CAST(m AS DECIMAL(38,0))*sxx - sx*sx AS DOUBLE)
   * CAST(CAST(m AS DECIMAL(38,0))*syy - sy*sy AS DOUBLE)) * 1e6 + 0.5) / 1e6
 END AS acf FROM a)
SELECT k, CAST(lag AS BIGINT) AS period, acf
FROM sc WHERE acf IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY k ORDER BY acf DESC, lag ASC) = 1"""

  /** Classical seasonal decomposition (`seriesDecomposeSTL` analog,
    * the moving-average flavor) for a KNOWN period p, exact to the
    * last integer: per (key, bucket) the centered p-window trend, the
    * per-phase seasonal mean of the detrended series, and the
    * residual. Every value is kept as an integer NUMERATOR over a
    * constant denominator — trend = W/p (W = the p-window sum),
    * detrended×p = p·v − W, seasonal = Σ_phase(p·v − W)/(p·m_phase) —
    * so engines can only disagree at the final r6-quantized doubles,
    * which mirror the oracle operation-for-operation.
    *
    * Rows whose centered window falls off either end of the series
    * have null trend/seasonal/residual (the classical edge contract).
    * For even p the window is the standard 2×p moving average
    * (half-weight endpoints): W = Σ_{j=-p/2..p/2} w_j·v_{b+j} with
    * w = ½,1,…,1,½ doubled to stay integral (denominator 2p).
    *
    * Output: (k, b, v, trend r6, seasonal r6, resid r6). */
  def stlDecompose(df: DataFrame, key: Column, ts: Column,
      valueMicros: Column, bucketUs: Long, period: Int): DataFrame =
    stlDecomposeFromSeries(
      bucketSeries(df, key, ts, valueMicros, bucketUs), period)

  /** [[stlDecompose]] core over a prepared dense (k, b, v) series —
    * the serving entry for an incrementally-maintained bucket-sum MV
    * ([[graft.streaming.Dashboard.servedStl]]). */
  def stlDecomposeFromSeries(s: DataFrame, period: Int): DataFrame = {
    require(period >= 2, "period must be >= 2")
    val p = period
    // window offsets and integer weights (×1 odd p, ×2 even p)
    val (offs, den) =
      if (p % 2 == 1) ((-(p / 2) to p / 2).map(_ -> 1L), p.toLong)
      else ((-(p / 2) to p / 2).map(j =>
        j -> (if (j == -(p / 2) || j == p / 2) 1L else 2L)), 2L * p)
    // trend numerator W via an offset explode + (k, b) re-aggregate —
    // relational, no window frame, skew-immune
    val contrib = s.withColumn("o", explode(typedLit(offs)))
      .select(col("k"), (col("b") + col("o._1")).as("b"),
        (col("v") * col("o._2")).as("wv"), lit(1L).as("cnt"))
    val w = contrib.groupBy(col("k"), col("b"))
      .agg(sum(col("wv")).as("w"), sum(col("cnt")).as("nterms"))
    // only rows with the FULL window are valid (edge contract)
    val withTrend = s.join(w, Seq("k", "b"), "left")
      .select(col("k"), col("b"), col("v"),
        when(col("nterms") === offs.size, col("w")).as("w"))
    // detrended numerator: den·v − W; seasonal mean per phase
    val seas = withTrend.filter(col("w").isNotNull)
      .groupBy(col("k"), pmod(col("b"), lit(p.toLong)).as("ph"))
      .agg(sum(d(lit(den) * col("v") - col("w"))).as("snum"),
        count(lit(1)).as("sm"))
    val joined = withTrend
      .withColumn("ph", pmod(col("b"), lit(p.toLong)))
      .join(seas, Seq("k", "ph"), "left")
    val trend = dbl(col("w")) / lit(den.toDouble)
    val seasonal = dbl(col("snum")) / (lit(den.toDouble) * dbl(col("sm")))
    val ok = col("w").isNotNull && col("snum").isNotNull
    joined.select(col("k"), col("b"), col("v"),
      when(col("w").isNotNull, r6(trend)).as("trend"),
      when(ok, r6(seasonal)).as("seasonal"),
      when(ok, r6(dbl(col("v")) - trend - seasonal)).as("resid"))
  }

  /** Seasonal-aware anomaly detection: buckets whose STL residual
    * sits more than `z` population standard deviations from the
    * per-key residual mean — the composition a metrics dashboard
    * actually wants (a raw z-score flags every daily peak; the
    * residual z-score flags only departures from the SEASONAL norm).
    *
    * Exactness: residuals are re-quantized to 1e-6 integers
    * (`round(resid·1e6)` — resid is already on the 1e-6 grid, so the
    * round only strips the division ulp, identically in both
    * engines), and the flag is the EXACT integer-decimal comparison
    * (n·r − Σr)² > z²·(n·Σr² − (Σr)²) — no sqrt, no float
    * accumulation anywhere. Magnitude bound: |µ-residual| × series
    * length must stay under ~1e19 for the squared decimals to fit
    * DECIMAL(38) (µ-unit bucket sums over day-scale grids sit orders
    * below that).
    *
    * Output: the anomalous rows (k, b, v, resid), z² fixed at
    * `zSq` (integer, default 9 = 3σ). */
  def stlAnomalies(df: DataFrame, key: Column, ts: Column,
      valueMicros: Column, bucketUs: Long, period: Int,
      zSq: Int = 9): DataFrame = {
    val r = stlDecompose(df, key, ts, valueMicros, bucketUs, period)
      .filter(col("resid").isNotNull)
      .withColumn("rq", round(col("resid") * lit(1e6)).cast("long"))
    val stats = r.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(d(col("rq"))).as("s1"),
      sum(d(col("rq")) * d(col("rq"))).as("s2"))
    val dev = d(col("n")) * d(col("rq")) - col("s1")
    val varNum = d(col("n")) * col("s2") - col("s1") * col("s1")
    r.join(broadcast(stats), Seq("k"))
      .filter(dev * dev > d(lit(zSq.toLong)) * varNum)
      .select(col("k"), col("b"), col("v"), col("resid"))
  }

  /** DuckDB replica of [[stlAnomalies]] (same parameters as
    * [[stlDecomposeOracleSql]], z² = 9). */
  def stlAnomaliesOracleSql(bucketUs: Long, period: Int): String =
    s"""WITH base AS (${stlDecomposeOracleSql(bucketUs, period)}),
r AS (SELECT k, b, v, resid, CAST(round(resid*1e6) AS BIGINT) AS rq FROM base WHERE resid IS NOT NULL),
st AS (SELECT k, count(*) AS n, sum(CAST(rq AS DECIMAL(38,0))) AS s1, sum(CAST(rq AS DECIMAL(38,0))*CAST(rq AS DECIMAL(38,0))) AS s2 FROM r GROUP BY 1)
SELECT r.k, r.b, r.v, r.resid FROM r JOIN st ON r.k = st.k
WHERE (CAST(st.n AS DECIMAL(38,0))*CAST(r.rq AS DECIMAL(38,0)) - st.s1)*(CAST(st.n AS DECIMAL(38,0))*CAST(r.rq AS DECIMAL(38,0)) - st.s1)
 > CAST(9 AS DECIMAL(38,0))*(CAST(st.n AS DECIMAL(38,0))*st.s2 - st.s1*st.s1)"""

  /** Seasonal-naive forecast backtest: predict each bucket with the
    * value one period earlier (f_b = v_{b−p} — THE baseline every
    * fancier forecaster must beat) and report per-key error metrics,
    * exactly: m evaluated buckets, Σ|v−f| as an exact decimal, MAE,
    * and sMAPE = mean(2|e|/(|v|+|f|)) with each term quantized to
    * 1e-12 before the sum (the [[Stats.cramersV]] discipline — float
    * summation order can never differ between engines); |v|+|f| = 0
    * terms contribute 0. The first p buckets of each key have no
    * forecast and are excluded by the inner self-join.
    *
    * Output: (k, m, sae STRING exact, mae r6, smape r6 — nulls when
    * m = 0 is impossible by construction since keys without ≥ p+1
    * buckets simply drop out). */
  def seasonalNaiveEval(df: DataFrame, key: Column, ts: Column,
      valueMicros: Column, bucketUs: Long, period: Int): DataFrame =
    seasonalNaiveEvalFromSeries(
      bucketSeries(df, key, ts, valueMicros, bucketUs), period)

  /** [[seasonalNaiveEval]] core over a prepared dense (k, b, v)
    * series — the serving entry for the bucket-sum MV
    * ([[graft.streaming.Dashboard.servedForecastEval]]). */
  def seasonalNaiveEvalFromSeries(s: DataFrame, period: Int): DataFrame = {
    require(period >= 1, "period must be >= 1")
    val fc = s.select(col("k"), (col("b") + lit(period.toLong)).as("b"),
      col("v").as("f"))
    val j = s.join(Joins.corpusSide(fc), Seq("k", "b"))
    val e = abs(col("v") - col("f"))
    val den = abs(col("v")) + abs(col("f"))
    val tq = when(den > 0, d(floor(lit(2.0) * e.cast("double") /
      den.cast("double") * lit(1e12) + lit(0.5)))).otherwise(d(lit(0L)))
    j.groupBy(col("k"))
      .agg(count(lit(1)).as("m"), sum(d(e)).as("sae"), sum(tq).as("stq"))
      .select(col("k"), col("m"),
        col("sae").cast("string").as("sae"),
        r6(dbl(col("sae")) / dbl(col("m"))).as("mae"),
        r6(dbl(col("stq")) / lit(1e12) / dbl(col("m"))).as("smape"))
  }

  /** DuckDB replica of [[seasonalNaiveEval]] over
    * (event_type, hourly buckets, µ-value sums). */
  def seasonalNaiveEvalOracleSql(bucketUs: Long, period: Int): String =
    s"""WITH obs AS (SELECT event_type AS k, CAST((epoch_us(ts) - ((epoch_us(ts) % $bucketUs) + $bucketUs) % $bucketUs) / $bucketUs AS BIGINT) AS b, sum(CAST(round(value*1000000,0) AS BIGINT)) AS v FROM events GROUP BY 1, 2),
grid AS (SELECT k, unnest(range(b0, b1 + 1)) AS b FROM (SELECT k, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1)),
s AS (SELECT g.k, g.b, coalesce(CAST(o.v AS BIGINT), 0) AS v FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b),
j AS (SELECT s.k, s.b, s.v, f.v AS f FROM s JOIN s f ON f.k = s.k AND f.b + $period = s.b),
t AS (SELECT k, abs(v - f) AS e, abs(v) + abs(f) AS den FROM j),
a AS (SELECT k, count(*) AS m, sum(CAST(e AS DECIMAL(38,0))) AS sae,
 sum(CASE WHEN den > 0 THEN CAST(floor(2.0*CAST(e AS DOUBLE)/CAST(den AS DOUBLE)*1e12 + 0.5) AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS stq
 FROM t GROUP BY 1)
SELECT k, CAST(m AS BIGINT) AS m, CAST(sae AS VARCHAR) AS sae,
 floor(CAST(sae AS DOUBLE)/CAST(m AS DOUBLE)*1e6+0.5)/1e6 AS mae,
 floor(CAST(stq AS DOUBLE)/1e12/CAST(m AS DOUBLE)*1e6+0.5)/1e6 AS smape
FROM a"""

  /** Dashboard drill-down composition: for every seasonally-anomalous
    * (key, bucket) from [[stlAnomalies]], the top-`topK` contributing
    * users by in-bucket µ-sum — the "what drove this spike" query.
    * The anomaly set is bounded by keys × span-buckets (series-sized,
    * never event-sized), so it broadcasts safely into the event scan;
    * the per-(key, bucket) rank window's groups are single buckets.
    * Ties break on ascending user id.
    *
    * Output: (k, b, u, user_value, resid, rnk). */
  def anomalyDrilldown(df: DataFrame, key: Column, ts: Column,
      user: Column, valueMicros: Column, bucketUs: Long, period: Int,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val anom = stlAnomalies(df, key, ts, valueMicros, bucketUs, period)
      .select(col("k"), col("b"), col("resid"))
    val contrib = df.select(key.as("k"),
        floorDiv(unix_micros(ts), lit(bucketUs)).as("b"),
        user.as("u"), valueMicros.as("v"))
      .join(broadcast(anom), Seq("k", "b"))
      .groupBy(col("k"), col("b"), col("u"))
      .agg(sum(col("v")).as("user_value"), min(col("resid")).as("resid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("b"))
      .orderBy(col("user_value").desc, col("u").asc)
    contrib.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("k"), col("b"), col("u"), col("user_value"),
        col("resid"), col("rnk"))
  }

  /** DuckDB replica of [[anomalyDrilldown]] (z² = 9). */
  def anomalyDrilldownOracleSql(bucketUs: Long, period: Int,
      topK: Int): String =
    s"""WITH anom AS (${stlAnomaliesOracleSql(bucketUs, period)}),
evb AS (SELECT event_type AS k, CAST((epoch_us(ts) - ((epoch_us(ts) % $bucketUs) + $bucketUs) % $bucketUs) / $bucketUs AS BIGINT) AS b, user_id AS u, CAST(round(value*1000000,0) AS BIGINT) AS v FROM events),
cj AS (SELECT e.k, e.b, e.u, sum(e.v) AS uv, min(a.resid) AS resid
 FROM evb e JOIN anom a ON e.k = a.k AND e.b = a.b GROUP BY 1, 2, 3)
SELECT k, b, u, CAST(uv AS BIGINT) AS user_value, resid, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY k, b ORDER BY uv DESC, u ASC) AS rnk FROM cj)
WHERE rnk <= $topK"""

  /** DuckDB replica of [[stlDecompose]] over
    * (event_type, hourly buckets, µ-value sums) for the given period. */
  def stlDecomposeOracleSql(bucketUs: Long, period: Int): String = {
    val p = period
    val half = p / 2
    val (loOff, nTerms, den) =
      if (p % 2 == 1) (-half, p, p.toLong) else (-half, p + 1, 2L * p)
    val weight =
      if (p % 2 == 1) "1"
      else s"CASE WHEN o.o = ${-half} OR o.o = $half THEN 1 ELSE 2 END"
    s"""WITH obs AS (SELECT event_type AS k, CAST((epoch_us(ts) - ((epoch_us(ts) % $bucketUs) + $bucketUs) % $bucketUs) / $bucketUs AS BIGINT) AS b, sum(CAST(round(value*1000000,0) AS BIGINT)) AS v FROM events GROUP BY 1, 2),
grid AS (SELECT k, unnest(range(b0, b1 + 1)) AS b FROM (SELECT k, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1)),
s AS (SELECT g.k, g.b, coalesce(CAST(o.v AS BIGINT), 0) AS v FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b),
off AS (SELECT unnest(range($loOff, ${half + 1})) AS o),
w AS (SELECT s.k, s.b + o.o AS b, sum(s.v * $weight) AS w, count(*) AS nterms FROM s CROSS JOIN off o GROUP BY 1, 2),
t AS (SELECT s.k, s.b, s.v, CASE WHEN w.nterms = $nTerms THEN w.w END AS w FROM s LEFT JOIN w ON s.k = w.k AND s.b = w.b),
seas AS (SELECT k, ((b % $p) + $p) % $p AS ph, sum(CAST($den*v - w AS DECIMAL(38,0))) AS snum, count(*) AS sm FROM t WHERE w IS NOT NULL GROUP BY 1, 2),
j AS (SELECT t.k, t.b, t.v, t.w, seas.snum, seas.sm FROM t LEFT JOIN seas ON t.k = seas.k AND ((t.b % $p) + $p) % $p = seas.ph)
SELECT k, b, v,
 CASE WHEN w IS NOT NULL THEN floor(CAST(w AS DOUBLE)/$den.0*1e6+0.5)/1e6 END AS trend,
 CASE WHEN w IS NOT NULL AND snum IS NOT NULL THEN floor(CAST(snum AS DOUBLE)/($den.0*CAST(sm AS DOUBLE))*1e6+0.5)/1e6 END AS seasonal,
 CASE WHEN w IS NOT NULL AND snum IS NOT NULL THEN floor((CAST(v AS DOUBLE) - CAST(w AS DOUBLE)/$den.0 - CAST(snum AS DOUBLE)/($den.0*CAST(sm AS DOUBLE)))*1e6+0.5)/1e6 END AS resid
FROM j"""
  }
}
