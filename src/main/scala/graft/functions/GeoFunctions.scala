package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse `geohashEncode` analog, exactly portable: ONE mirrored
  * float quantization per axis (add/divide/multiply/floor — identical
  * IEEE steps both engines run), then pure integer bit interleaving
  * and base32 drawing. The Spark expression and the DuckDB oracle SQL
  * are generated from the SAME bit loop, so there is a single source
  * of truth for the bit layout.
  *
  * Geohash prefixes are also the geo-bucketing scale pattern: equal
  * prefixes = nearby cells, so a groupBy(geohash4) is the spatial
  * analog of the engine's time-bucket rollups, and a prefix join is a
  * bounded candidate-pair generator for radius search.
  *
  * Scale: codegen'd scalar arithmetic in the map stage — ~30 integer
  * terms per row at precision 6, no shuffle, no UDF. */
object GeoFunctions {

  private val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash: total bits 5·precision, longitude first,
    * alternating; inputs clamped to the valid ranges. */
  def geohashEncode(lon: Column, lat: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12, "precision must be in [1, 12]")
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    def quant(c: Column, lo: Double, span: Double, bits: Int): Column =
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c - lit(lo)) / lit(span) * lit(math.pow(2, bits).toLong))
          .cast("long")))
    val ilon = quant(lon, -180.0, 360.0, lonBits)
    val ilat = quant(lat, -90.0, 180.0, latBits)
    // interleave, longitude at the most significant bit. Bit/digit
    // extraction is shiftright, NOT `/` — Spark's `/` on longs is
    // DOUBLE division, which loses low-order bits once the interleaved
    // value passes 2^53 (precision ≥ 11; total bits reach 60 at 12)
    val value = (0 until total).map { j =>
      val (src, srcBits, i) =
        if (j % 2 == 0) (ilon, lonBits, j / 2) else (ilat, latBits, j / 2)
      val bit = pmod(shiftright(src, srcBits - 1 - i), lit(2L))
      bit * lit(1L << (total - 1 - j))
    }.reduce(_ + _)
    // bind the interleaved value ONCE: inlining it into all `precision`
    // digit extractions multiplies the tree by total-bits — composed
    // with decode-of-encode it reaches millions of Catalyst nodes
    TextFunctions.bindOnce(value) { v =>
      (0 until precision).map { g =>
        val idx = pmod(shiftright(v, 5 * (precision - 1 - g)), lit(32L))
        substring(lit(alphabet), (idx + 1).cast("int"), lit(1))
      }.reduce(concat(_, _))
    }
  }

  /** The same bit loop rendered as DuckDB SQL over columns named
    * `lon` / `lat`. */
  def geohashEncodeSql(precision: Int): String = {
    require(precision >= 1 && precision <= 12)
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    def quant(c: String, lo: Double, span: Double, bits: Int): String =
      s"least(${(1L << bits) - 1}, greatest(0, CAST(floor(($c - ($lo)) / $span * ${1L << bits}) AS BIGINT)))"
    val ilon = quant("lon", -180.0, 360.0, lonBits)
    val ilat = quant("lat", -90.0, 180.0, latBits)
    val value = (0 until total).map { j =>
      val (src, srcBits, i) =
        if (j % 2 == 0) (ilon, lonBits, j / 2) else (ilat, latBits, j / 2)
      s"(($src // ${1L << (srcBits - 1 - i)}) % 2) * ${1L << (total - 1 - j)}"
    }.mkString(" + ")
    (0 until precision).map { g =>
      s"substring('$alphabet', CAST((($value) // ${1L << (5 * (precision - 1 - g))}) % 32 + 1 AS INT), 1)"
    }.mkString(" || ")
  }

  /** DuckDB replica of q_geohash: synthesized coordinates →
    * precision-6 geohash per event. */
  val geohashOracleSql: String =
    s"""WITH c AS (SELECT event_id,
 CAST(user_id % 3600 AS DOUBLE)/10 - 180 AS lon,
 CAST(event_id % 1700 AS DOUBLE)/10 - 85 AS lat FROM events)
SELECT event_id, ${geohashEncodeSql(6)} AS gh6 FROM c"""

  /** ClickHouse `geohashDecode` analog: cell CENTER of a geohash —
    * char lookup → integer deinterleave → one mirrored double op per
    * axis ((i + 0.5)·span/2^bits + lo). Same single-source bit loop as
    * [[geohashEncode]]. Contract: input must be a valid lowercase
    * geohash of exactly `precision` chars. Returns
    * struct(lon DOUBLE, lat DOUBLE). */
  def geohashDecode(gh: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12, "precision must be in [1, 12]")
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    // bind gh AND the deinterleave value once each: gh may itself be a
    // large expression (decode-of-encode), and the value would
    // otherwise inline into all total-bits axis terms — unbound, the
    // composed round-trip tree is O(precision² · total²) nodes
    TextFunctions.bindOnce(gh) { g =>
      val value = (0 until precision).map { gi =>
        (instr(lit(alphabet), substring(g, gi + 1, 1)).cast("long") -
          lit(1L)) * lit(1L << (5 * (precision - 1 - gi)))
      }.reduce(_ + _)
      TextFunctions.bindOnce(value) { v =>
        def axis(parity: Int, bits: Int): Column =
          (0 until total).filter(_ % 2 == parity).zipWithIndex.map {
            case (j, i) =>
              // shiftright, not `/`: exact above 2^53 (geohashEncode)
              pmod(shiftright(v, total - 1 - j), lit(2L)) *
                lit(1L << (bits - 1 - i))
          }.reduce(_ + _)
        def center(iv: Column, lo: Double, span: Double, bits: Int): Column =
          (iv.cast("double") + lit(0.5)) * lit(span) /
            lit(math.pow(2, bits)) + lit(lo)
        struct(
          center(axis(0, lonBits), -180.0, 360.0, lonBits).as("lon"),
          center(axis(1, latBits), -90.0, 180.0, latBits).as("lat"))
      }
    }
  }

  /** The same decode loop rendered as DuckDB SQL over a column named
    * `gh`. Returns two SQL expressions (lon, lat). */
  def geohashDecodeSql(precision: Int): (String, String) = {
    require(precision >= 1 && precision <= 12)
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    val value = (0 until precision).map { g =>
      s"(strpos('$alphabet', substring(gh, ${g + 1}, 1)) - 1) * ${1L << (5 * (precision - 1 - g))}"
    }.mkString(" + ")
    def axis(parity: Int, bits: Int): String =
      (0 until total).filter(_ % 2 == parity).zipWithIndex.map {
        case (j, i) =>
          s"((($value) // ${1L << (total - 1 - j)}) % 2) * ${1L << (bits - 1 - i)}"
      }.mkString(" + ")
    def center(iv: String, lo: Double, span: Double, bits: Int): String =
      s"(CAST($iv AS DOUBLE) + 0.5) * $span / ${math.pow(2, bits)} + ($lo)"
    (center(axis(0, lonBits), -180.0, 360.0, lonBits),
      center(axis(1, latBits), -90.0, 180.0, latBits))
  }

  /** DuckDB replica of q_geohash_roundtrip: encode precision 5, decode
    * to the cell center. */
  val geohashRoundtripOracleSql: String = {
    val (lonSql, latSql) = geohashDecodeSql(5)
    s"""WITH c AS (SELECT event_id,
 CAST(user_id % 3600 AS DOUBLE)/10 - 180 AS lon,
 CAST(event_id % 1700 AS DOUBLE)/10 - 85 AS lat FROM events),
g AS (SELECT event_id, ${geohashEncodeSql(5)} AS gh FROM c)
SELECT event_id, gh, $lonSql AS lon_c, $latSql AS lat_c FROM g"""
  }

  // ---- greatCircleDistance ------------------------------------------------
  //
  // ClickHouse `greatCircleDistance(lon1, lat1, lon2, lat2)` analog:
  // haversine meters on a 6 371 000 m sphere. The portability problem is
  // that sin/cos/asin are NOT bit-identical across libms (JVM vs DuckDB's
  // libm differ in the last ulp), so the trig is evaluated as explicit
  // Taylor polynomials over IEEE BASIC ops only (+, -, *, /, sqrt,
  // compare) — every one of which is correctly rounded and therefore
  // produces the same bits in both engines when the operation sequence is
  // identical. To guarantee an identical sequence there is ONE generator:
  // the formula is written once against a tiny expression algebra and
  // rendered to both a Spark Column tree and DuckDB SQL (the same
  // single-source-of-truth discipline as the geohash bit loop above).
  // ClickHouse itself evaluates this function through polynomial tables
  // with ~1e-4 relative error; these polynomials are good to ~1e-12 rad
  // (≈ 1e-5 m), verified in PropertySpec against java.lang.Math.
  //
  // Domains: lon ∈ [-180, 180], lat ∈ [-90, 90] (so every reduced trig
  // argument lands in the polynomials' converged range). Scale: pure
  // codegen'd per-row scalar arithmetic in the map stage — ~80 flops per
  // row, no shuffle, no UDF.

  /** Expression algebra the haversine formula is written against once;
    * `C` is instantiated as Spark Column and as DuckDB SQL text. `bind`
    * names a common subexpression (the SQL instance inlines — value
    * identity is what matters for IEEE portability, not sharing). */
  private trait Alg[C] {
    def num(d: Double): C
    def add(a: C, b: C): C; def sub(a: C, b: C): C
    def mul(a: C, b: C): C; def div(a: C, b: C): C
    def sqrtC(a: C): C
    def gt(a: C, b: C, ifTrue: C, ifFalse: C): C
    def bind(a: C)(f: C => C): C
  }

  private object ColAlg extends Alg[Column] {
    def num(d: Double): Column = lit(d)
    def add(a: Column, b: Column): Column = a + b
    def sub(a: Column, b: Column): Column = a - b
    def mul(a: Column, b: Column): Column = a * b
    def div(a: Column, b: Column): Column = a / b
    def sqrtC(a: Column): Column = sqrt(a)
    def gt(a: Column, b: Column, t: Column, f: Column): Column =
      when(a > b, t).otherwise(f)
    def bind(a: Column)(f: Column => Column): Column =
      TextFunctions.bindOnce(a)(f)
  }

  /** SQL instance. Inlining `bind` would square the rendered text at
    * every nesting level (~90k nodes for the full haversine — minutes
    * of DuckDB expression evaluation); instead each bind becomes a real
    * let: a computed column appended by one stacked subselect, so the
    * rendered SQL stays linear (22 binds, ~8 KB). */
  private final class SqlAlg extends Alg[String] {
    val binds = scala.collection.mutable.ListBuffer.empty[(String, String)]
    def num(d: Double): String = {
      val s = d.toString // shortest round-trip repr; DuckDB's parse is
      s"CAST($s AS DOUBLE)" // correctly rounded → the identical double
    }
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def div(a: String, b: String): String = s"($a / $b)"
    def sqrtC(a: String): String = s"sqrt($a)"
    def gt(a: String, b: String, t: String, f: String): String =
      s"(CASE WHEN $a > $b THEN $t ELSE $f END)"
    def bind(a: String)(f: String => String): String = {
      val n = s"_gb${binds.size}"
      binds += ((n, a))
      f(n)
    }
  }

  /** sin(x)/x Taylor coefficients in s = x², through x¹⁷ — error at the
    * reduced range's edge (π/2) is (π/2)¹⁹/19! ≈ 4e-14. */
  private val sinCoef: Seq[Double] = {
    var fact = 1.0
    (0 to 8).map { n =>
      if (n > 0) fact *= (2 * n) * (2 * n + 1)
      (if (n % 2 == 0) 1.0 else -1.0) / fact
    }
  }

  /** asin(x)/x Taylor coefficients in s = x², n = 0..30 — after the
    * x > 1/√2 reflection the series only runs on [0, 1/√2], where the
    * n = 30 tail is ≈ 1e-13. */
  private val asinCoef: Seq[Double] = {
    var binom = 1.0 // C(2n, n) / 4^n
    (0 to 30).map { n =>
      if (n > 0) binom *= (2.0 * n - 1.0) / (2.0 * n)
      binom / (2 * n + 1)
    }
  }

  private def greatCircleAlg[C](lon1: C, lat1: C, lon2: C, lat2: C)(
      implicit A: Alg[C]): C = {
    import A._
    val Pi = math.Pi
    val HalfPi = math.Pi / 2 // exact: one-bit exponent shift of Pi
    // Horner in s, innermost coefficient first: c0 + s·(c1 + s·(…))
    def horner(s: C, coef: Seq[Double]): C =
      coef.map(num).reduceRight((c, acc) => add(c, mul(s, acc)))
    // sin for |x| ≤ π: fold into [-π/2, π/2] (sin(π−x) = sin x), then poly
    def sinF(x: C): C = bind(x) { xx =>
      val r = gt(xx, num(HalfPi), sub(num(Pi), xx),
        gt(num(-HalfPi), xx, sub(num(-Pi), xx), xx))
      bind(r)(rr => bind(mul(rr, rr))(s => mul(rr, horner(s, sinCoef))))
    }
    // cos for |x| ≤ π/2 via the π/2 shift (argument stays within [0, π])
    def cosF(x: C): C = sinF(sub(num(HalfPi), x))
    // asin for x ∈ [0, 1]: reflect the ill-conditioned upper range
    // (asin x = π/2 − asin √(1−x²), and √(1−x²) ≤ 1/√2 there)
    def asinF(x: C): C = bind(x) { xx =>
      def core(y: C): C =
        bind(y)(yy => bind(mul(yy, yy))(s => mul(yy, horner(s, asinCoef))))
      gt(xx, num(0.7071067811865476),
        sub(num(HalfPi), core(sqrtC(sub(num(1.0), mul(xx, xx))))),
        core(xx))
    }
    val degRad = num(math.Pi / 180.0)
    def rad(x: C): C = mul(x, degRad)
    val dphiH = bind(mul(sub(rad(lat2), rad(lat1)), num(0.5)))(sinF)
    val dlamH = bind(mul(sub(rad(lon2), rad(lon1)), num(0.5)))(sinF)
    val a = add(
      bind(dphiH)(s => mul(s, s)),
      mul(mul(cosF(rad(lat1)), cosF(rad(lat2))),
        bind(dlamH)(s => mul(s, s))))
    // clamp rounding residue out of sqrt/asin's domain
    val aCl = bind(a)(aa =>
      gt(aa, num(1.0), num(1.0), gt(num(0.0), aa, num(0.0), aa)))
    mul(num(6371000.0), mul(num(2.0), asinF(sqrtC(aCl))))
  }

  /** Great-circle (haversine) distance in meters between two
    * (lon, lat) degree points; see the portability note above. */
  def greatCircleDistance(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column =
    greatCircleAlg(lon1, lat1, lon2, lat2)(ColAlg)

  /** The identical formula rendered as DuckDB SQL: a complete SELECT
    * over `srcSql` (a relation exposing the four coordinate columns and
    * everything `keepSql` projects), with the distance aliased
    * `alias` and the 22 let-bindings stacked as subselect columns. */
  def greatCircleDistanceSql(srcSql: String, keepSql: String, alias: String,
      lon1: String, lat1: String, lon2: String, lat2: String): String = {
    val alg = new SqlAlg
    val fin = greatCircleAlg(lon1, lat1, lon2, lat2)(alg)
    val stacked = alg.binds.foldLeft(s"SELECT * FROM $srcSql") {
      case (acc, (n, e)) => s"SELECT *, $e AS $n FROM ($acc)"
    }
    s"SELECT $keepSql, $fin AS $alias FROM ($stacked)"
  }

  /** DuckDB replica of q_geo_distance: event-synthesized point pairs →
    * haversine meters (raw doubles — the whole point is that the bits
    * match). */
  val geoDistanceOracleSql: String = greatCircleDistanceSql(
    srcSql = """(SELECT event_id,
 CAST(user_id % 3600 AS DOUBLE)/10 - 180 AS lon1,
 CAST(event_id % 1700 AS DOUBLE)/10 - 85 AS lat1,
 CAST((event_id * 37) % 3600 AS DOUBLE)/10 - 180 AS lon2,
 CAST((event_id * 91) % 1700 AS DOUBLE)/10 - 85 AS lat2 FROM events) c""",
    keepSql = "event_id", alias = "dist_m",
    lon1 = "lon1", lat1 = "lat1", lon2 = "lon2", lat2 = "lat2")
}
