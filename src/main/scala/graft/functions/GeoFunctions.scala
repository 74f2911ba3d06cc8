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
}
