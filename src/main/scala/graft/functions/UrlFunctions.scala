package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse URL-function family (`protocol`, `domain`,
  * `topLevelDomain`, `path`, `queryString`, `extractURLParameter`,
  * `cutQueryString`) as pure Column expressions — the referrer/landing-
  * page slicing every web-analytics dashboard over the engagement
  * stream does. All regexps are RE2-safe (no lookaround, no
  * backreferences) so Spark's Java regex and DuckDB's RE2 match
  * identically, and both engines return '' on no-match — asserted by
  * the q_url_funcs oracle.
  *
  * Scale: codegen'd scalar expressions in the map stage — no shuffle,
  * no UDF. */
object UrlFunctions {

  /** Scheme before `://` ('' if absent). */
  def protocol(c: Column): Column =
    regexp_extract(c, "^([a-z]+)://", 1)

  /** Host between `://` and the first `/ ? # :`. */
  def domain(c: Column): Column =
    regexp_extract(c, "^[a-z]+://([^/?#:]+)", 1)

  /** Last dot-label of the host ('' for dotless hosts). */
  def topLevelDomain(c: Column): Column =
    regexp_extract(domain(c), "\\.([a-z]+)$", 1)

  /** Path component from the first `/` after the host to `?`/`#`. */
  def path(c: Column): Column =
    regexp_extract(c, "^[a-z]+://[^/?#]+(/[^?#]*)", 1)

  /** Query string after `?` (fragment excluded). */
  def queryString(c: Column): Column =
    regexp_extract(c, "\\?([^#]*)", 1)

  /** Value of a named query parameter. `name` must be a literal of
    * word characters (interpolated into the pattern). */
  def extractURLParameter(c: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe parameter name: $name")
    regexp_extract(c, s"[?&]$name=([^&#]*)", 1)
  }

  /** URL with the query string removed. */
  def cutQueryString(c: Column): Column =
    regexp_replace(c, "\\?[^#]*", "")

  /** The synthetic URL both the registered query and its oracle build
    * from an events row — deterministic, covers every component. */
  def syntheticUrl(userId: Column, eventType: Column,
      eventId: Column): Column =
    concat(lit("https://site"), pmod(userId, lit(20)),
      lit(".example.com/c/"), eventType,
      lit("?q="), pmod(eventId, lit(10)),
      lit("&ref=r"), pmod(userId, lit(3)))

  // --------------------------------------------------- IPv4 functions

  /** ClickHouse `IPv4NumToString(n)`: dotted-quad from a UInt32 value
    * (0 ≤ n < 2³²) — pure integer shifts, codegen'd. */
  def ipv4NumToString(n: Column): Column =
    concat_ws(".",
      (n / lit(16777216L)).cast("long").cast("string"),
      pmod((n / lit(65536L)).cast("long"), lit(256L)).cast("string"),
      pmod((n / lit(256L)).cast("long"), lit(256L)).cast("string"),
      pmod(n, lit(256L)).cast("string"))

  /** ClickHouse `IPv4StringToNum(s)`: UInt32 from a dotted quad
    * (null-safe: '' octets become null via the cast). */
  def ipv4StringToNum(s: Column): Column = {
    def oct(i: Int): Column =
      regexp_extract(s, "^(\\d+)\\.(\\d+)\\.(\\d+)\\.(\\d+)$", i).cast("long")
    oct(1) * lit(16777216L) + oct(2) * lit(65536L) +
      oct(3) * lit(256L) + oct(4)
  }

  /** ClickHouse `IPv4CIDRToRange(n, bits)`: (lo, hi) of the /bits
    * network containing n, as a struct — mask arithmetic via exact
    * integer division (bits is a literal). */
  def ipv4CidrToRange(n: Column, bits: Int): Column = {
    require(bits >= 0 && bits <= 32, "prefix length must be in [0, 32]")
    val block = 1L << (32 - bits)
    val lo = (n / lit(block)).cast("long") * lit(block)
    struct(lo.as("lo"), (lo + lit(block - 1)).as("hi"))
  }

  /** DuckDB replica of the q_ipv4_funcs round-trip (num → string →
    * num, plus the /24 range) over a hash-derived address. */
  val ipv4FuncsOracleSql: String =
    """WITH u AS (SELECT event_id, CAST('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) % 4294967296 AS ip FROM events),
s AS (SELECT event_id, ip,
 CAST(ip // 16777216 AS VARCHAR) || '.' || CAST((ip // 65536) % 256 AS VARCHAR) || '.' || CAST((ip // 256) % 256 AS VARCHAR) || '.' || CAST(ip % 256 AS VARCHAR) AS ip_str FROM u)
SELECT event_id, ip, ip_str,
 CAST(regexp_extract(ip_str, '^(\d+)\.(\d+)\.(\d+)\.(\d+)$', 1) AS BIGINT) * 16777216 +
 CAST(regexp_extract(ip_str, '^(\d+)\.(\d+)\.(\d+)\.(\d+)$', 2) AS BIGINT) * 65536 +
 CAST(regexp_extract(ip_str, '^(\d+)\.(\d+)\.(\d+)\.(\d+)$', 3) AS BIGINT) * 256 +
 CAST(regexp_extract(ip_str, '^(\d+)\.(\d+)\.(\d+)\.(\d+)$', 4) AS BIGINT) AS round_trip,
 (ip // 256) * 256 AS net_lo, (ip // 256) * 256 + 255 AS net_hi
FROM s"""

  /** DuckDB replica: same synthesis, same RE2 patterns. */
  val urlFuncsOracleSql: String =
    raw"""WITH u AS (SELECT event_id,
 'https://site' || CAST(user_id % 20 AS VARCHAR) || '.example.com/c/' || event_type ||
 '?q=' || CAST(event_id % 10 AS VARCHAR) || '&ref=r' || CAST(user_id % 3 AS VARCHAR) AS url
 FROM events)
SELECT event_id,
 regexp_extract(url, '^([a-z]+)://', 1) AS proto,
 regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1) AS dom,
 regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1), '\.([a-z]+)$$', 1) AS tld,
 regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
 regexp_extract(url, '\?([^#]*)', 1) AS qs,
 regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param,
 regexp_replace(url, '\?[^#]*', '') AS cut_qs
FROM u"""
}
