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
