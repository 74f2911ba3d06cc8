package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse's dashboard-rounding ladder family — `roundToExp2`,
  * `roundDuration`, `roundAge` (the functions its own docs describe as
  * "for implementing histograms over session/demographic axes"). All
  * three are pure per-row integer maps (codegen'd CASE chains / bit
  * arithmetic — no floats anywhere, so cross-engine exactness is by
  * construction), trivially 100 TB-parallel.
  */
object Rounding {

  /** `roundToExp2(x)`: the largest power of two ≤ x; 0 for x ≤ 0.
    * Computed from the BINARY DIGIT COUNT (1 << (len(bin(x)) − 1)) —
    * exact integer arithmetic in both engines, where a floor(log2(x))
    * would ride libm's last-ulp (log2(2^k) is not guaranteed correctly
    * rounded as ln(x)/ln(2)). */
  def roundToExp2(x: Column): Column =
    when(x <= 0, lit(0L))
      // shiftleft's functions-API overload takes only a literal shift;
      // the SQL function accepts a column amount (the playbook idiom)
      .otherwise(call_function("shiftleft", lit(1L),
        (length(bin(x)) - 1).cast("int")))

  /** The `roundDuration` ladder (seconds — ClickHouse's published
    * steps): 0, 1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800,
    * 3600, 7200, 18000, 36000. */
  val DurationLadder: Seq[Long] =
    Seq(1L, 10L, 30L, 60L, 120L, 180L, 240L, 300L, 600L, 1200L, 1800L,
      3600L, 7200L, 18000L, 36000L)

  /** `roundDuration(x)`: round x down to the ladder (0 below 1).
    * Folded in ASCENDING step order so the largest step's `when` ends
    * up outermost (each iteration wraps the previous expression — a
    * descending fold would leave the x ≥ 1 arm outermost and send
    * every positive value to 1). */
  def roundDuration(x: Column): Column =
    DurationLadder.foldLeft(lit(0L): Column) { (acc, step) =>
      when(x >= step, lit(step)).otherwise(acc)
    }

  /** The `roundAge` ladder (ClickHouse's published demographic bands):
    * 0 → 0, 1..17 → 17, 18..24 → 18, 25..34 → 25, 35..44 → 35,
    * 45..54 → 45, 55+ → 55. (Not monotone-down like the others — 1..17
    * rounds UP to 17 — which is exactly why it is pinned by value.) */
  def roundAge(x: Column): Column =
    when(x <= 0, lit(0L))
      .when(x < 18, lit(17L))
      .when(x < 25, lit(18L))
      .when(x < 35, lit(25L))
      .when(x < 45, lit(35L))
      .when(x < 55, lit(45L))
      .otherwise(lit(55L))

  /** DuckDB replica of [[roundToExp2]] over integer SQL `x`. */
  def roundToExp2Sql(x: String): String =
    s"CASE WHEN ($x) <= 0 THEN 0 ELSE CAST(1 AS BIGINT) << (length(bin($x)) - 1) END"

  /** DuckDB replica of [[roundDuration]]. */
  def roundDurationSql(x: String): String = {
    val arms = DurationLadder.reverse
      .map(s => s"WHEN ($x) >= $s THEN $s").mkString(" ")
    s"CAST(CASE $arms ELSE 0 END AS BIGINT)"
  }

  /** DuckDB replica of [[roundAge]]. */
  def roundAgeSql(x: String): String =
    s"CAST(CASE WHEN ($x) <= 0 THEN 0 WHEN ($x) < 18 THEN 17 WHEN ($x) < 25 THEN 18 WHEN ($x) < 35 THEN 25 WHEN ($x) < 45 THEN 35 WHEN ($x) < 55 THEN 45 ELSE 55 END AS BIGINT)"
}
