package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation join: the salt-and-replicate technique for a
  * shuffle join whose key distribution is too skewed for one reducer
  * (the complement of [[Rollups.saltedSum]] for joins, and the manual
  * fallback when AQE's skew-join split can't apply — e.g. a
  * ShuffledHashJoin or a key so hot one split still overflows).
  *
  * The FACT side gains a salt in [0, buckets) derived from a stable
  * per-row column (deterministic — no rand(), so retries/speculative
  * tasks agree); the DIM side is replicated `buckets`× with every salt
  * value. The join key becomes (key, salt): a key holding N rows now
  * spreads over `buckets` reducers at the cost of dim×buckets shuffle
  * volume — the standard trade, worth it when fact-side skew dominates.
  * The salt never escapes: output columns equal the unsalted join's,
  * and the result is row-identical to it (what the oracle checks). */
object Skew {

  /** Inner-join `fact` to `dim` on `key` with `buckets`-way salting.
    * `saltSrc` must be a stable fact-side expression (any per-row
    * value; quality of spread matters, correctness doesn't). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-distribution profiler — the measurement that DECIDES when
    * [[saltedJoin]] / AQE skew handling is needed, run before shipping
    * a 100 TB shuffle rather than after it dies. Emits the top-`topN`
    * hottest keys, each row carrying the global stats: key count,
    * per-key share (micro-units), max/mean skew ratio (micros),
    * coefficient of variation (micros, IEEE sqrt over exact integer
    * moments — correctly rounded, so both engines agree bit-for-bit),
    * and a hot flag (key > 10× mean).
    *
    * Scale: one hash aggregate on the key (map-side combine), a
    * 4-value moment aggregate over the key-count table, and a
    * per-partition top-N merge (orderBy+limit — never a corpus-wide
    * window; row_number runs over the ≤ topN survivors). Driver sees
    * topN rows. */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    require(topN > 0)
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      sum(col("cnt") * col("cnt")).as("sum_sq"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("key").asc)))
    top.crossJoin(broadcast(stats))
      .select(col("rk").cast("int").as("rk"), col("key"), col("cnt"),
        expr("cnt * 1000000 div total_rows").as("share_micros"),
        col("n_keys"), col("total_rows"),
        expr("max_cnt * n_keys * 1000000 div total_rows").as("skew_ratio_micros"),
        floor(sqrt((col("n_keys") * col("sum_sq") -
            col("total_rows") * col("total_rows")).cast("double"))
          / col("total_rows") * lit(1000000.0) + lit(0.5))
          .cast("long").as("cv_micros"),
        (col("cnt") > expr("(total_rows div n_keys) * 10")).as("hot"))
  }

  /** DuckDB replica of [[keySkewProfile]] for key expression `keySql`
    * over relation `fromSql`. */
  def keySkewProfileOracleSql(keySql: String, fromSql: String,
      topN: Int = 10): String =
    s"""WITH c AS (SELECT $keySql AS key, CAST(count(*) AS BIGINT) AS cnt FROM $fromSql GROUP BY 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows, CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(cnt*cnt) AS BIGINT) AS sum_sq FROM c),
t AS (SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key ASC) AS rk FROM c)
SELECT CAST(rk AS INTEGER) AS rk, key, cnt, cnt * 1000000 // total_rows AS share_micros, n_keys, total_rows, max_cnt * n_keys * 1000000 // total_rows AS skew_ratio_micros, CAST(floor(sqrt(CAST(n_keys*sum_sq - total_rows*total_rows AS DOUBLE))/total_rows*1000000 + 0.5) AS BIGINT) AS cv_micros, cnt > (total_rows // n_keys) * 10 AS hot FROM t, s WHERE rk <= $topN"""
}
