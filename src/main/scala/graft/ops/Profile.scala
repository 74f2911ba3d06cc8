package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the first pass a training-data pipeline runs over
  * an unfamiliar corpus drop (and the `DESCRIBE`-plus a warehouse UI
  * renders): per column, row/null/distinct counts, min/max, and the
  * top values with frequencies, in one deterministic report.
  *
  * Shape: the table UNPIVOTs to (column, value-as-string) via stack()
  * — one narrow map pass, no join — then two hash aggregates: per
  * (column, value) counts, then the per-column summary. Top values
  * rank over the per-column COUNT table (already value-distinct, the
  * rank-test reduction); ties break on value string ascending so the
  * report is bit-stable. NULLs count separately and are excluded from
  * distinct/min/max/top (the SQL convention).
  *
  * Scale: the unpivot multiplies rows by |columns| (bounded), the
  * count table is Σ per-column distinct values, and the rank window
  * partitions by column over that already-aggregated table — for a
  * column that is effectively a unique key the group is
  * corpus-proportional, so profile WIDE-cardinality columns with a
  * count floor (`minCount` > 1 drops singletons before ranking — the
  * standard profiling trade-off, stated in the report contract).
  *
  * Output: (column, n_rows, n_nulls, n_distinct, min_v, max_v STRING,
  *          top_values STRING "v:c,v:c,…" — count desc, value asc). */
object Profile {

  def columns(df: DataFrame, cols: Seq[String], topK: Int = 3,
      minCount: Long = 1L): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(topK >= 1 && minCount >= 1, "topK and minCount must be >= 1")
    // parse-free unpivot: names travel as lit() values and columns
    // resolve via col(), so a name with a quote or backtick — exactly
    // what a profiler pointed at an unfamiliar schema meets — can
    // never break a generated stack() literal
    val long = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.v"))
    val counts = long.filter(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val summary = long.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"))
    val stats = counts.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_distinct"),
      min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val rk = Window.partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("v").asc)
    // collect_list order is partition-dependent; array_sort on the
    // (rank, string) struct restores a canonical order
    val topCanon = counts.filter(col("cnt") >= minCount)
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= topK)
      .groupBy(col("col_name"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("rk"), concat(col("v"), lit(":"), col("cnt")).as("s")))),
        x => x.getField("s")), ",").as("top_values"))
    summary.join(stats, Seq("col_name"), "left")
      .join(topCanon, Seq("col_name"), "left")
      .select(col("col_name").as("column"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"),
        coalesce(col("top_values"), lit("")).as("top_values"))
  }

  /** DuckDB replica of [[columns]] over `documents`
    * (lang, source, n_chars; topK = 3). */
  val documentsOracleSql: String =
    """WITH long AS (
  SELECT 'lang' AS col_name, CAST(lang AS VARCHAR) AS v FROM documents
  UNION ALL SELECT 'source', CAST(source AS VARCHAR) FROM documents
  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
counts AS (SELECT col_name, v, count(*) AS cnt FROM long WHERE v IS NOT NULL GROUP BY 1, 2),
summary AS (SELECT col_name, count(*) AS n_rows, sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_nulls FROM long GROUP BY 1),
stats AS (SELECT col_name, count(*) AS n_distinct, min(v) AS min_v, max(v) AS max_v FROM counts GROUP BY 1),
top AS (SELECT col_name, string_agg(v || ':' || cnt, ',' ORDER BY rk) AS top_values
 FROM (SELECT col_name, v, cnt, row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, v ASC) AS rk FROM counts)
 WHERE rk <= 3 GROUP BY 1)
SELECT summary.col_name AS "column", CAST(n_rows AS BIGINT) AS n_rows,
 CAST(n_nulls AS BIGINT) AS n_nulls, CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct,
 min_v, max_v, coalesce(top_values, '') AS top_values
FROM summary LEFT JOIN stats USING (col_name) LEFT JOIN top USING (col_name)"""
}
