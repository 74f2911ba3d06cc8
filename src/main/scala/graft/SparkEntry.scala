package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[graft.queries.Queries]]; this object is
  * the stable facade the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: broadcast-enriched events
    * rolled up to the tumbling hour (the reference's §3.1+§3.3 hot path).
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.runners("q_hourly_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.runners

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Queries.oracles
}
