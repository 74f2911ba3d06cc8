package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse `LIMIT n OFFSET m BY key` clause analog — per-group
  * pagination: for every group, the rows ranked [m, m+n) under the
  * query's ORDER BY (reference context: the dashboard idiom
  * `ORDER BY ts DESC LIMIT 3 BY user_id` — "each user's latest 3
  * events" — over the engagement tables,
  * sql/clickhouse-init.sql engagement schema).
  *
  * NOT a window-rank: `row_number() OVER (PARTITION BY key ORDER BY…)`
  * buffers and sorts every group's full history in one WindowExec
  * group — the hot-key hazard SCALE.md's fifteenth finding measures.
  * Instead the per-group candidate set is reduced by the bounded-heap
  * [[graft.functions.BoundedTopK]] aggregate to at most n+m rows per
  * key BEFORE any sort (partial+final hash agg, ≤ 2(n+m) pairs of
  * map-side state per key), then the surviving (key, rank) pairs —
  * |groups|·(n+m) rows max — join back to recover the full rows. A
  * group's raw cardinality never reaches a sort or a window buffer.
  */
object LimitBy {

  /** Rows ranked [offset, offset+n) per group under (score DESC,
    * rowKey ASC). `rowKey` must be unique in `df` (it is the join-back
    * identity); output adds a 0-based `pos` rank column.
    *
    * Scale: one bounded-heap hash aggregate (state ≤ 2(n+offset)
    * pairs/key) + one join whose build side is |groups|·(n+offset)
    * rows. The join-back keys are unique on both sides, so there is no
    * amplification; at warehouse scale the rank side is orders of
    * magnitude smaller than the fact and AQE broadcast-plans it. */
  def limitBy(df: DataFrame, groupCols: Seq[String], score: Column,
      rowKey: Column, n: Int, offset: Int = 0): DataFrame = {
    require(n > 0 && offset >= 0, s"need n > 0, offset >= 0; got $n/$offset")
    val spark = df.sparkSession
    graft.functions.BoundedTopK.register(spark)
    val g = groupCols.map(col)
    val ranked = df
      .select(g :+ score.cast("double").as("_s") :+
        rowKey.cast("long").as("_rk"): _*)
      .groupBy(g: _*)
      .agg(expr(s"bounded_top_k(_s, _rk, ${n + offset})").as("_top"))
      .select(g :+ posexplode(col("_top")).as(Seq("pos", "_kv")): _*)
      .where(col("pos") >= offset)
      .select(col("_kv.key").as("_rk"), col("pos"))
    df.join(ranked, rowKey.cast("long") === ranked("_rk"))
      .drop("_rk")
  }

  /** DuckDB replica: row_number pagination (the semantics spec — the
    * oracle may sort whole groups; the engine may not). */
  def oracleSql(src: String, groupSql: Seq[String], scoreSql: String,
      rowKeySql: String, selectSql: String, n: Int, offset: Int): String = {
    val part = groupSql.mkString(", ")
    s"""WITH r AS (SELECT *, row_number() OVER (PARTITION BY $part ORDER BY $scoreSql DESC, $rowKeySql ASC) - 1 AS pos FROM $src)
SELECT $selectSql, CAST(pos AS INT) AS pos FROM r WHERE pos >= $offset AND pos < ${offset + n}"""
  }
}
