package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClickHouse array-function surface (`arrayCumSum`, `arrayDifference`,
  * `arrayCompact`, `arrayDistinct`/`arrayUniq`) as Spark HIGHER-ORDER
  * functions — `transform` / `aggregate` / `zip_with` / `filter` over
  * a row-local array, all inside whole-stage codegen, no UDF.
  *
  * Data-model note (the scale contract): in ClickHouse these operate
  * on arrays STORED per row — the array is the data model, not a
  * grouped collect. The demo entry point below synthesizes its arrays
  * with one hash aggregate per (user, day) so each group's state is
  * bounded by a user's DAILY event volume (the bounded-window
  * contract; an unbounded per-user collect_list would be the exact
  * hot-key hazard SCALE.md's fifteenth finding measures). At 100 TB
  * the arrays would already sit in the rows, and every derivation
  * here is a pure per-row map — embarrassingly parallel, no shuffle.
  *
  * The exploded output makes the whole sweep RELATIONALLY checkable:
  * cumulative sums become window sums, differences become lags, the
  * compact length becomes a change-point count — so the DuckDB oracle
  * gates the array semantics without list-function parity concerns.
  */
object ArrayFuncs {

  /** Per-(user, day) ordered value array and its derived forms,
    * exploded back to one row per element:
    * (user_id, day, idx, v, cum, dif, n, n_distinct, n_compact).
    *
    *  - `cum` — ClickHouse `arrayCumSum`: running sum in array order.
    *  - `dif` — `arrayDifference`: first element 0, then a[i]−a[i−1].
    *  - `n_compact` — length of `arrayCompact` (consecutive-duplicate
    *    collapse), counted as change points without materializing the
    *    compacted array.
    *  - `n_distinct` — `arrayUniq`.
    *
    * Order inside each array is total: (ts, event_id) with event_id
    * unique. Values are exact value-millisecond longs
    * (floor(v·1000 + 0.5) — the repo's portable rounding). */
  def sweep(events: DataFrame): DataFrame = {
    val base = events.select(
      col("user_id"),
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
      col("ts"), col("event_id"),
      floor(col("value") * 1000 + 0.5).cast("long").as("v"))
    val arr = base
      .groupBy(col("user_id"), col("day"))
      .agg(expr("transform(array_sort(collect_list(struct(ts, event_id, v))), x -> x.v)").as("a"))
    arr
      .withColumn("cum", expr(
        """aggregate(a,
             named_struct('arr', CAST(array() AS ARRAY<BIGINT>), 's', CAST(0 AS BIGINT)),
             (acc, x) -> named_struct('arr', concat(acc.arr, array(acc.s + x)), 's', acc.s + x),
             acc -> acc.arr)"""))
      .withColumn("dif", expr(
        "zip_with(a, concat(array(a[0]), slice(a, 1, size(a) - 1)), (x, p) -> x - p)"))
      .withColumn("n", size(col("a")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("a"))).cast("long"))
      .withColumn("n_compact", expr(
        """CAST(size(filter(
             zip_with(a, concat(array(CAST(NULL AS BIGINT)), slice(a, 1, size(a) - 1)),
                      (x, p) -> p IS NULL OR x != p),
             b -> b)) AS BIGINT)"""))
      .select(col("user_id"), col("day"), col("n"), col("n_distinct"),
        col("n_compact"),
        posexplode(expr("arrays_zip(a, cum, dif)")).as(Seq("idx", "z")))
      .select(col("user_id"), col("day"), col("idx"),
        col("z.a").as("v"), col("z.cum").as("cum"), col("z.dif").as("dif"),
        col("n"), col("n_distinct"), col("n_compact"))
  }

  /** The relational twin: every array derivation restated as window
    * arithmetic over the same total order. */
  val sweepOracleSql: String =
    """WITH b AS (
         SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v, ts, event_id
         FROM events),
       o AS (
         SELECT user_id, day, v,
                row_number() OVER w AS rn,
                lag(v) OVER w AS pv,
                CAST(sum(v) OVER (PARTITION BY user_id, day
                                  ORDER BY ts, event_id) AS BIGINT) AS cum
         FROM b
         WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)),
       agg AS (
         SELECT user_id, day,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                CAST(sum(CASE WHEN pv IS NULL OR v <> pv THEN 1 ELSE 0 END) AS BIGINT) AS n_compact
         FROM o GROUP BY user_id, day)
       SELECT o.user_id, o.day, CAST(o.rn - 1 AS INT) AS idx, o.v, o.cum,
              o.v - coalesce(o.pv, o.v) AS dif, agg.n, agg.n_distinct, agg.n_compact
       FROM o JOIN agg USING (user_id, day)"""
}
