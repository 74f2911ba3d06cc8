package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse `ANY JOIN` analog (`LEFT ANY JOIN` / `INNER ANY JOIN`,
  * reference-context: the dim-enrichment idiom ClickHouse users reach
  * for when the right side carries duplicate keys and they want "one
  * row out per left row, pick a single match").
  *
  * ClickHouse's contract is "the first matching row found" — an
  * execution-order accident. This implementation makes the choice
  * DETERMINISTIC: the surviving right row per key is the minimum
  * under an explicit tiebreak order (extended with the remaining
  * payload columns so the order is total), which is both reproducible
  * across runs/engines and strictly more useful ("cheapest / earliest
  * match" instead of "whichever arrived first").
  *
  * Spark-first plan: REDUCE-THEN-JOIN. The right side collapses to
  * one row per key with a single `min(struct(...))` hash aggregate
  * (struct ordering is lexicographic over its fields, so the partial
  * aggregate is map-side combinable and skew-immune), and only then
  * joins — a plain equi-join whose right cardinality is |distinct
  * keys|, not |right|. The alternative — join everything then
  * window-rank the joined output — shuffles |left|·avg-fanout rows
  * and buffers per-key groups in WindowExec; the reduce-first form
  * never materializes the fanout at all, and AQE is free to broadcast
  * the reduced side when |distinct keys| is small. This is exactly
  * why ANY JOIN exists in ClickHouse: it bounds join amplification.
  *
  * Null contract: tiebreak columns should be non-null for
  * cross-engine parity (engines disagree on null-ordering defaults;
  * the oracle pins `row_number() ORDER BY tiebreak…` semantics).
  */
object AnyJoin {

  /** One row per `keys` from `right`: the minimum of
    * `tiebreak ++ remaining-payload` (a total order when the extended
    * tuple is unique; ties beyond it are value-identical rows). */
  def reduceAny(right: DataFrame, keys: Seq[String],
                tiebreak: Seq[String]): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val ordered = (tiebreak ++ payload.filterNot(tiebreak.contains)).map(col)
    right.groupBy(keys.map(col): _*)
      .agg(min(struct(ordered: _*)).as("_any"))
      .select(keys.map(col) ++ payload.map(c => col(s"_any.`$c`").as(c)): _*)
  }

  /** `left [LEFT|INNER] ANY JOIN right USING keys`, deterministic:
    * each left row pairs with the tiebreak-minimal right row for its
    * key (or nulls under `left` when no match exists). */
  def anyJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
              tiebreak: Seq[String], joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"ANY JOIN supports left/inner, got $joinType")
    left.join(reduceAny(right, keys, tiebreak), keys, joinType)
  }
}
