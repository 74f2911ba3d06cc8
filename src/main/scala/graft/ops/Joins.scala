package graft.ops

import org.apache.spark.sql.DataFrame

/** Join-strategy pin for CORPUS-DERIVED build sides (gram/span/vocab/
  * rank tables whose cardinality tracks the corpus).
  *
  * Why a pin at all: Catalyst's static size estimates under explode
  * amplification repeatedly mis-plan these joins as broadcasts, which
  * funnel the whole table through the driver (SCALE.md findings one,
  * four, five — measured 128-243 MB driver growth per 10× step).
  *
  * Why sort-merge and not shuffled-hash: the 100× forced probe OOM'd
  * the novelty rung's hash build ("not enough memory to build hash
  * map") — a shuffled-hash pin trades the driver-broadcast failure for
  * a task-memory one the moment build-side-per-partition exceeds the
  * task's execution-memory share (fixed partition count, or any hot
  * key). Sort-merge reuses the same key partitioning, never
  * broadcasts, and SPILLS GRACEFULLY — the only strategy whose memory
  * is bounded at every scale and every skew (SCALE.md seventh
  * finding). Shuffled-hash stays the right choice only for tables
  * with a PROVEN bound (k-means centroids, top-k heads — which are
  * broadcast anyway).
  *
  * Escape hatch: set session conf `spark.graft.corpusJoin` to
  * `shuffle_hash` on a cluster whose shuffle partitions are sized so
  * build sides fit task memory — SHJ skips the sort and measured ~2×
  * faster at the 10× probe size. The default is the strategy that
  * cannot OOM.
  */
object Joins {

  val ConfKey = "spark.graft.corpusJoin"

  /** Hint `df` as a corpus-derived join side: sort-merge unless the
    * session conf overrides to shuffle_hash. */
  def corpusSide(df: DataFrame): DataFrame = {
    val strategy =
      df.sparkSession.conf.get(ConfKey, "merge") match {
        case "shuffle_hash" => "shuffle_hash"
        case _              => "merge"
      }
    df.hint(strategy)
  }
}
