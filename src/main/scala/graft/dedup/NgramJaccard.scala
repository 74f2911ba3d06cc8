package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/** Exact all-pairs n-gram Jaccard similarity via a shingle inverted
  * index: explode shingles, self-join on the shingle, count per pair,
  * jaccard = |∩| / (|A| + |B| - |∩|).
  *
  * This is the exact (non-probabilistic) rung of the dedup ladder. The
  * inverted-index join bounds work by shared-shingle volume rather than
  * the quadratic all-pairs space — EXCEPT around ultra-frequent
  * "stop-shingles" ("of the and" in every document), where one hot
  * shingle makes the self-join quadratic in its posting-list length.
  * The skew guard is therefore ON by default: shingles appearing in
  * more than `maxShingleFreq` documents contribute no pair evidence
  * (they carry ~zero similarity signal anyway), and the dropped
  * stop-shingle count is logged so a capped run is never silent.
  * Set sizes stay UNcapped, so jaccard is an underestimate for pairs
  * whose overlap was mostly stop-shingles — the conservative direction
  * for dedup (never inflates similarity).
  */
object NgramJaccard {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Stop-shingles: those appearing in more than `maxShingleFreq`
    * documents. Small on natural-language corpora (a short
    * ultra-frequent head) but potentially huge on template-heavy
    * crawls — callers must size-probe before collecting (see pairs). */
  def stopShingles(docs: DataFrame, id: Column, text: Column, n: Int,
      maxShingleFreq: Int): DataFrame =
    docs.select(id.as("doc_id"), explode(TextFunctions.shingles(text, n)).as("s"))
      .groupBy("s").count().filter(col("count") > maxShingleFreq)
      .select("s")

  /** Pairs (doc_a < doc_b) with jaccard >= threshold.
    * maxShingleFreq <= 0 disables frequency pruning (fully exact).
    *
    * The stop-shingle prune has two physical paths chosen at runtime by
    * the ACTUAL hot-set size, never assumed: on a natural corpus the
    * >maxShingleFreq head is tiny, so it is collected once and applied
    * as an O(1)-per-row InSet filter; on a template-heavy / adversarial
    * corpus the head can run to millions of shingles, where a driver
    * collect would OOM — past `maxHotSetSize` the prune switches to a
    * distributed left-anti join against the hot-shingle table instead
    * (same semantics, bounded driver memory). The chosen path is
    * logged, so a capped or degraded run is never silent. */
  def pairs(docs: DataFrame, id: Column, text: Column, n: Int = 3,
      threshold: Double = 0.8, maxShingleFreq: Int = 128,
      maxHotSetSize: Int = 10000): DataFrame = {
    val sh0 = docs.select(id.as("doc_id"),
        explode(TextFunctions.shingles(text, n)).as("s"))
    val sh =
      if (maxShingleFreq > 0) {
        val hotDf = stopShingles(docs, id, text, n, maxShingleFreq)
        // probe the size WITHOUT materializing rows on the driver: only
        // up to maxHotSetSize+1 rows survive the limit, so the count is
        // bounded however pathological the corpus is
        val hotProbe = hotDf.limit(maxHotSetSize + 1).count()
        if (hotProbe == 0L) sh0
        else if (hotProbe <= maxHotSetSize) {
          val hot = hotDf.collect().map(_.getString(0))
          log.warn(s"NgramJaccard: dropping ${hot.length} stop-shingles with " +
            s"doc-frequency > $maxShingleFreq from pair evidence via the " +
            "InSet fast path (set sizes stay uncapped)")
          sh0.filter(!col("s").isInCollection(hot))
        } else {
          log.warn(s"NgramJaccard: hot set exceeds $maxHotSetSize stop-shingles " +
            s"(doc-frequency > $maxShingleFreq); pruning via distributed " +
            "anti-join instead of a driver collect (set sizes stay uncapped)")
          sh0.join(hotDf.withColumnRenamed("s", "hot_s"),
            col("s") === col("hot_s"), "left_anti")
        }
      } else sh0
    val sizes = sh0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // merge-hinted self-join: both sides are |corpus|×|shingles| rows —
    // a broadcast pick off a misestimate would ship the corpus through
    // the driver (see MinHash.candidatePairs for the measured case)
    val common = sh.as("a").join(sh.as("b").hint("merge"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast(DoubleType) /
          (col("sa.n_sh") + col("sb.n_sh") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** DuckDB SQL replicating pairs() — including the stop-shingle cap —
    * over table `documents`. */
  def oracleSql(n: Int = 3, threshold: Double = 0.8, maxShingleFreq: Int = 128): String = {
    val prune =
      if (maxShingleFreq > 0)
        s""",
hot AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh0 GROUP BY 1) WHERE c > $maxShingleFreq),
sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 ANTI JOIN hot ON sh0.s = hot.s)"""
      else ",\nsh AS (SELECT doc_id, s FROM sh0)"
    raw"""WITH sh0 AS (SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+${n - 1}], ' ') FOR i IN range(1, greatest(len(toks)-${n - 1}, 1)+1)])) AS s FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))$prune,
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY 1),
common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, jaccard FROM (SELECT doc_a, doc_b, CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard FROM common JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id) WHERE jaccard >= $threshold"""
  }
}
