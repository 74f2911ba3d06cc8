package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/** Exact token-set Jaccard similarity join via PREFIX FILTERING — the
  * AllPairs/PPJoin family (Bayardo et al. 2007, "Scaling Up All Pairs
  * Similarity Search"). The exact-at-scale rung of the dedup ladder:
  * where [[NgramJaccard]] joins on EVERY shingle (bounded only by the
  * stop-shingle cap) and MinHash-LSH trades recall for bound, prefix
  * filtering is exact AND bounded: order each document's token set by
  * ascending global document frequency (rarest first) and note that two
  * sets with Jaccard >= t MUST share a token within each other's first
  * `|d| - ceil(t*|d|) + 1` tokens. Joining only those short prefixes —
  * whose tokens are by construction the RAREST and so have the shortest
  * posting lists — prunes the candidate space without losing a single
  * qualifying pair.
  *
  * Scale design: the df pass and the per-doc ordering are one shuffle
  * each on natural keys (token, doc); the candidate join touches only
  * prefix tokens (rare ⇒ short postings ⇒ near-linear candidates on
  * natural corpora); a length filter (`q·min >= p·max`, integer-exact)
  * prunes candidates before verification; verification joins each
  * candidate pair's full token lists — work ∝ Σ|candidate| · set size,
  * never all-pairs. Every corpus-proportional join side goes through
  * [[graft.ops.Joins.corpusSide]] (sort-merge pin, session-overridable
  * — SCALE.md findings 1/4/5/7: static estimates under explode
  * amplification mis-broadcast corpus-derived tables, and shuffled-hash
  * builds OOM where sort-merge spills gracefully).
  *
  * Determinism: the threshold is the RATIONAL p/q so every ceil is
  * integer arithmetic (`ceil(p·n/q) = (p·n + q - 1) div q`) — no float
  * boundary can disagree between engines; the final jaccard filter is
  * the cross-multiplied integer test, with the double emitted only for
  * reporting.
  */
object PrefixJoin {

  /** Pairs (doc_a < doc_b) of documents whose DISTINCT-token Jaccard
    * >= p/q, by prefix filtering. Default 4/5 = 0.8. */
  def pairs(docs: DataFrame, id: Column, text: Column,
      p: Int = 4, q: Int = 5): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"threshold p/q must be in (0,1]: $p/$q")
    // distinct tokens per document (lowercased whitespace tokens)
    val sh = docs.select(id.as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(lower(text)))).as("tok"))
    val df = sh.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-doc ordering by (df asc, tok asc) — total order, rarest first
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("tok").asc)
    val ordered = sh.join(graft.ops.Joins.corpusSide(df), Seq("tok"))
      .withColumn("pos", row_number().over(byDoc))
      .withColumn("n_tok",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    // prefix length = n - ceil(p*n/q) + 1, integer-exact
    val prefix = ordered.filter(
      col("pos") <= col("n_tok") - floorDiv(lit(p) * col("n_tok") + (q - 1), lit(q)) + 1)
      .select(col("doc_id"), col("tok"), col("n_tok"))
    // candidate pairs: share a prefix token + integer length filter
    // (jaccard >= p/q forces q*min(|a|,|b|) >= p*max(|a|,|b|)) —
    // merge pin: both sides are corpus-derived prefix streams
    val cand = prefix.as("a").join(graft.ops.Joins.corpusSide(prefix.as("b")),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
        lit(q) * least(col("a.n_tok"), col("b.n_tok")) >=
          lit(p) * greatest(col("a.n_tok"), col("b.n_tok")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_tok").as("na"), col("b.n_tok").as("nb"))
      .distinct()
    // verify: intersect full token lists of each candidate pair.
    // Work ∝ Σ over candidates of |a| + matching (doc,tok) probes —
    // candidate-bounded, shuffle-hash pinned on the corpus-wide sides.
    val common = cand
      .join(graft.ops.Joins.corpusSide(sh.as("ta")),
        col("doc_a") === col("ta.doc_id"))
      .join(graft.ops.Joins.corpusSide(sh.as("tb")),
        col("doc_b") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
    common
      // integer-exact threshold test: common/(na+nb-common) >= p/q
      .filter(lit(q) * col("common") >= lit(p) * (col("na") + col("nb") - col("common")))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast(DoubleType) /
          (col("na") + col("nb") - col("common"))).as("jaccard"))
  }

  private def floorDiv(num: Column, den: Column): Column =
    floor(num.cast(DoubleType) / den.cast(DoubleType)).cast("long")

  /** DuckDB SQL replicating [[pairs]] over table `documents`. */
  def oracleSql(p: Int = 4, q: Int = 5): String =
    raw"""WITH sh AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM documents),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY tok),
ordered AS (SELECT sh.doc_id, sh.tok, row_number() OVER (PARTITION BY sh.doc_id ORDER BY df.df ASC, sh.tok ASC) AS pos, count(*) OVER (PARTITION BY sh.doc_id) AS n_tok FROM sh JOIN df USING (tok)),
prefix AS (SELECT doc_id, tok, n_tok FROM ordered WHERE pos <= n_tok - CAST(floor(($p * n_tok + ${q - 1}) / CAST($q AS DOUBLE)) AS BIGINT) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_tok AS na, b.n_tok AS nb FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id AND $q * least(a.n_tok, b.n_tok) >= $p * greatest(a.n_tok, b.n_tok)),
common AS (SELECT doc_a, doc_b, na, nb, CAST(count(*) AS BIGINT) AS common FROM cand JOIN sh ta ON cand.doc_a = ta.doc_id JOIN sh tb ON cand.doc_b = tb.doc_id AND ta.tok = tb.tok GROUP BY doc_a, doc_b, na, nb)
SELECT doc_a, doc_b, CAST(common AS DOUBLE) / (na + nb - common) AS jaccard FROM common WHERE $q * common >= $p * (na + nb - common)"""
}
