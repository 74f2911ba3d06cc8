package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/** Distributed BPE tokenizer training + application (the Sennrich et
  * al. 2016 merge loop, in the word-frequency formulation production
  * tokenizer trainers use).
  *
  * Scale shape — the part that matters at 100 TB:
  *  1. ONE corpus-wide aggregate reduces tokens to the (word, freq)
  *     vocabulary table. Everything after operates on the VOCAB, which
  *     is Heaps'-law-bounded, not corpus-bounded.
  *  2. Each merge iteration is a vocab-sized pair explode + weighted
  *     count (map-side combine on exact integer freqs) and a 1-ROW
  *     argmax collect (the merge to apply) — the only driver
  *     materialization, nMerges rows total.
  *  3. Merge application is a per-row string replace over the vocab
  *     (left-to-right non-overlapping in both engines — greedy BPE
  *     order), localCheckpointed per iteration so lineage doesn't
  *     recompute the whole chain under each iteration's action.
  *  4. Encoding joins the corpus token stream back to the final vocab
  *     representation on the word key. The vocab is corpus-DERIVED, so
  *     the join carries the corpus-side sort-merge pin — the mis-broadcast
  *     class (SCALE.md findings four/five) applies verbatim.
  *
  * Tie-breaks are total (count desc, pair asc on exact integers), so
  * the learned merges — and therefore the whole oracle replay — are
  * deterministic.
  */
object Bpe {

  /** Trained state: the merge list (driver-side, nMerges rows) and the
    * final per-word representation table (distributed, vocab-sized). */
  private final case class Trained(
      merges: Seq[(Int, String, String, Long)], vocab: DataFrame)

  private def train(docs: DataFrame, text: Column, nMerges: Int): Trained = {
    require(nMerges >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"),
        concat_ws(" ", split(col("word"), "")).as("repr"), col("freq"))
    var repr = vocab.localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val t = split(col("repr"), " ")
      val pairs = repr.select(
          explode(when(size(t) >= 2,
            transform(sequence(lit(0), size(t) - 2), j =>
              concat(element_at(t, j + 1), lit(" "), element_at(t, j + 2))))
            .otherwise(array().cast("array<string>"))).as("pair"),
          col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      // the 1-row argmax is the only driver materialization (bounded:
      // nMerges rows over the whole training run)
      val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .as[(String, Long)].collect()
      if (top.nonEmpty) {
        val (pair, cnt) = top.head
        val merged = pair.replace(" ", "")
        learned += ((rank, pair, merged, cnt))
        repr = repr.select(col("word"),
          trim(replace(concat(lit(" "), col("repr"), lit(" ")),
            lit(s" $pair "), lit(s" $merged "))).as("repr"),
          col("freq")).localCheckpoint()
      }
    }
    Trained(learned.result(), repr)
  }

  /** Learn `nMerges` BPE merges; returns (rank, pair, merged, cnt). */
  def learnMerges(docs: DataFrame, id: Column, text: Column,
      nMerges: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, text, nMerges).merges
      .toDF("rank", "pair", "merged", "cnt")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("merged"),
        col("cnt").cast(LongType).as("cnt"))
  }

  /** Tokenize the corpus under the learned merges: per document, the
    * whitespace word count and the subword (BPE) token count. The
    * corpus-sized token stream joins the vocab-sized repr table on the
    * word key — sort-merge pinned (corpus-derived build side must
    * never broadcast). Returns (doc_id, n_words, n_bpe). */
  def encode(docs: DataFrame, id: Column, text: Column,
      nMerges: Int = 4): DataFrame = {
    val subTokens = train(docs, text, nMerges).vocab
      .select(col("word"), size(split(col("repr"), " ")).cast(LongType).as("n_sub"))
    val words = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(text)).as("word"))
    val enc = words.join(Joins.corpusSide(subTokens), Seq("word"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe"))
    docs.select(id.as("doc_id")).join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).cast(LongType).as("n_words"),
        coalesce(col("n_bpe"), lit(0L)).cast(LongType).as("n_bpe"))
  }

  /** The shared DuckDB merge-loop chain over table `documents`: CTEs
    * w, r0, then (p_i, m_i, r_i) per merge — r_i carries (word, repr,
    * freq) so both the merge listing and the encode join can read it. */
  private def chainSql(nMerges: Int): String = {
    val head =
      raw"""WITH w AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents) GROUP BY tok),
r0 AS (SELECT word, array_to_string(regexp_split_to_array(word, ''), ' ') AS repr, freq FROM w)"""
    val its = (1 to nMerges).map { i =>
      s"""p$i AS (SELECT t[i] || ' ' || t[i+1] AS pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (SELECT regexp_split_to_array(repr, ' ') AS t, freq FROM r${i - 1}), LATERAL unnest(range(1, len(t))) AS u(i) GROUP BY 1),
m$i AS (SELECT $i AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1),
r$i AS (SELECT word, trim(replace(' ' || repr || ' ', ' ' || (SELECT pair FROM m$i) || ' ', ' ' || (SELECT merged FROM m$i) || ' ')) AS repr, freq FROM r${i - 1})"""
    }.mkString(",\n")
    s"$head,\n$its"
  }

  /** DuckDB replica of [[learnMerges]]. */
  def learnMergesOracleSql(nMerges: Int = 4): String = {
    val union = (1 to nMerges)
      .map(i => s"SELECT CAST(rank AS INTEGER) AS rank, pair, merged, cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"${chainSql(nMerges)}\n$union"
  }

  /** DuckDB replica of [[encode]]. */
  def encodeOracleSql(nMerges: Int = 4): String =
    raw"""${chainSql(nMerges)},
tokd AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents),
enc AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(len(regexp_split_to_array(r.repr, ' '))) AS BIGINT) AS n_bpe FROM tokd t JOIN r$nMerges r ON t.word = r.word GROUP BY t.doc_id)
SELECT d.doc_id, CAST(coalesce(enc.n_words, 0) AS BIGINT) AS n_words, CAST(coalesce(enc.n_bpe, 0) AS BIGINT) AS n_bpe FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id"""
}
