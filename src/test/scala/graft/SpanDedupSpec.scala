package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Span-level dedup semantics on planted fixtures: global
  * first-occurrence wins by (doc_id, pos), reassembly preserves span
  * order, fully-duplicated documents stay visible with kept_spans=0. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("spanDedup keeps only the globally first occurrence of each span") {
    // spanTokens=2 → doc 1 spans: "a b","c d"; doc 2 repeats "a b" then
    // has its own "x y"; doc 3 is ENTIRELY made of doc 1/2 spans.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d x y")
    ).toDF("doc_id", "text")

    val out = Corpus.spanDedup(docs, col("doc_id"), col("text"), spanTokens = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    assert(out === Map(
      1L -> ((2L, 2L, "a b c d")),
      2L -> ((1L, 2L, "x y")),
      3L -> ((0L, 2L, ""))))
  }

  test("spanDedup reassembles surviving spans in document order") {
    // doc 20 loses its MIDDLE span to doc 10; flanks must rejoin in order
    val docs = Seq(
      (10L, "dup dup"),
      (20L, "k1 k2 dup dup k3 k4")
    ).toDF("doc_id", "text")

    val out = Corpus.spanDedup(docs, col("doc_id"), col("text"), spanTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

    assert(out(10L) === "dup dup")
    assert(out(20L) === "k1 k2 k3 k4")
  }
}
