package graft

import org.apache.spark.sql.functions._

import graft.dedup.Components
import graft.ops.{Corpus, Graph, Selection}
import graft.similarity.Ann

/** Planted-input semantics for the late round-6 curation batch
  * (boilerplate removal, PageRank, shuffle order, canonicalization,
  * hard negatives). The DuckDB oracle gate re-checks each end-to-end at
  * sf0.01; these pin the behavior where the answer is known by
  * construction. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- per-source boilerplate ---------------------------------------------

  test("boilerplate: template span removed from EVERY doc of the source; unique text survives") {
    // 4-token template heads three docs of src A; src B has the same
    // span once only (below minDf within its own source)
    val tpl = "copyright acme corp footer"
    val docs = Seq(
      (1L, s"$tpl alpha beta gamma delta", "A"),
      (2L, s"$tpl epsilon zeta eta theta", "A"),
      (3L, s"$tpl iota kappa lambda mu", "A"),
      (4L, s"$tpl nu xi omicron pi", "B"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.boilerplateClean(docs, col("doc_id"), col("text"),
        col("source"), spanTokens = 4, minDf = 2L)
      .orderBy("doc_id").collect()
    // src A docs lose the template (all occurrences — not keep-first)
    assert(out(0).getAs[String]("clean_text") === "alpha beta gamma delta")
    assert(out(1).getAs[String]("clean_text") === "epsilon zeta eta theta")
    assert(out(2).getAs[String]("clean_text") === "iota kappa lambda mu")
    assert(out.take(3).forall(r => r.getAs[Long]("kept_spans") === 1L &&
      r.getAs[Long]("total_spans") === 2L))
    // src B keeps it — df=1 within B
    assert(out(3).getAs[String]("clean_text") === s"$tpl nu xi omicron pi")
  }

  // ---- PageRank -----------------------------------------------------------

  test("pageRank: mass is conserved up to floor leakage and hubs outrank leaves") {
    // content c0 engaged by 3 users, c1 by exactly one
    val events = Seq(
      (1L, "c0"), (2L, "c0"), (3L, "c0"), (3L, "c1"))
      .toDF("user_id", "content_id")
    val out = Graph.pageRank(events, col("user_id"), col("content_id"), iters = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_micros")).toMap
    assert(out.size === 5) // 3 users + 2 contents
    val total = out.values.sum
    // Σ rank stays within floor-truncation leakage of N × 1e6
    assert(total <= 5000000L && total > 4000000L, s"total=$total")
    assert(out("c:c0") > out("c:c1"))
    // deterministic: second run bit-identical
    val again = Graph.pageRank(events, col("user_id"), col("content_id"), iters = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_micros")).toMap
    assert(again === out)
  }

  // ---- shuffle order ------------------------------------------------------

  test("shuffleOrder: emits an exact permutation, stable per seed, seed-sensitive") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val a = Selection.shuffleOrder(docs, col("doc_id"), seed = "s0",
      nBuckets = 16, docsPerShard = 100L).collect()
    assert(a.map(_.getAs[Long]("pos")).sorted.toSeq === (0L until 500L))
    assert(a.forall(r => r.getAs[Long]("shard") === r.getAs[Long]("pos") / 100L))
    val b = Selection.shuffleOrder(docs, col("doc_id"), seed = "s0",
      nBuckets = 16, docsPerShard = 100L).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      b.map(r => (r.getLong(0), r.getLong(1))).toSet)
    val c = Selection.shuffleOrder(docs, col("doc_id"), seed = "s1",
      nBuckets = 16, docsPerShard = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aMap = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 500L).count(i => aMap(i) != c(i)) > 400,
      "different seed should permute differently")
  }

  // ---- canonicalization ---------------------------------------------------

  test("canonicalize keeps exactly the highest-quality doc per component") {
    // quality ranks by token count here (longer ⇒ higher quality score
    // up to the 64-token knee); doc 2 is the longest of {1,2,3}
    val good = (1 to 40).map(i => s"the and of to in w$i").mkString(" ")
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, good),
      (3L, "the quick brown fox jumps"),
      (4L, "lone document here"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Components.canonicalize(docs, col("doc_id"), col("text"),
        pairs, col("doc_a"), col("doc_b"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("group_size"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(1L)._2 === 3L)
    assert(!out(1L)._3 && out(2L)._3 && !out(3L)._3)
    assert(out(4L)._3 && out(4L)._2 === 1L)
  }

  // ---- record linkage -----------------------------------------------------

  test("linkage: transitive phone->email closure merges A-B-C; junk blocks capped") {
    // A~B share a phone, B~C share an email; D..I all share the junk
    // phone '000' (block size 6 > cap 5 — must NOT link); J is isolated
    val recs = (Seq(
      (1L, Some("p1"), Some("e1")), (2L, Some("p1"), Some("e2")),
      (3L, Some("p3"), Some("e2"))) ++
      (4L to 9L).map(i => (i, Some("000"), Some(s"u$i"))) :+
      ((10L, None: Option[String], Some("e10"))))
      .toDF("rec_id", "phone", "email")
    val out = graft.ops.Linkage.resolve(recs, col("rec_id"),
        Seq(col("phone"), col("email")), maxBlock = 5)
      .collect().map(r => r.getAs[Long]("rec_id") ->
        ((r.getAs[Long]("entity"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("canonical")))).toMap
    assert(out.size === 10)
    assert(out(1L) === ((1L, 3L, true)))
    assert(out(2L) === ((1L, 3L, false)))
    assert(out(3L) === ((1L, 3L, false)))      // linked only transitively
    (4L to 9L).foreach(i => assert(out(i) === ((i, 1L, true)),
      s"junk block must not link record $i"))  // capped block
    assert(out(10L) === ((10L, 1L, true)))     // null phone never links
  }

  // ---- BPE merge learning -------------------------------------------------

  test("bpe: learns the most frequent pair first and applies merges greedily") {
    // "aaab" ×3, "ab" ×2 → char pairs: (a a)×6, (a b)×5, weighted by
    // word freq; first merge must be "a a" → "aa"
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab"))
      .toDF("doc_id", "text")
    val out = graft.ops.Bpe.learnMerges(docs, col("doc_id"), col("text"),
        nMerges = 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[String]("pair") === "a a")
    assert(out(0).getAs[String]("merged") === "aa")
    // freq-weighted: "aaab" has freq 2 ("aaab aaab" in doc1? no —
    // distinct words: aaab freq 3, ab freq 2; pairs in aaab = (a,a),
    // (a,a)? greedy list: a a, a a, a b → but VOCAB weighting counts
    // each occurrence once per word × freq: (a a)×2×3 + (a b)×1×3 +
    // (a b)×1×2 = a a:6, a b:5
    assert(out(0).getAs[Long]("cnt") === 6L)
    // after merge 1, aaab = "aa a b": pairs (aa a)×3, (a b)×3, (a b)
    // from ab ×2 → a b: 5 wins over aa a: 3
    assert(out(1).getAs[String]("pair") === "a b")
    assert(out(1).getAs[Long]("cnt") === 5L)
  }

  test("bpe: encode counts subword tokens under the learned merges") {
    // merges learned above: "a a"->"aa" then "a b"->"ab"; final reprs
    // aaab = "aa ab" (2 subtokens), ab = "ab" (1)
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab"))
      .toDF("doc_id", "text")
    val out = graft.ops.Bpe.encode(docs, col("doc_id"), col("text"),
        nMerges = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_words") === 3L)
    assert(out(0).getAs[Long]("n_bpe") === 5L)
    assert(out(1).getAs[Long]("n_words") === 2L)
    assert(out(1).getAs[Long]("n_bpe") === 3L)
  }

  test("bpe: local merge loop is byte-equal to the distributed loop") {
    // a corpus rich enough to exercise deep merge chains, count ties
    // (the pair-asc tie-break), and the consumed-separator replace
    // quirk ("a b a b" merges only once per pass)
    val docs = graft.ScaleData.docs(spark, n = 200, vocab = 40, tokens = 12)
    val nM = 12
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    val localM = graft.ops.Bpe.learnMerges(docs, col("doc_id"), col("text"),
      nMerges = nM).orderBy("rank").collect().map(key)
    val distM = graft.ops.Bpe.learnMerges(docs, col("doc_id"), col("text"),
      nMerges = nM, localVocabLimit = 0L).orderBy("rank").collect().map(key)
    assert(localM.toSeq === distM.toSeq)
    val localE = graft.ops.Bpe.encode(docs, col("doc_id"), col("text"),
      nMerges = nM).orderBy("doc_id").collect().map(key)
    val distE = graft.ops.Bpe.encode(docs, col("doc_id"), col("text"),
      nMerges = nM, localVocabLimit = 0L).orderBy("doc_id").collect().map(key)
    assert(localE.toSeq === distE.toSeq)
  }

  // ---- unigram-LM tokenizer -------------------------------------------------

  test("unigramTok: seed, one Viterbi-EM round, prune — hand-checked") {
    // words: abab ×3, ab ×2. Seed counts (overlapping, freq-weighted):
    // a=8, b=8, ab=8, ba=3, aba=3, bab=3, abab=3. seedSize=2 multi-char
    // picks ab (8) then aba (3, utf8-least of the tied four). One EM
    // round: Viterbi gives abab→[ab,ab] (aba's lower prob loses to
    // ab+ab... actually ab@p2 then ab@p4 beats aba+b) and ab→[ab], so
    // counts ab=8, chars floor to 1, aba dies at 0. Prune keeps both
    // chars + ab. lp over total 10: ab=ln(.8)µ=-223144, a=b=ln(.1)µ=
    // -2302585 (floor-half-up).
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab"))
      .toDF("doc_id", "text")
    val out = graft.ops.UnigramTok.trainPieces(docs, col("doc_id"),
        col("text"), maxPieceLen = 4, seedSize = 2, vocabSize = 4,
        emIters = 1)
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("a", 1L, -2302585L), ("ab", 8L, -223144L), ("b", 1L, -2302585L)))
  }

  test("unigramTok: encode counts Viterbi pieces per document") {
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab"))
      .toDF("doc_id", "text")
    val out = graft.ops.UnigramTok.encode(docs, col("doc_id"), col("text"),
        maxPieceLen = 4, seedSize = 2, vocabSize = 4, emIters = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_words") === 3L) // abab abab ab
    assert(out(0).getAs[Long]("n_pieces") === 5L) // [ab ab][ab ab][ab]
    assert(out(1).getAs[Long]("n_words") === 2L)
    assert(out(1).getAs[Long]("n_pieces") === 3L)
  }

  test("unigramTok: local EM loop is byte-equal to the distributed fallback") {
    // rich corpus: count ties (piece-asc tie-breaks in seed + prune),
    // Viterbi score ties (longer-piece tie-break), char coverage floor;
    // plus one all-whitespace doc — its empty token must be ignored
    // identically by both tiers (the distributed sequence(1,0) hazard)
    val docs = graft.ScaleData.docs(spark, n = 200, vocab = 40, tokens = 12)
      .unionByName(Seq((90001L, "   ")).toDF("doc_id", "text"))
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    def params = (4, 24, 30, 2) // K, seedSize, vocabSize, emIters
    val (k, ss, vs, em) = params
    val localT = graft.ops.UnigramTok.trainPieces(docs, col("doc_id"),
      col("text"), k, ss, vs, em).orderBy("piece").collect().map(key)
    val distT = graft.ops.UnigramTok.trainPieces(docs, col("doc_id"),
      col("text"), k, ss, vs, em, localVocabLimit = 0L)
      .orderBy("piece").collect().map(key)
    assert(localT.toSeq === distT.toSeq)
    val localE = graft.ops.UnigramTok.encode(docs, col("doc_id"),
      col("text"), k, ss, vs, em).orderBy("doc_id").collect().map(key)
    val distE = graft.ops.UnigramTok.encode(docs, col("doc_id"),
      col("text"), k, ss, vs, em, localVocabLimit = 0L)
      .orderBy("doc_id").collect().map(key)
    assert(localE.toSeq === distE.toSeq)
  }

  // ---- hard negatives -----------------------------------------------------

  test("knnClassify: majority label of the k nearest wins; label asc breaks ties") {
    // query 0 sits among three label-1 twins and two label-0 vectors
    // further away → k=3 picks the twins, prediction 1 (true label 0)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f), 1),
      (2L, Array(1f, 0f, 0f, 0f), 1),
      (3L, Array(0.99f, 0.14f, 0f, 0f), 1),
      (4L, Array(0f, 1f, 0f, 0f), 0),
      (5L, Array(0f, 0.9f, 0.1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.knnClassify(rows, col("vec_id"), col("embedding"),
        col("label"), isQuery = col("vec_id") === 0, k = 3, dim = 4,
        nPlanes = 2)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("query_id") === 0L)
    assert(r.getAs[Int]("true_label") === 0)
    assert(r.getAs[Int]("pred_label") === 1)
    assert(r.getAs[Long]("votes") >= 2L)
    assert(!r.getAs[Boolean]("correct"))
  }

  test("hardNegatives returns only label-mismatched neighbors, nearest first") {
    // q (label 0) has an identical twin with label 1 (the hardest
    // negative) and an identical twin with label 0 (must be excluded)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f), 1),   // hard negative — same direction
      (2L, Array(1f, 0f, 0f, 0f), 0),   // same label — excluded
      (3L, Array(0.9f, 0.1f, 0f, 0f), 1),
      (4L, Array(0f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegatives(rows, col("vec_id"), col("embedding"),
        col("label"), isQuery = col("vec_id") === 0, k = 3, dim = 4,
        nPlanes = 2)
      .orderBy("rk").collect()
    assert(out.forall(_.getAs[Int]("neg_label") === 1))
    assert(!out.map(_.getAs[Long]("vec_id")).contains(2L))
    assert(out.head.getAs[Long]("vec_id") === 1L) // identical vector ranks first
  }

  test("Profile.columns: nulls/distinct/minmax/top with canonical tie order") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (Some("b"), 2L),
      (Some("b"), 3L), (None, 3L), (Some("c"), 3L)
    ).toDF("s", "n")
    val out = graft.ops.Profile.columns(df, Seq("s", "n"), topK = 2)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val sCol = out("s")
    assert(sCol.getAs[Long]("n_rows") === 6L && sCol.getAs[Long]("n_nulls") === 1L)
    assert(sCol.getAs[Long]("n_distinct") === 3L)
    assert(sCol.getAs[String]("min_v") === "a" && sCol.getAs[String]("max_v") === "c")
    // a and b both count 2 → tie broken by value asc
    assert(sCol.getAs[String]("top_values") === "a:2,b:2")
    val nCol = out("n")
    assert(nCol.getAs[Long]("n_nulls") === 0L)
    assert(nCol.getAs[String]("top_values") === "3:3,2:2")
    // minCount floor drops singletons from the top list
    val floored = graft.ops.Profile.columns(df, Seq("s"), topK = 3, minCount = 2L)
      .collect().head.getAs[String]("top_values")
    assert(floored === "a:2,b:2")
  }
}
