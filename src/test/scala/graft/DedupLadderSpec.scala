package graft

import org.apache.spark.sql.functions._

import graft.dedup.{MinHash, NgramJaccard, SimHash}

/** Cross-operator invariants of the near-dup ladder. */
class DedupLadderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)

  test("minhash-verified pairs ⊆ exact n-gram jaccard pairs at the same threshold") {
    val cfg = MinHash.Config() // threshold 0.7, shingle 3 — same shingles
    val lsh = MinHash.verifiedPairs(docs, col("doc_id"), col("text"), cfg)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = NgramJaccard.pairs(docs, col("doc_id"), col("text"),
        n = cfg.shingleSize, threshold = cfg.threshold)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact),
      s"LSH found pairs exact disagrees with: ${lsh -- exact}")
    // and at jaccard ~0.97+ (the planted near-dups) recall should be high
    val recall = lsh.size.toDouble / exact.size
    assert(recall > 0.8, s"recall=$recall over ${exact.size} exact pairs")
  }

  test("band-bucket cap defuses a planted identical-doc cluster, keeps real pairs") {
    import spark.implicits._
    val clusterText = "the same exact document repeated verbatim in every crawl snapshot"
    val planted =
      (0L until 300L).map(i => (i, clusterText)) ++ // 300-way identical cluster
      Seq(
        (1000L, "a genuinely near duplicate pair of documents differing in one tail token alpha"),
        (1001L, "a genuinely near duplicate pair of documents differing in one tail token beta"),
        (2000L, "an entirely unrelated singleton document about something else altogether"))
    val df = planted.toDF("doc_id", "text")
    val cfg = MinHash.Config(maxBandBucket = 256)
    val sigs = MinHash.signatures(df, col("doc_id"), col("text"), cfg)
    // the cap reports the oversized buckets (one per band for the cluster)
    val over = MinHash.oversizedBuckets(sigs, cfg).collect()
    assert(over.nonEmpty && over.forall(_.getLong(2) == 300L), over.mkString(","))
    // candidate volume stays O(n): the 300-way cluster (≈45k raw pairs)
    // degrades to a 299-pair star on doc 0; the genuine pair survives
    val cands = MinHash.candidatePairs(sigs, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.size < 400, s"cap failed: ${cands.size} candidates")
    assert(cands.contains((1000L, 1001L)), s"real pair lost: $cands")
    // star connectivity: every cluster member still pairs with the hub
    assert((1L until 300L).forall(i => cands.contains((0L, i))),
      s"star broken: ${(1L until 300L).filterNot(i => cands.contains((0L, i))).take(5)}")
    // and uncapped, the cluster would have exploded — the guard is live
    val raw = MinHash.candidatePairs(sigs, cfg.copy(maxBandBucket = 100000))
    assert(raw.count() > 40000L)
  }

  test("star degradation keeps a >cap NEAR-identical family in one dup group") {
    import spark.implicits._
    // 40 docs sharing a long common body but each with a unique tail
    // token — NOT byte-identical, so exact dedup cannot collapse them;
    // with the cap at 8 every band bucket is oversized. The star must
    // keep the family connected end-to-end through dupGroups.
    val body = (0 until 30).map(k => s"boilerplate$k").mkString(" ")
    val fam = (0L until 40L).map(i => (i, s"$body unique$i"))
    val df = (fam :+ ((500L, "totally different text about some other topic entirely")))
      .toDF("doc_id", "text")
    val cfg = MinHash.Config(maxBandBucket = 8, threshold = 0.6)
    val pairs = MinHash.verifiedPairs(df, col("doc_id"), col("text"), cfg)
    val groups = graft.dedup.Components.dupGroups(
      df, col("doc_id"), pairs, col("doc_a"), col("doc_b"))
    val comps = groups.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    assert((0L until 40L).forall(comps(_) == 0L),
      s"family split: ${comps.filter(_._1 < 40).values.toSet}")
    assert(comps(500L) === 500L) // singleton untouched
  }

  test("xx hash family finds the same high-similarity pairs as md5") {
    val md5Pairs = MinHash.verifiedPairs(docs, col("doc_id"), col("text"),
        MinHash.Config(hashFamily = "md5"))
      .filter(col("jaccard") >= 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xxPairs = MinHash.verifiedPairs(docs, col("doc_id"), col("text"),
        MinHash.Config(hashFamily = "xx"))
      .filter(col("jaccard") >= 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // different hash families, same banding math: near-identical pairs
    // should be caught by both (banding probability ≈ 1 at j ≥ 0.95)
    assert(md5Pairs.nonEmpty && xxPairs.nonEmpty)
    assert((md5Pairs intersect xxPairs).size.toDouble / md5Pairs.size > 0.9)
  }

  test("LSH embedding pairs ⊆ exact cosine pairs, recall >= 0.9") {
    val emb = Tables.embeddings(spark, dir)
    val lsh = graft.similarity.Ann.lshCosinePairs(emb, col("vec_id"),
        col("embedding"), threshold = 0.45, dim = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.similarity.Ann.cosinePairs(emb, col("vec_id"),
        col("embedding"), threshold = 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact), s"LSH emitted non-exact pairs: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall over ${exact.size} exact pairs")
  }

  test("semDedup drops ⊆ exact cosine near-dup set; kept+dropped = corpus") {
    val emb = Tables.embeddings(spark, dir)
    val sem = graft.similarity.Ann.semDedup(emb, col("vec_id"),
        col("embedding"), threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val n = emb.count()
    assert(sem.length == n, "every corpus vector gets a verdict")
    val droppedIds = sem.filter(!_._2).map(_._1).toSet
    assert(droppedIds.nonEmpty)
    // every dropped vector is the HIGHER id of some exact near-dup pair
    // (the cluster restriction can only shrink the pair set)
    val exactHigher = graft.similarity.Ann.cosinePairs(emb, col("vec_id"),
        col("embedding"), threshold = 0.45)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(droppedIds.subsetOf(exactHigher),
      s"semDedup dropped non-near-dup ids: ${droppedIds -- exactHigher}")
  }

  test("ngram stop-shingle cap: planted hot shingle is dropped, true pair survives") {
    import spark.implicits._
    // 60 docs sharing one ultra-frequent shingle ("the quick brown");
    // tails are unique except docs 0 and 1, which are identical — the
    // one true near-dup pair.
    val rows = (0 until 60).map { i =>
      val tailOf = if (i == 1) 0 else i
      val tail = (0 until 25).map(k => s"tok${tailOf}x$k").mkString(" ")
      (i.toLong, s"the quick brown $tail")
    }
    val docs = rows.toDF("doc_id", "text")
    val hot = NgramJaccard.stopShingles(docs, col("doc_id"), col("text"),
      n = 3, maxShingleFreq = 20).as[String].collect()
    assert(hot.toSeq === Seq("the quick brown"))
    val capped = NgramJaccard.pairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.8, maxShingleFreq = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
    assert(capped.head._3 >= 0.9) // (s-1)/(s+1): only 1 shingle lost evidence
    // exact (uncapped) run agrees on the pair set for this corpus
    val exact = NgramJaccard.pairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.8, maxShingleFreq = 0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((0L, 1L)))
  }

  test("ngram hot-set overflow switches to the anti-join path with identical results") {
    import spark.implicits._
    // template-heavy corpus: a 5-token shared boilerplate prefix makes
    // THREE hot shingles, so with maxHotSetSize = 2 the driver-collect
    // InSet path must NOT run — the distributed anti-join takes over.
    // Both paths must produce byte-identical pair sets.
    val rows = (0 until 60).map { i =>
      val tailOf = if (i == 1) 0 else i
      val tail = (0 until 25).map(k => s"tok${tailOf}x$k").mkString(" ")
      (i.toLong, s"aa bb cc dd ee $tail")
    }
    val docs = rows.toDF("doc_id", "text")
    val hotCount = NgramJaccard.stopShingles(docs, col("doc_id"), col("text"),
      n = 3, maxShingleFreq = 20).count()
    assert(hotCount === 3L) // "aa bb cc", "bb cc dd", "cc dd ee"
    def run(maxHotSetSize: Int) =
      NgramJaccard.pairs(docs, col("doc_id"), col("text"),
          n = 3, threshold = 0.8, maxShingleFreq = 20, maxHotSetSize = maxHotSetSize)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaAntiJoin = run(maxHotSetSize = 2)   // 3 > 2 → fallback
    val viaInSet = run(maxHotSetSize = 10000)  // 3 <= 10000 → fast path
    assert(viaAntiJoin === viaInSet)
    assert(viaAntiJoin.map(p => (p._1, p._2)) === Set((0L, 1L)))
  }

  test("fuzzy dedup suffix block catches head-edited pairs the prefix block misses") {
    import spark.implicits._
    val body = (0 until 30).map(k => s"word$k").mkString(" ")
    val planted = Seq(
      (0L, s"aaaa $body"),                     // head-edited near-dup pair:
      (1L, s"ZZZZ $body"),                     //   4 edits, all in char 1-4,
                                               //   so the 12-char prefix
                                               //   blocks disagree
      (2L, s"shared prefix block here $body tail0"), // tail-edited pair: the
      (3L, s"shared prefix block here $body tail1"), //   classic prefix case
      (4L, "an unrelated singleton about nothing in particular at all")
    ).toDF("doc_id", "text")
    val got = graft.dedup.EditDistance.pairs(planted, col("doc_id"), col("text"),
        maxDist = 16, blockChars = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0,1) is ONLY reachable via the suffix block; (2,3) via the prefix
    assert(got === Set((0L, 1L), (2L, 3L)))
    // and each candidate pair is emitted exactly once even when both
    // blocks match (byte-identical docs share prefix AND suffix)
    val twins = Seq((10L, body), (11L, body)).toDF("doc_id", "text")
    val twinPairs = graft.dedup.EditDistance.pairs(twins, col("doc_id"), col("text"))
      .collect()
    assert(twinPairs.length === 1 && twinPairs.head.getInt(2) === 0)
  }

  test("corpus ops: hash split is deterministic with sane proportions") {
    val split = docs.select(col("doc_id"),
      graft.ops.Corpus.splitAssign(col("doc_id")).as("split"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9, counts.toString)
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    // deterministic: re-evaluation assigns identically
    val a = split.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = docs.select(col("doc_id"),
        graft.ops.Corpus.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("corpus ops: concat-chunk packing is gapless and span-consistent") {
    val packed = graft.ops.Corpus.concatChunk(docs, col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")),
        seqLen = 512, bucketSize = 100)
      .orderBy("doc_id").collect()
    assert(packed.nonEmpty)
    // contiguous stream: each doc starts where the previous ended
    packed.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start_tok") ===
          a.getAs[Long]("start_tok") + a.getAs[Long]("n_tok"))
      case _ =>
    }
    assert(packed.head.getAs[Long]("start_tok") === 0L)
    // spans: first <= last, n_seqs matches, and a doc shorter than
    // seqLen covers at most 2 sequences
    packed.foreach { r =>
      val (first, last, n, nTok) = (r.getAs[Long]("first_seq"),
        r.getAs[Long]("last_seq"), r.getAs[Long]("n_seqs"), r.getAs[Long]("n_tok"))
      assert(first <= last && n === last - first + 1)
      if (nTok <= 512) assert(n <= 2, r.toString)
    }
  }

  test("simhash near-pairs have genuinely small hamming distance, symmetric") {
    val pairs = SimHash.pairs(docs, col("doc_id"), col("text"), maxHamming = 3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 3))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1))) // canonical order
  }

  test("prefix-join is LOSSLESS: equals brute-force distinct-token jaccard") {
    // exact-recall invariant of prefix filtering (the property that makes
    // it the exact-at-scale rung): every brute-force pair at the
    // threshold must be found, with the identical jaccard value
    val got = graft.dedup.PrefixJoin.pairs(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sets = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = sets(a).size + sets(b).size - inter
      if uni > 0 && inter * 5 >= uni * 4 // jaccard >= 4/5, integer-exact
    } yield ((a, b), inter.toDouble / uni)).toMap
    assert(brute.nonEmpty, "fixture has no qualifying pairs — test is vacuous")
    assert(got.keySet == brute.keySet,
      s"missed=${(brute.keySet -- got.keySet).take(5)} extra=${(got.keySet -- brute.keySet).take(5)}")
    got.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-12, s"$k") }
  }

  test("prefix-join losslessness on adversarial set shapes (planted)") {
    import spark.implicits._
    // shapes that break naive prefix math: tiny sets (prefix len 1),
    // identical sets, sets failing only the length filter, off-by-one
    // at the ceil boundary (|a|=4,|b|=5 jaccard 4/5 exactly)
    val planted = Seq(
      (1L, "x y z w"),            // 4 tokens
      (2L, "x y z w v"),          // superset: jaccard 4/5 — boundary pair
      (3L, "x y z w v"),          // identical to 2 — jaccard 1
      (4L, "a"), (5L, "a"),       // singleton identical sets
      (6L, "a b c d e f g h i j"),
      (7L, "a b c d e f g h k l"),// 8/12 = 0.67 — must NOT appear
      (8L, "p q"), (9L, "p r")    // 1/3 — must NOT appear
    ).toDF("doc_id", "text")
    val got = graft.dedup.PrefixJoin.pairs(planted, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)), got.toString)
  }
}
