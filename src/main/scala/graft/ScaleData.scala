package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic inputs for the scale-evidence probes —
  * GENERATED (spark.range + hash arithmetic), never stored, so the
  * same code probes 20k docs in a unit test and 10M docs in
  * [[ScaleProbe]] with zero fixture weight. Row content is a pure
  * function of the row id: re-running any scale reproduces byte-equal
  * inputs.
  */
object ScaleData {

  /** Document corpus with planted near-dup structure: ids with
    * id % 5 == 1 share their predecessor's token stream (family size 2,
    * 20% dup rate — families stay BOUNDED as n grows, the property that
    * keeps candidate-pair volume linear), with a unique tail token so
    * family pairs are near- not byte-identical. ~`tokens` words each
    * from a `vocab`-word vocabulary via hash-mod. */
  def docs(spark: SparkSession, n: Long, vocab: Int = 500,
      tokens: Int = 60, uniqueTail: Boolean = true): DataFrame = {
    val seed = when(pmod(col("id"), lit(5)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val base = (0 until tokens).map { j =>
      concat(lit("w"),
        pmod(hash(seed * lit(7919L) + lit(j)), lit(vocab)).cast("string"))
    }
    // uniqueTail=false keeps the VOCABULARY bounded by `vocab` as n
    // grows — the input contract for vocab-sized algorithms (BPE's
    // Heaps-law assumption); true (default) plants the per-doc unique
    // token the near-dup probes need
    val words =
      if (uniqueTail) base :+ concat(lit("t"), col("id").cast("string"))
      else base
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
  }

  /** Entity-resolution records with REALISTIC KEY SKEW: planted small
    * link structure (every 3rd record shares its predecessor-pair's
    * phone, every 5th an email) plus JUNK mega-keys — 1-in-100 records
    * share one default phone and 1-in-97 one placeholder email, so a
    * junk block grows ∝ n and an uncapped blocker would self-join it
    * into n²/10⁴ pairs. The probe's invariant is that
    * [[graft.ops.Linkage.resolve]]'s `maxBlock` cap holds: pair volume
    * (and therefore shuffle) stays linear because the mega-blocks are
    * dropped, exactly the standard-ER junk-key rule. */
  def linkageRecords(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("rec_id"),
      when(pmod(col("id"), lit(100)) === 0, lit("p_default"))
        .otherwise(concat(lit("p"), (col("id") - pmod(col("id"), lit(3)))
          .cast("string"))).as("phone"),
      when(pmod(col("id"), lit(97)) === 0, lit("e_placeholder"))
        .otherwise(concat(lit("e"), (col("id") - pmod(col("id"), lit(5)))
          .cast("string"))).as("email"))

  /** Document corpus with a NATURAL (Zipf-ish) token frequency shape:
    * per position, a 1-in-5 chance of a hot stopword (32-word head,
    * huge df) and otherwise a word from a vocabulary PROPORTIONAL to
    * the corpus (Heaps' law — df stays O(1) as n grows). Same planted
    * 20% near-dup families as [[docs]]. This is the contract input for
    * frequency-ordered algorithms (prefix filtering, stop-shingle
    * caps): their posting-list bounds assume rare tokens exist, which
    * the uniform-vocab [[docs]] generator deliberately violates. */
  def docsZipf(spark: SparkSession, n: Long, tokens: Int = 60): DataFrame = {
    val seed = when(pmod(col("id"), lit(5)) === 1, col("id") - 1)
      .otherwise(col("id"))
    // vocabulary ∝ total tail-token DRAWS (n docs × ~4/5 of `tokens`),
    // giving df ≈ 1 per tail word — sizing it to n alone leaves df ≈
    // `tokens`, whose posting lists blow the candidate join up ~50×
    // (caught live: 28 GB of spill at 200k docs)
    val tailVocab = greatest(lit(100L), lit(n * tokens))
    val words = (0 until tokens).map { j =>
      val h = hash(seed * lit(7919L) + lit(j))
      when(pmod(h, lit(5)) === 0,
        concat(lit("s"), pmod(h, lit(32)).cast("string")))
        .otherwise(concat(lit("w"),
          // 64-bit draw: a 32-bit hash would saturate at ~2^31 distinct
          // values, so for n·tokens > 2^31 (~35M docs at tokens=60) the
          // df≈1 Heaps-law contract would silently degrade — df would
          // grow with n again and the prefix-filter probe's posting-list
          // bound with it
          pmod(xxhash64(h), tailVocab).cast("string")))
    } :+ concat(lit("t"), col("id").cast("string"))
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
  }

  /** Raw SFT conversations as (conv_id, payload-JSON) — the wire
    * shape [[graft.ops.Conversations.flatten]] parses, so the rung
    * measures the real parse. Turn counts cycle 1..4 (avg 2.5); roles
    * follow the fixture frame (system / user / assistant); each turn
    * carries ~24 hash-vocab words, and 1-in-16 turns degrade to a
    * planted under-length fail (`ok`) so the gate/clean filter paths
    * do real work at scale. With `hotWidth > 0`, conversations with
    * conv_id < hotWidth become 8-turn × 96-word monsters (~13× the
    * average conversation's tokens, ~5× its turn rows) — aim hotWidth
    * at [[graft.ops.Conversations.packWithLossMask]]'s bucketWidth and
    * they ALL land in the pack's FIRST bucket: the hot-bucket
    * adversary. Contents are quote/backslash-free by construction
    * (the hand-built-JSON contract the fixture also honors). */
  def convPayloads(spark: SparkSession, n: Long, vocab: Int = 500,
      hotWidth: Long = 0L): DataFrame = {
    val isHot = col("id") < lit(hotWidth)
    def turnJson(j: Int): org.apache.spark.sql.Column = {
      val role = if (j == 0) "system" else if (j % 2 == 1) "user" else "assistant"
      val nWords = when(isHot, lit(96)).otherwise(lit(24))
      val words = array_join(transform(sequence(lit(1), nWords),
        w => concat(lit("w"), pmod(hash(col("id") * lit(7919L) +
          lit(j.toLong * 131L) + w), lit(vocab)).cast("string"))), " ")
      val content = when(
        pmod(hash(col("id") * lit(13L) + lit(j)), lit(16)) === 0, lit("ok"))
        .otherwise(words)
      concat(lit(s"""{"role":"$role","content":""""), content, lit("\"}"))
    }
    val nTurns = when(isHot, lit(8L))
      .otherwise(lit(1L) + pmod(col("id"), lit(4L)))
    spark.range(n).select(col("id").as("conv_id"),
      concat(lit("["),
        array_join(slice(array((0 until 8).map(turnJson): _*),
          lit(1), nTurns.cast("int")), ","),
        lit("]")).as("payload"))
  }

  /** Event stream over `users` users: monotone timestamps, four event
    * types hash-assigned — the funnel/rollup workload shape. */
  def events(spark: SparkSession, n: Long, users: Long): DataFrame =
    spark.range(n).select(
      pmod(col("id"), lit(users)).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * lit(7919L)).as("ts"),
      element_at(typedLit(Seq("view", "click", "purchase", "other")),
        (pmod(hash(col("id")), lit(4)) + 1).cast("int")).as("event_type"))

  /** Float embeddings in [-1, 1]^dim via hash-mod — uniform cloud (no
    * planted clusters: probe cost is governed by corpus size and
    * centroid count, not geometry). */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map { j =>
        ((pmod(hash(col("id") * lit(31L) + lit(j)), lit(2001)) - lit(1000))
          .cast("float") / lit(1000.0f))
      }: _*).as("embedding"))

  /** Embedding cloud with PLANTED nearest-neighbor structure — ground
    * truth BY CONSTRUCTION, so recall@k is measurable at any scale
    * without an O(N·Q) brute-force oracle pass:
    *  - ids < nQueries are query vectors (the same uniform components
    *    as [[embeddings]]);
    *  - ids in [nQueries, nQueries·(1+kPlanted)) are planted
    *    neighbors: neighbor id's query is (id − nQueries) % nQueries,
    *    its vector the query's plus eps-scaled uniform noise. At
    *    eps = 0.15 over dim 64 the planted cosine is ≈ 0.99 while the
    *    max background cosine stays ≈ 0.65 even at millions of rows
    *    (background cosines concentrate at ±1/√dim), so each query's
    *    EXACT top-kPlanted is precisely its planted set — asserted by
    *    the ann_recall_brute rung reading 10000 bp;
    *  - all other ids are the uniform background cloud.
    * Everything is hash-derived: recall values are deterministic per
    * (n, dim, nQueries, kPlanted), so floors can be asserted in CI. */
  def plantedEmbeddings(spark: SparkSession, n: Long, dim: Int = 64,
      nQueries: Int = 100, kPlanted: Int = 10, eps: Float = 0.15f): DataFrame = {
    val q = nQueries.toLong
    val planted = q * (1 + kPlanted)
    require(n > 2 * planted, s"need n > ${2 * planted} for a real background")
    val isNbr = col("id") >= q && col("id") < planted
    val seed = when(isNbr, pmod(col("id") - q, lit(q))).otherwise(col("id"))
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map { j =>
        val base = (pmod(hash(seed * lit(31L) + lit(j)), lit(2001)) - lit(1000))
          .cast("float") / lit(1000.0f)
        val noise = (pmod(hash(col("id") * lit(127L) + lit(j)), lit(2001))
          - lit(1000)).cast("float") / lit(1000.0f) * lit(eps)
        (base + when(isNbr, noise).otherwise(lit(0.0f))).cast("float")
      }: _*).as("embedding"))
  }
}
