package graft

import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Semantics of the conversation/SFT operators over the documents-
  * derived fixture (sf0.001) — branch behavior the hash gate proves
  * cross-engine but cannot NAME: which conv is a mirror of which,
  * which verdict a planted damage pattern earns, that near≠exact. */
class ConversationsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val turns =
    Queries.runners("q_conv_flatten")(spark, dir).cache()

  test("flatten: array position is turn order, roles follow the frame") {
    // even non-zero turns are assistant EXCEPT the tool class: turn 2
    // of conv%8==6 (base convs only — the +10000/+20000 mirror ranges
    // can never be ≡6 mod 8)
    val isToolSlot = col("turn_idx") === 2 && pmod(col("conv_id"), lit(8)) === 6
    val bad = turns.filter(
      (col("turn_idx") === 0 && col("role") =!= "system") ||
      (pmod(col("turn_idx"), lit(2)) === 1 && col("turn_idx") > 0 &&
        col("role") =!= "user") ||
      (pmod(col("turn_idx"), lit(2)) === 0 && col("turn_idx") > 0 &&
        col("role") =!= when(isToolSlot, "tool").otherwise("assistant"))).count()
    assert(bad === 0L)
    assert(turns.filter(col("role") === "tool").count() > 0L,
      "the tool-role class must be non-empty")
    // n_turns is consistent with the exploded cardinality
    val inconsistent = turns.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("c"), max(col("n_turns")).as("n"))
      .filter(col("c") =!= col("n")).count()
    assert(inconsistent === 0L)
    // base conversation lengths cycle 1..4 with conv_id % 4
    val wrongLen = turns.filter(col("conv_id") < 10000)
      .groupBy(col("conv_id")).agg(max(col("n_turns")).as("n"))
      .filter(col("n") =!= lit(1) + pmod(col("conv_id"), lit(4))).count()
    assert(wrongLen === 0L)
  }

  test("dedupExact collapses the case/whitespace mirror, not the suffix mirror") {
    val d = Queries.runners("q_conv_dedup")(spark, dir).cache()
    // every exact mirror (conv_of%8==5 → +20000) canonicalizes to its base
    val exactMirrors = d.filter(col("conv_id") >= 20000)
    assert(exactMirrors.count() > 0)
    assert(exactMirrors.filter(!col("is_dup") ||
      col("canon_id") =!= col("conv_id") - 20000).count() === 0L)
    // the near mirrors (+10000) are NOT exact dups — the suffix survives
    // normalization
    assert(d.filter(col("conv_id") >= 10000 && col("conv_id") < 20000 &&
      col("is_dup")).count() === 0L)
  }

  test("nearDupPairs finds the suffix mirror below J=1 and the exact mirror at J=1") {
    val pairs = Queries.runners("q_conv_dedup_near")(spark, dir).cache()
    val nearMirror = pairs.filter(col("conv_b") === col("conv_a") + 10000)
    assert(nearMirror.count() > 0)
    assert(nearMirror.filter(col("jaccard") >= 1.0).count() === 0L,
      "suffix mirrors must be NEAR duplicates, not exact")
    val exactMirror = pairs.filter(col("conv_b") === col("conv_a") + 20000)
    assert(exactMirror.count() > 0)
    assert(exactMirror.filter(col("jaccard") < 1.0).count() === 0L,
      "normalized case mirrors must verify at J=1")
  }

  test("gate verdicts: planted minority damage strips turns, half-damage drops the conversation") {
    val g = Queries.runners("q_conv_gate")(spark, dir)
      .filter(col("conv_id") < 10000).cache()
    // conv_of%8==3 (length 4, one short turn) → drop_turns, 3 kept
    val minority = g.filter(pmod(col("conv_id"), lit(8)) === 3)
    assert(minority.count() > 0)
    assert(minority.filter(col("verdict") =!= "drop_turns" ||
      col("n_kept") =!= col("n_turns") - col("n_fail")).count() === 0L)
    // conv_of%8==7 (length 4, two short turns) → drop_conv, nothing kept
    val half = g.filter(pmod(col("conv_id"), lit(8)) === 7)
    assert(half.count() > 0)
    assert(half.filter(col("verdict") =!= "drop_conv" ||
      col("n_kept") =!= 0).count() === 0L)
    // clean conversations keep everything
    val clean = g.filter(col("verdict") === "keep")
    assert(clean.count() > 0)
    assert(clean.filter(col("n_fail") =!= 0 ||
      col("n_kept") =!= col("n_turns")).count() === 0L)
  }

  test("templates: five planted templates collapse across case variants") {
    val t = Queries.runners("q_conv_template")(spark, dir).cache()
    assert(t.count() === 5L, "normalization must collapse case variants " +
      "to exactly the five planted templates")
    // each group holds both parities (mirrors ride along), so > 1 conv
    assert(t.filter(col("n_convs") < 2).count() === 0L)
  }

  test("clean applies the verdicts: drops, dense re-index, redaction") {
    val cleaned = Queries.runners("q_conv_clean")(spark, dir).cache()
    val g = Queries.runners("q_conv_gate")(spark, dir).cache()
    // drop_conv conversations are gone entirely
    val droppedConvs = g.filter(col("verdict") === "drop_conv")
      .select(col("conv_id"))
    assert(cleaned.join(droppedConvs, Seq("conv_id")).count() === 0L)
    // drop_turns conversations lost exactly n_fail turns
    val sizes = cleaned.groupBy(col("conv_id")).agg(
      count(lit(1)).as("kept"), max(col("turn_idx")).as("max_idx"))
    val j = sizes.join(g, Seq("conv_id"))
    assert(j.filter(col("kept") =!= col("n_kept")).count() === 0L)
    // indices re-packed densely from 0
    assert(j.filter(col("max_idx") =!= col("kept") - 1).count() === 0L)
    // PII is retained-and-REDACTED, never dropped: the conv_of%8==1
    // plant puts an email in an otherwise-clean (keep) conversation,
    // so redacted turns must actually EXIST in the output — without
    // this the redaction path would gate vacuously (PII turns used to
    // be gate-fails, which silently dropped every redactable row)
    assert(cleaned.filter(col("content")
      .rlike(graft.functions.TextFunctions.EmailRe)).count() === 0L)
    assert(cleaned.filter(col("content").contains("<EMAIL>")).count() > 0L)
    val piiConvs = g.filter(col("n_pii") > 0 && col("verdict") === "keep")
    assert(piiConvs.count() > 0L)
    assert(piiConvs.join(cleaned, Seq("conv_id"))
      .filter(col("content").contains("<EMAIL>")).count() > 0L)
  }

  test("fixture honors the hand-built-JSON escaping contract") {
    // the payload is concatenated, not escaped — sound only while no
    // content carries a quote or backslash (the fixture strips both
    // from document text and plants none). A testdata regeneration
    // that breaks this must fail HERE, not as an inscrutable
    // parse-null mismatch in the hash gate.
    val breaking = turns.filter(
      col("content").contains("\"") || col("content").contains("\\") ||
        col("content").rlike("[\\x00-\\x1f]")).count()
    assert(breaking === 0L)
    // and the parse really consumed every payload: a malformed JSON
    // row would surface as a null-role turn
    assert(turns.filter(col("role").isNull || col("content").isNull)
      .count() === 0L)
  }

  test("render: whitespace-token ledger and assistant-only loss flags") {
    val rendered = graft.ops.Conversations.render(
      graft.ops.Conversations.clean(turns)).cache()
    // the two marker tokens are whitespace-separated, so n_tok =
    // content tokens + 2 for every non-empty content (the fixture
    // plants none empty)
    val badTok = rendered.join(
        graft.ops.Conversations.clean(turns)
          .select(col("conv_id"), col("turn_idx"),
            graft.functions.TextFunctions.tokenCount(col("content"))
              .cast("long").as("ct")),
        Seq("conv_id", "turn_idx"))
      .filter(col("n_tok") =!= col("ct") + 2L).count()
    assert(badTok === 0L)
    val badLoss = rendered.filter(
      col("is_loss") =!= (col("role") === "assistant")).count()
    assert(badLoss === 0L)
  }

  test("packWithLossMask: the span ledger tiles every sequence exactly") {
    val rendered = graft.ops.Conversations.render(
      graft.ops.Conversations.clean(turns)).cache()
    val spans = graft.ops.Conversations.packWithLossMask(rendered,
      seqLen = 128).cache()
    // per-turn: span lengths reassemble the turn's full token count
    val badTurn = spans.groupBy(col("conv_id"), col("turn_idx"))
      .agg(sum(col("len")).as("s"))
      .join(rendered, Seq("conv_id", "turn_idx"))
      .filter(col("s") =!= col("n_tok")).count()
    assert(badTurn === 0L)
    // per-sequence: spans tile [0, fill) — start at 0, end at the
    // fill, total length equal to the covered extent (no gap/overlap)
    val seqs = spans.groupBy(col("seq_id")).agg(
      sum(col("len")).as("fill"), min(col("off_start")).as("mn"),
      max(col("off_start") + col("len")).as("mx")).cache()
    assert(seqs.filter(col("mn") =!= 0L || col("mx") =!= col("fill"))
      .count() === 0L)
    // every sequence but the last is filled to exactly seqLen
    val maxSeq = seqs.agg(max(col("seq_id"))).head.getLong(0)
    assert(seqs.filter(col("seq_id") < maxSeq && col("fill") =!= 128L)
      .count() === 0L)
    // per-sequence stats reconcile with the ledger
    val stats = graft.ops.Conversations.packedSeqStats(spans)
    assert(stats.filter(col("n_loss_tok") > col("n_tok")).count() === 0L)
    assert(stats.agg(sum(col("n_tok"))).head.getLong(0) ===
      rendered.agg(sum(col("n_tok"))).head.getLong(0))
  }

  test("tool turns are context: render masks them, gate fails strip, leaks strip — never drop the conversation") {
    import spark.implicits._
    val t = Seq(
      (1L, 0L, "system", "you are a helpful weather assistant for everyone"),
      (1L, 1L, "user", "please call the weather function for my city now"),
      (1L, 2L, "tool", "ok"), // structural fail: < 3 tokens
      (1L, 3L, "assistant", "the weather is sunny and warm all day today"),
      (2L, 0L, "system", "you are a helpful weather assistant for everyone"),
      (2L, 1L, "user", "an innocent question about tomorrow perhaps"),
      (2L, 2L, "tool", "alpha beta gamma delta epsilon zeta result"),
      (2L, 3L, "assistant", "based on that data tomorrow looks clear"))
      .toDF("conv_id", "turn_idx", "role", "content")
    // gate: a failing TOOL turn is a non-system fail → drop_turns
    // (strip-and-keep), exactly like a failing user turn
    val g = graft.ops.Conversations.gate(t).collect()
      .map(r => r.getAs[Long]("conv_id") -> r.getAs[String]("verdict")).toMap
    assert(g(1L) === "drop_turns")
    assert(g(2L) === "keep")
    // render: the tool marker is generic and the span is MASKED
    val rendered = graft.ops.Conversations.render(
      graft.ops.Conversations.clean(t))
    val toolRows = rendered.filter(col("role") === "tool").collect()
    assert(toolRows.nonEmpty)
    assert(toolRows.forall(r => !r.getAs[Boolean]("is_loss") &&
      r.getAs[String]("rendered").startsWith("<|tool|> ")))
    // decontaminate: a contaminated TOOL turn is a context leak →
    // drop_turns, never the assistant-leak drop_conv
    val eval = Seq("alpha beta gamma delta epsilon zeta").toDF("eval_text")
    val dec = graft.ops.Conversations.decontaminate(t, eval,
        col("eval_text"), n = 5).collect()
      .map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[String]("verdict"), r.getAs[Boolean]("asst_hit"))).toMap
    assert(dec(2L) === (("drop_turns", false)))
  }

  test("decontaminate: assistant leak drops the conversation, context leak strips") {
    import spark.implicits._
    val eval = Seq("alpha beta gamma delta epsilon zeta").toDF("eval_text")
    val t = Seq(
      (1L, 0L, "system", "you are helpful and wise"),
      (1L, 1L, "user", "tell me alpha beta gamma delta epsilon please"),
      (2L, 0L, "system", "you are helpful and wise"),
      (2L, 1L, "user", "an innocent question about the weather"),
      (2L, 2L, "assistant", "alpha beta gamma delta epsilon zeta is it"),
      (3L, 0L, "system", "you are helpful and wise"),
      (3L, 1L, "user", "an innocent question about the weather"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val out = graft.ops.Conversations.decontaminate(t, eval,
        col("eval_text"), n = 5)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[String]("verdict"), r.getAs[Boolean]("asst_hit"))).toMap
    assert(out(1L) === (("drop_turns", false)))
    assert(out(2L) === (("drop_conv", true)))
    assert(out(3L) === (("keep", false)))
  }
}
