package graft

import org.apache.spark.sql.functions._

import graft.ops.Preferences

/** Semantics of the preference-pair (RLHF/DPO) operators on hand
  * fixtures — branch behavior the hash gate proves cross-engine but
  * cannot NAME: which pair is degenerate (and that normalization, not
  * byte equality, decides it), which margin goes negative, what the
  * SFT bridge includes and redacts. */
class PreferencesSpec extends SparkSpec {

  import spark.implicits._

  private val prompt = "please explain how the data pipeline works today"
  private val good = "the pipeline reads the raw events and then cleans " +
    "and joins them with the dimensions before it lands the result"
  private val alt = "a different answer that describes the storage layer " +
    "and the way the files are compacted for the readers every day"
  private val short = "the pipeline reads the raw events and then stops"

  private def pairs(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("pair_id", "prompt", "chosen", "rejected")

  test("gate: normalization decides degeneracy; floors decide validity; PII only flags") {
    val out = Preferences.gate(pairs(
      (1L, prompt, good, alt),                                   // keep
      (2L, prompt, good, good),                                  // byte-equal
      (3L, prompt, good, good.toUpperCase.replace(" ", "  ")),   // norm-equal
      (4L, prompt, good, "ok"),                                  // rejected fails
      (5L, prompt, "ok", alt),                                   // chosen fails
      (6L, prompt, good + " mail me at a@b.example.com", alt)))  // PII, kept
      .collect().map(r => r.getAs[Long]("pair_id") ->
        (r.getAs[String]("verdict"), r.getAs[Boolean]("pii_chosen"),
          r.getAs[Boolean]("pii_rejected"))).toMap
    assert(out(1L) === (("keep", false, false)))
    assert(out(2L)._1 === "drop_degenerate")
    assert(out(3L)._1 === "drop_degenerate",
      "case/whitespace variants must be degenerate — byte-compare misses this")
    assert(out(4L)._1 === "drop_invalid")
    assert(out(5L)._1 === "drop_invalid")
    assert(out(6L) === (("keep", true, false)),
      "redactable PII must flag, never drop")
  }

  test("margins: a shorter chosen scores a NEGATIVE margin (the label-noise signal)") {
    val out = Preferences.margins(pairs(
      (1L, prompt, good, short),   // chosen longer → positive margin
      (2L, prompt, short, good)))  // chosen shorter → negative margin
      .collect().map(r => r.getAs[Long]("pair_id") ->
        (r.getAs[Long]("margin_bp"), r.getAs[Long]("len_ratio_bp"))).toMap
    assert(out(1L)._1 > 0L && out(2L)._1 < 0L)
    assert(out(1L)._1 === -out(2L)._1, "swapped sides must negate the margin")
    assert(out(1L)._2 < 10000L && out(2L)._2 > 10000L,
      "length ratio is rejected/chosen in basis points")
  }

  test("promptDedup: min pair_id canonicalizes the normalized prompt group") {
    val out = Preferences.promptDedup(pairs(
      (3L, prompt, good, alt),
      (7L, prompt.toUpperCase, good, alt),   // norm-equal prompt
      (9L, "something else entirely to ask", good, alt)))
      .collect().map(r => r.getAs[Long]("pair_id") ->
        (r.getAs[Long]("canon_id"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(3L) === ((3L, false)))
    assert(out(7L) === ((3L, true)))
    assert(out(9L) === ((9L, false)))
  }

  test("toSftTurns: kept ∧ non-dup pairs only, two redacted turns each") {
    val out = Preferences.toSftTurns(pairs(
      (1L, prompt, good + " mail me at a@b.example.com", alt), // kept, PII
      (2L, prompt.toUpperCase, good, alt),                     // prompt dup of 1
      (3L, prompt + " again", good, good),                     // degenerate
      (4L, "another prompt to use here", alt, good)))          // kept
      .orderBy("conv_id", "turn_idx").collect()
    assert(out.map(_.getAs[Long]("conv_id")).toSet === Set(1L, 4L))
    assert(out.length === 4, "exactly two turns per bridged pair")
    val t = out.map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"),
      r.getAs[String]("role"), r.getAs[String]("content")))
    assert(t(0)._3 === "user" && t(1)._3 === "assistant")
    assert(t(1)._4.contains("<EMAIL>") && !t(1)._4.contains("example.com"),
      "the assistant turn must carry the REDACTED chosen response")
  }
}
