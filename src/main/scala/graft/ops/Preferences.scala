package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Preference-pair curation — the RLHF/DPO modality a training-data
  * platform ships next to documents and SFT conversations: rows are
  * (pair_id, prompt, chosen, rejected) and the curation questions are
  * pair-shaped, not document-shaped:
  *
  *  1. [[gate]] — per-pair verdicts. A pair is useless when its two
  *     responses are the SAME exchange (`drop_degenerate`:
  *     normalized-equal chosen/rejected — a zero-margin pair teaches a
  *     DPO loss nothing) or when either side is structurally unusable
  *     (`drop_invalid`: under the shared length/quality floors —
  *     [[Conversations.turnFails]], the ONE fail spec both modalities
  *     gate on). Redactable PII is FLAGGED per side, never a drop —
  *     [[toSftTurns]] redacts in place, the conversation-clean
  *     discipline.
  *  2. [[promptDedup]] — prompt-level exact dedup (normalized prompt,
  *     min-pair_id canonical): repeated prompts concentrate gradient
  *     weight on one exchange and leak across train/eval splits, the
  *     standard DPO-dataset hygiene cut.
  *  3. [[margins]] — the quality MARGIN ledger for kept pairs:
  *     exact-integer quality basis points per side (the corpus-wide
  *     floor-4 heuristic), their difference, and the rejected/chosen
  *     length ratio — the columns a curation pass filters on
  *     (near-zero or NEGATIVE margins flag label noise: the "chosen"
  *     response scores worse than the rejected one).
  *  4. [[toSftTurns]] — the kept, deduplicated pairs re-expressed as
  *     two-turn conversations (user prompt → assistant chosen, PII
  *     redacted), so the preference stream feeds the EXISTING SFT
  *     assembly: [[Conversations.render]] → loss-mask packing — one
  *     ledger discipline across modalities.
  *
  * Scale: every operator is per-row projection + map-side-combined
  * hash aggregates; promptDedup's canonical join is corpus-side on
  * the prompt-hash (never broadcast — prompt groups are
  * corpus-derived); margins/toSftTurns filter through pair_id-keyed
  * SEMI-joins against the verdict/dedup sets (slim id columns, the
  * key the pair table would be bucketed by at warehouse scale).
  * Fixture: [[fixture]] derives pairs
  * deterministically from `documents`, planting every verdict class,
  * a PII side, prompt duplicates, and a negative-margin pair; the
  * DuckDB oracles rebuild the pair relation independently.
  */
object Preferences {

  // ------------------------------------------------------------ gate

  /** The [[gate]] verdict as a Column over (chosen, rejected) — the
    * ONE spec both the batch gate and the streaming ingest annotate
    * with (pure projection, so reuse is drift-free and join-free). */
  private[graft] def verdictExpr: Column =
    when(TextFunctions.normText(col("chosen")) ===
        TextFunctions.normText(col("rejected")), "drop_degenerate")
      .when(Conversations.turnFails(col("chosen")) ||
        Conversations.turnFails(col("rejected")), "drop_invalid")
      .otherwise("keep")

  /** Pair verdicts — see object doc. Output: (pair_id, verdict,
    * pii_chosen, pii_rejected). */
  def gate(pairs: DataFrame): DataFrame =
    pairs.select(col("pair_id"), verdictExpr.as("verdict"),
      Conversations.piiHit(col("chosen")).as("pii_chosen"),
      Conversations.piiHit(col("rejected")).as("pii_rejected"))

  /** The pair relation with the [[gate]] columns APPENDED (the
    * streaming ingest's shape — all input columns ride along). */
  private[graft] def withGate(pairs: DataFrame): DataFrame =
    pairs.withColumn("verdict", verdictExpr)
      .withColumn("pii_chosen", Conversations.piiHit(col("chosen")))
      .withColumn("pii_rejected", Conversations.piiHit(col("rejected")))

  // ----------------------------------------------------- prompt dedup

  /** Prompt-level exact dedup over the normalized prompt. Output:
    * (pair_id, canon_id, is_dup). */
  def promptDedup(pairs: DataFrame): DataFrame = {
    val keyed = pairs.select(col("pair_id"),
      md5(TextFunctions.normText(col("prompt"))).as("k"))
    val canon = keyed.groupBy(col("k")).agg(min(col("pair_id")).as("canon_id"))
    keyed.join(Joins.corpusSide(canon), Seq("k"))
      .select(col("pair_id"), col("canon_id"),
        (col("pair_id") =!= col("canon_id")).as("is_dup"))
  }

  // ------------------------------------------------ response near-dup

  /** Near-duplicate CHOSEN responses ACROSS pairs — the common
    * synthetic-preference failure [[promptDedup]] cannot see: two
    * pairs with different prompts but near-identical chosen responses
    * still concentrate gradient weight on one exchange (and leak
    * one response across splits). The normalized chosen text rides
    * [[graft.dedup.MinHash]]'s banded LSH path verbatim (signatures →
    * capped band join → exact-Jaccard verify — no new join shape, the
    * conversation near-dup precedent), so the 100 TB posture is
    * inherited: never all-pairs, skew-capped buckets. Pair-level
    * verdict: `pair_b` (the LATER pair_id) is the eviction side, the
    * repo-wide min-id-canonical discipline. Output: (pair_a, pair_b,
    * jaccard). */
  def nearDupPairs(pairs: DataFrame,
      cfg: graft.dedup.MinHash.Config = graft.dedup.MinHash.Config()): DataFrame =
    graft.dedup.MinHash.verifiedPairs(pairs, col("pair_id"), col("chosen"), cfg)
      .select(col("doc_a").as("pair_a"), col("doc_b").as("pair_b"),
        col("jaccard"))

  // ---------------------------------------------------------- margins

  /** Quality in exact basis points (the corpus floor-4 heuristic
    * scaled by 10^4 — the ×1e4+0.5 floor re-lands the integer the
    * floor-4 rounding produced, identically on both engines). */
  private def qualityBp(c: Column): Column =
    floor(TextFunctions.qualityScore(c) * lit(10000.0) + lit(0.5)).cast("long")

  /** Margin ledger for pairs KEPT by [[gate]]: per-side quality bp,
    * margin (chosen − rejected; negative ⇒ suspected label noise),
    * and the rejected/chosen token-length ratio in bp. */
  def margins(pairs: DataFrame): DataFrame = {
    val kept = pairs.join(
      gate(pairs).filter(col("verdict") === "keep").select(col("pair_id")),
      Seq("pair_id"), "left_semi")
    kept.select(col("pair_id"),
      qualityBp(col("chosen")).as("q_chosen_bp"),
      qualityBp(col("rejected")).as("q_rejected_bp"),
      (qualityBp(col("chosen")) - qualityBp(col("rejected"))).as("margin_bp"),
      floor(TextFunctions.tokenCount(col("rejected")).cast("double")
          * lit(10000.0)
          / TextFunctions.tokenCount(col("chosen")).cast("double"))
        .cast("long").as("len_ratio_bp"))
  }

  // ------------------------------------------------------ SFT bridge

  /** Kept ∧ non-duplicate pairs as two-turn conversations
    * (conv_id = pair_id; turn 0 user = prompt, turn 1 assistant =
    * chosen, both PII-redacted) — [[Conversations.render]]'s input
    * shape, so preference data rides the same render → loss-mask-pack
    * assembly as SFT conversations. */
  def toSftTurns(pairs: DataFrame): DataFrame = {
    val keep = gate(pairs).filter(col("verdict") === "keep")
      .select(col("pair_id"))
    val fresh = promptDedup(pairs).filter(!col("is_dup"))
      .select(col("pair_id"))
    pairs.join(keep, Seq("pair_id"), "left_semi")
      .join(fresh, Seq("pair_id"), "left_semi")
      .select(col("pair_id").as("conv_id"), explode(array(
        struct(lit(0L).as("turn_idx"), lit("user").as("role"),
          TextFunctions.redactPii(col("prompt")).as("content")),
        struct(lit(1L).as("turn_idx"), lit("assistant").as("role"),
          TextFunctions.redactPii(col("chosen")).as("content")))).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
  }

  // ----------------------------------------------------------- fixture

  /** Deterministic preference-pair fixture from `documents` (both
    * engines rebuild it op-for-op; `ct` is the quote/backslash-
    * stripped text, toks its whitespace tokens):
    *  - prompt: a pure function of prompt_of = (pair_id − 1 when
    *    pair_id % 8 == 5 else pair_id) — so every 8th pair DUPLICATES
    *    its predecessor's prompt (the [[promptDedup]] class);
    *  - chosen: toks[1..40]; pair_id % 8 == 6 appends a planted email
    *    (the PII-kept class); pair_id % 8 == 4 is 'ok' (chosen fails
    *    the floors → drop_invalid AND, when rejected survives, the
    *    negative-margin shape lives in the near-miss: % 8 == 0 keeps
    *    a SHORT chosen slice vs a full rejected — margin can go
    *    negative while both sides pass);
    *  - rejected: % 8 == 1 → 'ok' (drop_invalid), % 8 == 2 → chosen
    *    verbatim and % 8 == 3 → upper-cased double-spaced chosen
    *    (both drop_degenerate — byte-compare would miss the second),
    *    % 8 == 0 → toks[1..40] (longer than the short chosen),
    *    else toks[5..44];
    *  - NEAR-response mirror: % 8 == 7 pairs re-emitted at pair_id +
    *    100000 with a FRESH prompt (so promptDedup can't see them —
    *    exactly the hole [[nearDupPairs]] exists to close) and a
    *    4-token suffix on chosen — near but not exact, the
    *    conversation fixture's suffix-mirror discipline.
    * Output: (pair_id, prompt, chosen, rejected). */
  def fixture(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val base = docs.select(id.cast("long").as("pair_id"),
      TextFunctions.tokens(regexp_replace(text, "[\"\\\\]", "")).as("toks"))
    val m8 = pmod(col("pair_id"), lit(8L))
    val promptOf = when(m8 === 5, col("pair_id") - 1).otherwise(col("pair_id"))
    val staged = base.select(col("pair_id"), col("toks"), m8.as("m8"),
      concat(lit("please explain the meaning and context of item "),
        promptOf.cast("string"), lit(" in two short sentences")).as("prompt"),
      when(m8 === 4, lit("ok"))
        .when(m8 === 0, array_join(slice(col("toks"), 1, 12), " "))
        .otherwise(array_join(slice(col("toks"), 1, 40), " ")).as("chosen0"))
    val basePairs = staged.select(col("pair_id"), col("prompt"),
      when(col("m8") === 6,
        concat(col("chosen0"), lit(" contact agent"),
          col("pair_id").cast("string"), lit("@mail.example.com now")))
        .otherwise(col("chosen0")).as("chosen"),
      when(col("m8") === 1, lit("ok"))
        .when(col("m8") === 2, col("chosen0"))
        .when(col("m8") === 3,
          upper(regexp_replace(col("chosen0"), " ", "  ")))
        .when(col("m8") === 0, array_join(slice(col("toks"), 1, 40), " "))
        .otherwise(array_join(slice(col("toks"), 5, 40), " ")).as("rejected"))
    val mirror = basePairs.filter(pmod(col("pair_id"), lit(8L)) === 7)
      .select((col("pair_id") + 100000L).as("pair_id"),
        concat(lit("please explain the meaning and context of item "),
          (col("pair_id") + 100000L).cast("string"),
          lit(" in two short sentences")).as("prompt"),
        concat(col("chosen"), lit(" extra trailing marker tokens"))
          .as("chosen"),
        col("rejected"))
    basePairs.unionByName(mirror)
  }

  // ------------------------------------------------- DuckDB oracles

  /** Fixture CTEs over `$src` — ends with `${p}pairs(pair_id, prompt,
    * chosen, rejected)`, rebuilt independently of the engine. */
  def fixtureCtes(src: String = "documents", p: String = ""): String =
    raw"""${p}pdocs AS (SELECT doc_id AS pair_id, doc_id % 8 AS m8, regexp_split_to_array(trim(regexp_replace(text, '["\\]', '', 'g')), '\s+') AS toks FROM $src),
${p}pstage AS (SELECT pair_id, m8, toks,
  'please explain the meaning and context of item ' || CAST(CASE WHEN m8 = 5 THEN pair_id - 1 ELSE pair_id END AS VARCHAR) || ' in two short sentences' AS prompt,
  CASE WHEN m8 = 4 THEN 'ok' WHEN m8 = 0 THEN array_to_string(toks[1:12], ' ') ELSE array_to_string(toks[1:40], ' ') END AS chosen0 FROM ${p}pdocs),
${p}pairs0 AS (SELECT pair_id, prompt,
  CASE WHEN m8 = 6 THEN chosen0 || ' contact agent' || CAST(pair_id AS VARCHAR) || '@mail.example.com now' ELSE chosen0 END AS chosen,
  CASE WHEN m8 = 1 THEN 'ok' WHEN m8 = 2 THEN chosen0 WHEN m8 = 3 THEN upper(regexp_replace(chosen0, ' ', '  ', 'g')) WHEN m8 = 0 THEN array_to_string(toks[1:40], ' ') ELSE array_to_string(toks[5:44], ' ') END AS rejected
 FROM ${p}pstage),
${p}pairs AS (SELECT pair_id, prompt, chosen, rejected FROM ${p}pairs0
 UNION ALL SELECT pair_id + 100000,
  'please explain the meaning and context of item ' || CAST(pair_id + 100000 AS VARCHAR) || ' in two short sentences',
  chosen || ' extra trailing marker tokens', rejected
 FROM ${p}pairs0 WHERE pair_id % 8 = 7)"""

  /** Oracle for [[gate]] ∘ [[fixture]]. */
  def gateOracleSql(src: String = "documents"): String =
    s"""WITH ${fixtureCtes(src)}
SELECT pair_id,
 CASE WHEN ${Conversations.normSql("chosen")} = ${Conversations.normSql("rejected")} THEN 'drop_degenerate'
      WHEN ${Conversations.turnFailsSql("chosen")} OR ${Conversations.turnFailsSql("rejected")} THEN 'drop_invalid'
      ELSE 'keep' END AS verdict,
 ${Conversations.piiHitSql("chosen")} AS pii_chosen,
 ${Conversations.piiHitSql("rejected")} AS pii_rejected
FROM pairs"""

  /** Oracle for [[promptDedup]] ∘ [[fixture]]. */
  def promptDedupOracleSql(src: String = "documents"): String =
    s"""WITH ${fixtureCtes(src)},
keyed AS (SELECT pair_id, md5(${Conversations.normSql("prompt")}) AS k FROM pairs)
SELECT pair_id, min(pair_id) OVER (PARTITION BY k) AS canon_id,
 pair_id <> min(pair_id) OVER (PARTITION BY k) AS is_dup
FROM keyed"""

  /** Oracle for [[nearDupPairs]] over the gate-KEPT fixture pairs —
    * the registered pipeline order: near-dup only matters for pairs
    * that survive the gate (and the drop_invalid `ok` plants would
    * otherwise form a degenerate identical-text clique). */
  def nearDupOracleSql(src: String = "documents",
      cfg: graft.dedup.MinHash.Config = graft.dedup.MinHash.Config()): String = {
    val pre = s"""${fixtureCtes(src)},
ptext AS (SELECT pair_id AS doc_id, chosen AS text FROM pairs WHERE $keepPredSql)"""
    s"""${graft.dedup.MinHash.oracleCtes(cfg, src = "ptext", pre = pre)}
SELECT doc_a AS pair_a, doc_b AS pair_b, jaccard FROM verified WHERE jaccard >= ${cfg.threshold}"""
  }

  /** DuckDB quality in basis points (mirrors [[qualityBp]]). */
  private def qualityBpSql(c: String): String = {
    val stopPat = TextFunctions.langStopwords.toMap.apply("en")
    val n = raw"CAST(len(regexp_split_to_array(trim($c), '\s+')) AS DOUBLE)"
    val nt = s"greatest($n, 1.0)"
    val pu = s"CAST(len(regexp_extract_all($c, '[.,;:!?]')) AS DOUBLE)"
    val st = s"CAST(len(regexp_extract_all(lower($c), '$stopPat')) AS DOUBLE)"
    val q4 = s"floor((0.5 * least(1.0, $n/64.0) + 0.3 * (1.0 - least(1.0, $pu/$nt)) + 0.2 * least(1.0, 4.0*$st/$nt)) * 10000.0 + 0.5) / 10000.0"
    s"CAST(floor(($q4) * 10000.0 + 0.5) AS BIGINT)"
  }

  /** The [[gate]] keep predicate as SQL (shared by the margins and
    * SFT-bridge oracles so the three gates can't drift). */
  private def keepPredSql: String =
    s"""NOT (${Conversations.normSql("chosen")} = ${Conversations.normSql("rejected")}) AND NOT (${Conversations.turnFailsSql("chosen")} OR ${Conversations.turnFailsSql("rejected")})"""

  /** Oracle for [[margins]] ∘ [[fixture]]. */
  def marginsOracleSql(src: String = "documents"): String = {
    val tc = (c: String) =>
      raw"CAST(len(regexp_split_to_array(trim($c), '\s+')) AS DOUBLE)"
    s"""WITH ${fixtureCtes(src)}
SELECT pair_id, ${qualityBpSql("chosen")} AS q_chosen_bp,
 ${qualityBpSql("rejected")} AS q_rejected_bp,
 ${qualityBpSql("chosen")} - ${qualityBpSql("rejected")} AS margin_bp,
 CAST(floor(${tc("rejected")} * 10000.0 / ${tc("chosen")}) AS BIGINT) AS len_ratio_bp
FROM pairs WHERE $keepPredSql"""
  }

  /** Verdict-blind prompt-canonical CTE over `pairs` (appends to
    * [[fixtureCtes]]; ends with `dk(pair_id)` — the pairs whose
    * pair_id is the min of their normalized-prompt group). Under
    * pair_id-monotone arrival this is exactly the set the streaming
    * ingest lands as prompt-NEW, dropped verdicts included (keeping
    * dropped pairs in the registry is what makes the streamed dedup
    * equal the batch [[promptDedup]]). */
  private def canonicalCte: String =
    s"""dk AS (SELECT pair_id FROM (SELECT pair_id, min(pair_id) OVER (PARTITION BY md5(${Conversations.normSql("prompt")})) AS canon_id FROM pairs) WHERE pair_id = canon_id)"""

  /** ONE batch oracle for the streamed preference flow
    * (q_pref_pipeline_stream): the landed margin ledger = [[margins]]
    * over gate-kept ∧ prompt-canonical pairs — every predicate the
    * batch gates already use, so the streaming decomposition must be
    * invisible in the result. */
  def pipelineStreamOracleSql(src: String = "documents"): String = {
    val tc = (c: String) =>
      raw"CAST(len(regexp_split_to_array(trim($c), '\s+')) AS DOUBLE)"
    s"""WITH ${fixtureCtes(src)},
$canonicalCte
SELECT pair_id, ${qualityBpSql("chosen")} AS q_chosen_bp,
 ${qualityBpSql("rejected")} AS q_rejected_bp,
 ${qualityBpSql("chosen")} - ${qualityBpSql("rejected")} AS margin_bp,
 CAST(floor(${tc("rejected")} * 10000.0 / ${tc("chosen")}) AS BIGINT) AS len_ratio_bp
FROM pairs JOIN dk USING (pair_id) WHERE $keepPredSql"""
  }

  /** Batch replay of the preference ingest's MONITOR MV
    * (q_pref_monitor_stream): per-batch additive counters — pairs in,
    * gate-kept, prompt-new landed, negative margins among landed kept,
    * PII-flagged kept — each re-derived by assigning pairs to their
    * arrival batch (`lo1`/`lo2` boundaries; valid under pair_id-
    * monotone arrival). */
  def monitorStreamOracleSql(lo1: Long, lo2: Long,
      src: String = "documents"): String = {
    def b(c: String) =
      s"CASE WHEN $c < $lo1 THEN 0 WHEN $c < $lo2 THEN 1 ELSE 2 END"
    s"""WITH ${fixtureCtes(src)},
$canonicalCte,
m1 AS (SELECT ${b("pair_id")} AS batch_id, CAST(count(*) AS BIGINT) AS n_in FROM pairs GROUP BY 1),
m2 AS (SELECT ${b("pair_id")} AS batch_id, CAST(count(*) AS BIGINT) AS n_keep FROM pairs WHERE $keepPredSql GROUP BY 1),
m3 AS (SELECT ${b("pair_id")} AS batch_id, CAST(count(*) AS BIGINT) AS n_fresh FROM dk GROUP BY 1),
m4 AS (SELECT ${b("pair_id")} AS batch_id, CAST(count(*) AS BIGINT) AS n_margin_neg FROM pairs JOIN dk USING (pair_id) WHERE ($keepPredSql) AND ${qualityBpSql("chosen")} - ${qualityBpSql("rejected")} < 0 GROUP BY 1),
m5 AS (SELECT ${b("pair_id")} AS batch_id, CAST(count(*) AS BIGINT) AS n_pii_kept FROM pairs WHERE ($keepPredSql) AND (${Conversations.piiHitSql("chosen")} OR ${Conversations.piiHitSql("rejected")}) GROUP BY 1)
SELECT m1.batch_id, m1.n_in, CAST(coalesce(m2.n_keep, 0) AS BIGINT) AS n_keep, CAST(coalesce(m3.n_fresh, 0) AS BIGINT) AS n_fresh, CAST(coalesce(m4.n_margin_neg, 0) AS BIGINT) AS n_margin_neg, CAST(coalesce(m5.n_pii_kept, 0) AS BIGINT) AS n_pii_kept
FROM m1 LEFT JOIN m2 USING (batch_id) LEFT JOIN m3 USING (batch_id) LEFT JOIN m4 USING (batch_id) LEFT JOIN m5 USING (batch_id)"""
  }

  /** Oracle for [[Conversations.packWithLossMask]] ∘ [[render]] ∘
    * [[toSftTurns]] ∘ [[fixture]] — the preference stream through the
    * SFT assembly, one placement spec end to end. */
  def toSftPackOracleSql(seqLen: Long, src: String = "documents"): String = {
    val redacted = (c: String) =>
      s"""regexp_replace(regexp_replace(regexp_replace($c, '${TextFunctions.EmailRe}', '<EMAIL>', 'g'), '${TextFunctions.Ipv4Re}', '<IP>', 'g'), '${TextFunctions.PhoneRe}', '<PHONE>', 'g')"""
    s"""WITH ${fixtureCtes(src)},
gk AS (SELECT pair_id FROM pairs WHERE $keepPredSql),
dk AS (SELECT pair_id FROM (SELECT pair_id, min(pair_id) OVER (PARTITION BY md5(${Conversations.normSql("prompt")})) AS canon_id FROM pairs) WHERE pair_id = canon_id),
pfcclean AS (SELECT p.pair_id AS conv_id, u.turn_idx, u.role,
  CASE u.turn_idx WHEN 0 THEN ${redacted("p.prompt")} ELSE ${redacted("p.chosen")} END AS content
 FROM pairs p JOIN gk USING (pair_id) JOIN dk USING (pair_id),
 (SELECT 0 AS turn_idx, 'user' AS role UNION ALL SELECT 1, 'assistant') u),
${Conversations.renderCtes("pf")},
${Conversations.packSpanCtes(seqLen, "pf")}
SELECT seq_id, conv_id, turn_idx, is_loss, off_start, len FROM pfcspan"""
  }
}
