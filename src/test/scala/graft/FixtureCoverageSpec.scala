package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Fixture-CLASS coverage as CI — the institutionalized form of the
  * round-10/11 audits. The cross-engine hash gate proves engine ==
  * oracle on whatever rows the fixture populates; it is structurally
  * BLIND to a fixture that populates zero rows of a semantic branch
  * (both sides agree on the empty set — the r10 polygon fixture never
  * gated an "inside" point, the r11 radius-wrap fixture never gated a
  * seam-crossing pair). This spec is the table the audits kept
  * rediscovering by hand: for every gated query with semantic
  * branches, each branch class must be NON-EMPTY at BOTH gate SFs
  * (sf0.001 and sf0.01), so the next fixture edit or testdata
  * regeneration that silently empties a class fails `sbt test`
  * instead of waiting for a human to notice the gate got weaker.
  *
  * Adding a geo/sampling/sequence query with semantic branches? Add a
  * row here naming each branch and how to count it from the REGISTERED
  * query's own output (or its exact fixture rebuild — keep any rebuild
  * expression textually identical to the registration). */
class FixtureCoverageSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def run(name: String, dir: String): DataFrame =
    Queries.runners(name)(spark, dir)

  /** (label, dir => className -> populatedCount); every class must
    * come back >= 1 at every gate SF. */
  private lazy val table: Seq[(String, String => Map[String, Long])] = Seq(

    // point-in-polygon + polygon-with-hole, all classes from ONE pass
    // per query: both verdicts of the outer-only query, both verdicts
    // with the hole ring, and the in-hole class (inside the OUTER ring
    // but outside the rings — even crossings; without it the hole
    // ring's edges are dead weight the gate never checks). Counts are
    // explicit filter().count() — a groupBy-derived map would simply
    // LACK the key for an empty class and pass vacuously, the exact
    // r10 escape this spec exists to fail on.
    "q_point_in_polygon(+holes)" -> { dir =>
      val outer = run("q_point_in_polygon", dir)
        .select(col("pid"), col("inside").as("in_outer"))
      val holes = run("q_point_in_polygon_holes", dir)
        .select(col("pid"), col("inside").as("in_rings"))
      val j = outer.join(holes, "pid").localCheckpoint()
      Map(
        "outer_inside" -> j.filter(col("in_outer")).count(),
        "outer_outside" -> j.filter(!col("in_outer")).count(),
        "rings_inside" -> j.filter(col("in_rings")).count(),
        "rings_outside" -> j.filter(!col("in_rings")).count(),
        "in_hole" -> j.filter(col("in_outer") && !col("in_rings")).count())
    },

    // metric radius join: at least one pair within radius AND at least
    // one point pairing with nothing — a fixture dense enough to pair
    // everything (or sparse enough to pair nothing) stops gating the
    // <= radius refine in one direction.
    "q_geo_radius_join" -> { dir =>
      val pairs = run("q_geo_radius_join", dir)
      val pts = Tables.events(spark, dir)
        .filter(pmod(col("user_id"), lit(37)) === 0)
        .select(col("event_id")).distinct()
      val pairedIds = pairs.select(col("id_a").as("event_id"))
        .union(pairs.select(col("id_b").as("event_id"))).distinct()
      Map(
        "paired" -> pairs.count(),
        "unpaired" -> pts.join(pairedIds, Seq("event_id"), "left_anti").count())
    },

    // wrap/polar radius join: the r11 escape classes — seam-crossing
    // pairs (the frame-B rotation path), polar-cap pairs (the 1-D
    // lat-band path), and plain mid-zone pairs must ALL be gated.
    // Coordinate rebuild textually mirrors the registration.
    "q_geo_radius_wrap" -> { dir =>
      val lr = round((pmod(col("event_id"), lit(120)).cast("double") / 10
        + 174) * 1e6, 0).cast("long")
      val pts = Tables.events(spark, dir)
        .filter(pmod(col("event_id"), lit(7)) === 0)
        .select(col("event_id"),
          when(lr >= 180000000L, lr - 360000000L).otherwise(lr).as("x"),
          round((pmod(col("event_id") * 7, lit(1700)).cast("double") / 10
            - 85) * 1e6, 0).cast("long").as("y"))
      val classed = run("q_geo_radius_wrap", dir)
        .join(pts.select(col("event_id").as("id_a"), col("x").as("xa"),
          col("y").as("ya")), Seq("id_a"))
        .join(pts.select(col("event_id").as("id_b"), col("x").as("xb"),
          col("y").as("yb")), Seq("id_b"))
        .select(
          (greatest(abs(col("ya")), abs(col("yb"))) > 66000000L).as("cap"),
          (abs(col("xa") - col("xb")) > 180000000L).as("seam"))
        .groupBy(col("cap"), col("seam")).count()
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
        .toMap
      Map(
        "seam" -> classed.collect { case ((false, true), n) => n }.sum,
        "cap" -> classed.filter(_._1._1).values.sum,
        "plain" -> classed.getOrElse((false, false), 0L))
    },

    // SAMPLE k/n OFFSET: all four hash-domain slices must carry rows
    // (and users) — a degenerate key domain could park everything in
    // one slice and the other three would gate empty aggregates.
    "q_sample_offset" -> { dir =>
      val rows = run("q_sample_offset", dir).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // enumerate the EXPECTED slices — a missing output row must read
      // as an empty class, not as an absent (vacuously passing) key
      (0 until 4).flatMap { i =>
        val (ev, us) = rows.getOrElse(i, (0L, 0L))
        Seq(s"slice${i}_events" -> ev, s"slice${i}_users" -> us)
      }.toMap
    },

    // windowFunnel: every step level must be reached AND conversion
    // must be partial — if nobody chains to step 3 the chaining logic
    // gates nothing, and if EVERYBODY does, the window/order breakers
    // gate nothing either.
    "q_funnel" -> { dir =>
      val steps = run("q_funnel", dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Map(
        "step1" -> steps.getOrElse(1L, 0L),
        "step2" -> steps.getOrElse(2L, 0L),
        "step3" -> steps.getOrElse(3L, 0L),
        "partial_conversion" ->
          math.max(steps.getOrElse(1L, 0L) - steps.getOrElse(3L, 0L), 0L))
    },

    // WITH FILL INTERPOLATE: all three row kinds must be gated —
    // observed rows, interior gap rows (the prev+Δ·g recurrence), and
    // pre-first rows (the type-default-0 rule). The first cut of this
    // fixture (value > 0.8 against a [0.03, 327] value range) gated
    // 150 observed / 0 gaps / 0 pre-first — this spec's raison d'être.
    "q_gap_fill_interpolate" -> { dir =>
      val out = run("q_gap_fill_interpolate", dir)
      Map(
        "observed" -> out.filter(col("observed")).count(),
        "gap" -> out.filter(!col("observed") && col("v_carry") =!= 0L).count(),
        "pre_first" -> out.filter(!col("observed") && col("v_carry") === 0L
          && col("v_linstep") === 0L).count(),
        // the Δ-rule must DIVERGE from carry-forward on some gap row
        // (prev + Δ·g ≠ prev), else the linear recurrence is gated
        // only where it degenerates to the Δ=0 case
        "delta_rule_discriminates" -> out.filter(!col("observed") &&
          col("v_carry") =!= 0L && col("v_linstep") =!= col("v_carry"))
          .count())
    },

    // LIMIT WITH TIES: some group must EXTEND past n on a boundary tie
    // (else the >= filter degenerates to plain LIMIT) and some group
    // must return exactly n (else ties are so dense the boundary rule
    // gates nothing). First cut (floor(value·10), ~3276 buckets) had
    // zero extended groups at both SFs.
    "q_limit_with_ties" -> { dir =>
      val sizes = run("q_limit_with_ties", dir)
        .groupBy(col("user_id")).count()
      Map(
        "ties_extend" -> sizes.filter(col("count") > 3).count(),
        "exact_n" -> sizes.filter(col("count") === 3).count())
    },

    // range_hashed dictionary: every version must be chosen somewhere,
    // some probe must sit in an OVERLAP (two covering ranges — the
    // max-start rule actually discriminating), and some probe must
    // miss to the default. Rebuild mirrors the registration.
    "q_dict_range" -> { dir =>
      val out = run("q_dict_range", dir)
      val facts = Tables.events(spark, dir).select(
        (pmod(col("event_id"), lit(50)) + 1).cast("long").as("fk"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("fd"))
      val dim = facts.select(col("fk").as("k")).distinct()
        .select(col("k"), explode(array(lit(0), lit(1), lit(2))).as("ver"))
        .withColumn("rs", lit(19720L) + pmod(col("k"), lit(5)) +
          when(col("ver") === 2, 20).otherwise(col("ver") * 7))
        .withColumn("re", col("rs") + when(col("ver") === 2, 5).otherwise(9))
      val overlapped = facts.join(dim,
          col("fk") === col("k") && col("fd") >= col("rs") &&
            col("fd") <= col("re"))
        .groupBy(col("fk"), col("fd")).count()
        .filter(col("count") >= 2).count()
      Map(
        "v0" -> out.filter(col("rv").startsWith("v0-")).count(),
        "v1" -> out.filter(col("rv").startsWith("v1-")).count(),
        "v2" -> out.filter(col("rv").startsWith("v2-")).count(),
        "default" -> out.filter(col("rv") === "none").count(),
        "overlap_probes" -> overlapped)
    },

    // sequence packing: both placement classes must be gated —
    // interior docs (whole doc inside one sequence) and boundary-
    // crossing docs (n_seqs > 1, the fragmentation arithmetic).
    "q_pack_sequences" -> { dir =>
      val out = run("q_pack_sequences", dir)
      Map(
        "interior" -> out.filter(col("n_seqs") === 1).count(),
        "crossing" -> out.filter(col("n_seqs") > 1).count(),
        "nonzero_offset" -> out.filter(col("off_first") > 0).count())
    },

    // epoch planning: the budget must force multi-epoch strata
    // (n_epochs >= 1), genuinely fractional tails (0 < frac_bp <
    // 10000), and — in the applied form — docs drawing the extra
    // fractional copy AND docs not drawing it, else the hash-cut rule
    // gates nothing.
    "q_epoch_plan" -> { dir =>
      val plan = run("q_epoch_plan", dir)
      val applied = run("q_epoch_apply", dir)
        .groupBy(col("doc_id"), col("stratum"))
        .agg(max(col("n_copies")).as("nc"), max(col("epoch_idx")).as("mx"))
      val extras = applied
        .join(plan.select(col("stratum"), col("n_epochs")), Seq("stratum"))
      Map(
        "multi_epoch" -> plan.filter(col("n_epochs") >= 1).count(),
        "fractional" -> plan.filter(col("frac_bp") > 0 && col("frac_bp") < 10000).count(),
        "drew_extra" -> extras.filter(col("nc") === col("n_epochs") + 1).count(),
        "no_extra" -> extras.filter(col("nc") === col("n_epochs")
          && col("n_epochs") >= 1).count(),
        "epoch_indices_dense" ->
          applied.filter(col("mx") === col("nc") - 1).count())
    },

    // curriculum shards: every bucket and every shard must carry docs
    // (a degenerate quality distribution could empty interior deciles
    // and gate the cut arithmetic against nothing).
    "q_curriculum_shards" -> { dir =>
      val out = run("q_curriculum_shards", dir)
      val buckets = out.groupBy(col("bucket")).count().count()
      val shards = out.groupBy(col("shard")).count().count()
      Map("buckets_populated" -> (if (buckets >= 5) 1L else 0L),
        "shards_populated" -> (if (shards == 4) 1L else 0L))
    },

    // decontamination: both verdicts must be gated — contaminated docs
    // (n-gram hits against the eval set) AND clean docs; an eval set
    // overlapping everything (or nothing) gates only one branch of the
    // overlap join.
    "q_decontaminate" -> { dir =>
      val out = run("q_decontaminate", dir)
      Map(
        "contaminated" -> out.filter(col("n_hit") >= 1).count(),
        "clean" -> out.filter(col("n_hit") === 0).count())
    },

    // ASOF join: probes with a version at-or-before them AND probes
    // before any version (the left-join miss branch) — plus at least
    // one probe that skipped a NEWER version to take an older one
    // (the actual as-of discrimination; equality-only fixtures can't
    // see a wrong inequality direction).
    "q_asof_join" -> { dir =>
      val out = run("q_asof_join", dir)
      val discriminating = out.filter(col("version_ts").isNotNull &&
        col("version_ts") < col("ts_str")).count()
      Map(
        "matched" -> out.filter(col("price_asof").isNotNull).count(),
        "missed" -> out.filter(col("price_asof").isNull).count(),
        "strictly_before" -> discriminating)
    },

    // t-digest: the fixture centers value at 0 precisely so BOTH sign
    // branches of the signed grid carry weight — and within each sign
    // BOTH grid regimes must be gated: the exact region (|v| < 2^m,
    // idx = v verbatim — no log arithmetic runs) and the log-bucket
    // region (|idx| >= 2^m, the msb/shift encode-decode pair). A
    // fixture whose magnitudes all clear 2^m would never gate the
    // exact-region identity branch, and vice versa.
    "q_quantile_tdigest" -> { dir =>
      val base = 1L << 8 // m = 8, the registration's grid
      val st = graft.ops.TDigest.sketch(Tables.events(spark, dir),
        round((col("value") - 0.5) * 1e3, 0).cast("long"))
      Map(
        "neg_exact" -> st.filter(col("idx") < 0 && col("idx") > -base).count(),
        "neg_log" -> st.filter(col("idx") <= -base).count(),
        "pos_exact" -> st.filter(col("idx") > 0 && col("idx") < base).count(),
        "pos_log" -> st.filter(col("idx") >= base).count())
    },

    // conversation fixture: every semantic class the q_conv_* gates
    // discriminate on must be populated — single- vs multi-turn
    // conversations (flatten's n_turns arithmetic), all three gate
    // verdicts (a fixture with no drop_conv never gates the
    // half-damage rule), the exact-dup mirror (normText collapse),
    // the near-but-not-exact mirror (J < 1 through the banded path),
    // and template groups actually spanning case variants.
    "q_conv_*" -> { dir =>
      val turns = run("q_conv_flatten", dir).localCheckpoint()
      val convs = turns.groupBy(col("conv_id"))
        .agg(max(col("n_turns")).as("n"))
      val gate = run("q_conv_gate", dir).localCheckpoint()
      val dedup = run("q_conv_dedup", dir)
      val near = run("q_conv_dedup_near", dir).localCheckpoint()
      val tmpl = run("q_conv_template", dir)
      val cleaned = run("q_conv_clean", dir)
      Map(
        "single_turn" -> convs.filter(col("n") === 1).count(),
        "multi_turn" -> convs.filter(col("n") > 1).count(),
        "verdict_keep" -> gate.filter(col("verdict") === "keep").count(),
        "verdict_drop_turns" ->
          gate.filter(col("verdict") === "drop_turns").count(),
        "verdict_drop_conv" ->
          gate.filter(col("verdict") === "drop_conv").count(),
        // PII must exist in a KEPT conversation (so clean's redaction
        // actually rewrites retained rows, not only dropped ones)
        "pii_in_kept_conv" -> gate.filter(col("n_pii") > 0 &&
          col("verdict") === "keep").count(),
        "pii_redacted_retained" ->
          cleaned.filter(col("content").contains("<EMAIL>")).count(),
        "exact_dup" -> dedup.filter(col("is_dup")).count(),
        "near_not_exact" -> near.filter(col("jaccard") < 1.0).count(),
        "near_exact" -> near.filter(col("jaccard") >= 1.0).count(),
        "template_collapsed" -> tmpl.filter(col("n_convs") >= 2).count(),
        // tool-role class (round 15): tool turns exist, SURVIVE clean
        // (so downstream render/pack actually see the role), and the
        // conv_of ≡ 6 (mod 40) decontamination plant lands a
        // tool-only leak that STRIPS rather than drops
        "tool_turns" -> turns.filter(col("role") === "tool").count(),
        "tool_turns_retained" ->
          cleaned.filter(col("role") === "tool").count(),
        "tool_leak_strips" -> run("q_conv_decont", dir)
          .filter(pmod(col("conv_id"), lit(40)) === 6 &&
            col("n_hit_turns") > 0 && col("verdict") === "drop_turns")
          .count())
    },

    // SFT training assembly (round 14): the loss-mask pack must carry
    // both mask polarities (assistant spans train, system/user spans
    // don't — a fixture with only one polarity never gates the mask),
    // at least one TURN split across sequences (the off_start/len
    // boundary arithmetic), at least one SEQUENCE mixing two
    // conversations (the concat-and-chunk cross-conversation case),
    // and conversation decontamination must populate all three
    // role-aware verdicts (an eval set whose grams never land in an
    // assistant turn leaves drop_conv dead).
    "q_conv_pack/q_conv_decont" -> { dir =>
      val spans = run("q_conv_pack", dir).localCheckpoint()
      val perTurn = spans.groupBy(col("conv_id"), col("turn_idx"))
        .agg(count(lit(1)).as("n_seqs"))
      val perSeq = spans.groupBy(col("seq_id"))
        .agg(countDistinct(col("conv_id")).as("n_convs"))
      val dec = run("q_conv_decont", dir).localCheckpoint()
      Map(
        "loss_spans" -> spans.filter(col("is_loss")).count(),
        "masked_spans" -> spans.filter(!col("is_loss")).count(),
        "turn_split_across_seqs" -> perTurn.filter(col("n_seqs") > 1).count(),
        "seq_spanning_convs" -> perSeq.filter(col("n_convs") > 1).count(),
        // the attention-boundary ledger (q_pack_attn) must see a
        // sequence holding ≥3 conversations — the block-diagonal mask
        // with more than one interior boundary, not just a 2-block
        // split (round-15 ask #4)
        "seq_spanning_3plus_convs" ->
          perSeq.filter(col("n_convs") >= 3).count(),
        "decont_keep" -> dec.filter(col("verdict") === "keep").count(),
        "decont_drop_turns" ->
          dec.filter(col("verdict") === "drop_turns").count(),
        "decont_drop_conv" ->
          dec.filter(col("verdict") === "drop_conv").count())
    },

    // preference-pair fixture (round 14): all three pair verdicts (a
    // fixture with no degenerate pair never gates the normalized
    // equality; the upper-cased variant is what byte-compare misses),
    // PII in a KEPT pair (so the SFT bridge's redaction rewrites a
    // retained row), the prompt-dup class, a NEGATIVE margin among
    // kept pairs (the label-noise signal q_pref_margin exists for),
    // and the redaction visible in the bridged turns.
    "q_pref_*" -> { dir =>
      val gate = run("q_pref_gate", dir).localCheckpoint()
      val dedup = run("q_pref_dedup", dir)
      val margins = run("q_pref_margin", dir).localCheckpoint()
      val turns = graft.ops.Preferences.toSftTurns(
        graft.ops.Preferences.fixture(
          spark.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"))).localCheckpoint()
      Map(
        "pair_keep" -> gate.filter(col("verdict") === "keep").count(),
        "pair_drop_degenerate" ->
          gate.filter(col("verdict") === "drop_degenerate").count(),
        "pair_drop_invalid" ->
          gate.filter(col("verdict") === "drop_invalid").count(),
        "pii_in_kept_pair" -> gate.filter(col("verdict") === "keep" &&
          (col("pii_chosen") || col("pii_rejected"))).count(),
        "prompt_dup" -> dedup.filter(col("is_dup")).count(),
        "negative_margin" -> margins.filter(col("margin_bp") < 0).count(),
        "sft_bridge_redacted" ->
          turns.filter(col("content").contains("<EMAIL>")).count(),
        // response near-dup class (round 15): the +100000 suffix
        // mirrors must verify below J=1 (near, not exact) against
        // their base pair — the hole prompt dedup cannot see
        "near_dup_response" -> run("q_pref_dedup_near", dir)
          .filter(col("pair_b") === col("pair_a") + 100000L &&
            col("jaccard") < 1.0).count())
    })

  test("every fixture class is populated at both gate SFs") {
    for (dir <- sfDirs; (label, classesOf) <- table) {
      val classes = classesOf(dir)
      assert(classes.nonEmpty, s"$label produced no classes at $dir")
      classes.foreach { case (cls, n) =>
        assert(n >= 1L,
          s"$label fixture class '$cls' is EMPTY at $dir — the gate is " +
            "blind to this branch; re-aim the fixture")
      }
    }
  }

  test("documents fixture honors the resize-oracle byte==char contract") {
    // Multimodal.resizeOracleSql rebuilds UTF-8 BYTE payloads from
    // CHARACTER indexing — sound only while every document's text is
    // ASCII. (Empty text is handled by the oracle itself.) A testdata
    // regeneration that introduces non-ASCII must fail here, not
    // surface as an inscrutable md5 mismatch in the gate.
    for (dir <- sfDirs) {
      val nonAscii = Tables.documents(spark, dir)
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii === 0L,
        s"$nonAscii non-ASCII documents at $dir break the resize oracle's " +
          "byte==char rebuild")
    }
  }
}
