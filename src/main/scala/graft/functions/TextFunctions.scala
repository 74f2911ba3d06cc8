package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for the document pipeline: normalization,
  * tokenization, fingerprinting, language-ID heuristics, quality scoring.
  *
  * All pure Column expressions (codegen'd, distributed, no driver-side
  * state) so they hold up on a 100 TB corpus: each is a narrow map over
  * the `text` column with no shuffle.
  */
object TextFunctions {

  /** Lower-cased, whitespace-collapsed text — canonical form for hashing. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens (of the trimmed text; "" yields a single empty token,
    * mirroring common split semantics — callers filter if needed). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** 64-bit-ish document fingerprint: first 16 hex chars of md5 of the
    * normalized text. Stable across engines (md5 is md5 everywhere). */
  def fingerprint(c: Column): Column =
    substring(md5(normText(c)), 1, 16)

  /** Evaluate `arr` ONCE per row and build a derived column from the
    * bound value. Column expressions have no let-binding, so a lambda
    * that references its own input expression re-evaluates that
    * expression per element — for a regex-split token array inside a
    * per-gram transform that is an O(n²)-work trap (measured 5× on the
    * shingle path). Wrapping the input as a 1-element array and
    * transforming binds it to a lambda VARIABLE, evaluated once. */
  def bindOnce(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)

  /** Word n-gram shingles of the token array (distinct), for Jaccard /
    * MinHash. n >= 1; documents shorter than n tokens yield the whole
    * text as a single shingle so they can still bucket. */
  def shingles(c: Column, n: Int): Column =
    bindOnce(tokens(c)) { toks =>
      array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    }

  /** Stopword regex per language for the language-ID heuristic. */
  val langStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|a|in|is|it|that|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|es|en|un)\\b",
    "fr" -> "\\b(le|la|les|et|de|un|une|est|que|dans)\\b")

  /** Count of stopword hits for one language. */
  def stopwordHits(c: Column, lang: String): Column = {
    val pat = langStopwords.toMap.apply(lang)
    regexp_count(lower(c), lit(pat))
  }

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hits, ties resolved in en > de > es > fr order; no hits at
    * all → "und" (undetermined). */
  def langId(c: Column): Column = {
    val hits = langStopwords.map { case (l, _) => l -> stopwordHits(c, l) }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h === maxHits && h > 0, lit(l)).otherwise(acc)
    }
  }

  def punctCount(c: Column): Column = regexp_count(c, lit("[.,;:!?]"))

  /** Heuristic quality score in [0,1]:
    *   0.5 * min(1, tokens/64)            (length component)
    * + 0.3 * (1 - min(1, punct/tokens))  (punctuation density)
    * + 0.2 * min(1, 4*stopwords/tokens)  (stopword-richness / naturalness)
    * rounded to 4 decimals. Deliberately simple + engine-portable.
    */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c).cast(DoubleType)
    val nTok = when(toks > 0, toks).otherwise(lit(1.0))
    val punct = punctCount(c).cast(DoubleType)
    val stop = stopwordHits(c, "en").cast(DoubleType)
    val q =
      lit(0.5) * least(lit(1.0), toks / lit(64.0)) +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punct / nTok)) +
      lit(0.2) * least(lit(1.0), lit(4.0) * stop / nTok)
    // floor-based half-up round: bitwise-deterministic across engines
    // (the formula's finite-decimal fractions DO land on .00005
    // boundaries, where decimal-string rounding diverges between
    // engines; floor on the identical binary double cannot).
    floor(q * lit(10000.0) + lit(0.5)).cast(DoubleType) / lit(10000.0)
  }

  /** Gopher-style rule-based quality signals (Rae et al. 2021 §A1.1.2,
    * the standard pre-training document filter), computed per document
    * as one pure map: token count, mean word length, symbol-to-word
    * ratio, alphabetic-word ratio, English stopword hits, and the
    * composite pass verdict over the published bounds (50 ≤ words ≤
    * 100k, 3 ≤ mean len ≤ 10, symbol ratio < 0.1, ≥ 80% alphabetic
    * words, ≥ 2 stopwords). Ratios are floor-rounded at 4 decimals and
    * the verdict compares the ROUNDED values, so engine and oracle can
    * never disagree at a bound. Returns a struct column:
    * (n_tok, mean_word_len, symbol_ratio, alpha_ratio, stop_hits, passes). */
  def gopherSignals(text: Column): Column =
    bindOnce(filter(tokens(lower(text)), t => t =!= lit(""))) { toks =>
      bindOnce(greatest(size(toks), lit(1)).cast("double")) { n =>
        val floor4 = (c: Column) =>
          floor(c * lit(10000.0) + lit(0.5)).cast(DoubleType) / lit(10000.0)
        val nTok = size(toks).cast("long")
        val meanLen = floor4(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
        val symRatio = floor4(
          size(filter(toks, t => t.rlike("#|\\.\\.\\."))).cast("double") / n)
        val alphaRatio = floor4(
          size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n)
        val stopHits = stopwordHits(text, "en").cast("long")
        struct(
          nTok.as("n_tok"), meanLen.as("mean_word_len"),
          symRatio.as("symbol_ratio"), alphaRatio.as("alpha_ratio"),
          stopHits.as("stop_hits"),
          (nTok >= 50 && nTok <= 100000 &&
            meanLen >= 3.0 && meanLen <= 10.0 &&
            symRatio < 0.1 && alphaRatio > 0.8 && stopHits >= 2).as("passes"))
      }
    }

  /** CTE body of the [[gopherSignals]] oracle over source relation
    * `src` (doc_id, text), prefixed for composability. Ends with CTE
    * `${p}gsig`: (doc_id, n_tok, mean_word_len, symbol_ratio,
    * alpha_ratio, stop_hits, passes). */
  def gopherSignalsOracleCtes(src: String = "documents", p: String = ""): String = {
    val f4 = (e: String) => s"floor(($e) * 10000.0 + 0.5) / 10000.0"
    val meanLen = f4("CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / n")
    val symR = f4("CAST(len(list_filter(toks, t -> regexp_matches(t, '#|\\.\\.\\.'))) AS DOUBLE) / n")
    val alphaR = f4("CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / n")
    val stopPat = langStopwords.toMap.apply("en")
    raw"""${p}tk AS (SELECT doc_id, text, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> '') AS toks FROM $src),
${p}tkb AS (SELECT doc_id, text, toks, CAST(greatest(len(toks), 1) AS DOUBLE) AS n FROM ${p}tk),
${p}gsig AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok, $meanLen AS mean_word_len, $symR AS symbol_ratio, $alphaR AS alpha_ratio, CAST(len(regexp_extract_all(lower(text), '$stopPat')) AS BIGINT) AS stop_hits, (CAST(len(toks) AS BIGINT) >= 50 AND CAST(len(toks) AS BIGINT) <= 100000 AND $meanLen >= 3.0 AND $meanLen <= 10.0 AND $symR < 0.1 AND $alphaR > 0.8 AND CAST(len(regexp_extract_all(lower(text), '$stopPat')) AS BIGINT) >= 2) AS passes FROM ${p}tkb)"""
  }

  /** DuckDB replica of [[gopherSignals]] over table `documents`. */
  def gopherSignalsOracleSql: String =
    s"""WITH ${gopherSignalsOracleCtes()}
SELECT doc_id, n_tok, mean_word_len, symbol_ratio, alpha_ratio, stop_hits, passes FROM gsig"""

  // PII regexes: a deliberately portable RE2/Java common subset (no
  // backreferences, no lookaround) so engine and oracle match the same
  // spans. Redaction order is fixed (email, then IP, then phone) —
  // earlier replacements cannot create later patterns' text.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}[ -]?\\(?[0-9]{2,4}\\)?[ -]?[0-9]{3,4}[ -]?[0-9]{3,4}"
  val UrlRe = "https?://[^ \\t\\n]+"

  /** Redact emails, IPv4 addresses, and international-format phone
    * numbers to typed placeholders — the pre-training scrub pass. Pure
    * per-row map (three codegen'd regexp_replace, no shuffle). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** All http(s) URLs in the text, as an array (document order). */
  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit(UrlRe), lit(0))

  /** Portable 60-bit integer hash of a string: first 15 hex digits of
    * md5, as a long. Matches DuckDB `CAST('0x'||substring(md5(s),1,15) AS
    * BIGINT)` bit-for-bit — used wherever an oracle must reproduce our
    * hashing (minhash, simhash). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** ln(2) literal shared by engine and oracle (base-2 entropy). */
  val Ln2: Double = 0.6931471805599453

  /** Shannon entropy of the character distribution in MICRO-bits, as an
    * exact BIGINT — low values flag repeated-char/gibberish documents
    * (a standard corpus quality gate). Each distinct character's
    * -p·log2(p) term is quantized to an integer before summing, so the
    * total is independent of the distinct-char enumeration order (which
    * engines do NOT agree on) and of any parallel summation order.
    * Pure per-row map; the character array and each p bind once. */
  def charEntropyMicros(c: Column): Column =
    bindOnce(filter(split(c, ""), ch => ch =!= lit(""))) { chars =>
      bindOnce(size(chars).cast("double")) { n =>
        aggregate(
          transform(array_distinct(chars), ch =>
            bindOnce(size(filter(chars, x => x === ch)).cast("double") / n) { p =>
              floor((lit(0.0) - p * log(p)) / lit(Ln2) * lit(1000000.0)
                + lit(0.5)).cast("long")
            }),
          lit(0L), (acc, x) => acc + x)
      }
    }

  /** DuckDB replica of [[charEntropyMicros]] over table `documents` —
    * same quantized terms, same exact integer sum. */
  def charEntropyOracleSql: String = {
    val cnt = "CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE)"
    s"""WITH cs AS (SELECT doc_id, list_filter(regexp_split_to_array(text, ''), x -> x <> '') AS chars FROM documents),
b AS (SELECT doc_id, chars, CAST(len(chars) AS DOUBLE) AS n FROM cs)
SELECT doc_id, CAST(coalesce(list_sum(list_transform(list_distinct(chars), c -> CAST(floor((0.0 - ($cnt / n) * ln($cnt / n)) / $Ln2 * 1000000.0 + 0.5) AS BIGINT))), 0) AS BIGINT) AS entropy_micros FROM b"""
  }
}
