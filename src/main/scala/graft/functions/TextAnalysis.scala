package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFeatures._

/** Document-analysis operators for training-data curation (SURVEY §7.6):
  * language ID, quality scoring, token counting, fingerprinting. All
  * built-in-expression programs (codegen'd, one pass per doc).
  */
object TextAnalysis {

  /** Stopword-hit language ID: score each candidate language by hits of
    * its tiny stopword list, pick the argmax with a deterministic
    * alphabetical tiebreak; zero hits everywhere → "und" (undetermined).
    */
  def langId(toks: Column): Column = {
    // Explicit CASE chain in alphabetical language order: the first
    // language whose hit count is positive and >= all others wins —
    // deterministic, and mirrored 1:1 by the oracle SQL.
    val hits = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> stopwordHits(toks, words)
    }
    val cases = hits.map { case (lang, h) =>
      val geAll = hits.filter(_._1 != lang)
        .map { case (_, o) => h >= o }.reduce(_ && _)
      (h > 0 && geAll, lit(lang))
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), acc) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** Quality heuristics: token count, mean token length, stopword ratio
    * (any language), alphabetic-character ratio. The composite score is
    * a fixed linear blend — integer counts divided in double precision,
    * reproducible cross-engine. */
  def qualityColumns(text: Column, toks: Column): Seq[(String, Column)] = {
    val nToks = size(toks).cast("double")
    val allStop = stopwords.values.flatten.toSeq.distinct
    val stopRatio = stopwordHits(toks, allStop).cast("double") / nToks
    val meanLen = aggregate(transform(toks, t => length(t).cast("double")),
      lit(0.0d), (a, v) => a + v) / nToks
    val alphaRatio = (length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
      / length(text).cast("double"))
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "mean_token_len" -> meanLen,
      "stopword_ratio" -> stopRatio,
      "alpha_ratio" -> alphaRatio)
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * segmentation (letter runs / digit runs / single punctuation). */
  def tokenCounts(text: Column, toks: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(toks).cast("long"),
    "bpeish_tokens" -> size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"),
    "n_chars" -> length(text).cast("long"))

  /** PII regexes, restricted to the syntax subset Java regex and RE2
    * (DuckDB) interpret identically — char classes, `+`/bounded
    * quantifiers, no lookaround/backrefs — so detect counts and
    * redaction output are bit-equal cross-engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  /** PII detection + redaction — the scrub pass a training-data
    * pipeline runs before anything ships: count matches, then replace
    * them with typed placeholders. Pure per-row projections (codegen'd
    * regexp expressions, zero shuffles); emails are redacted before
    * phones so overlapping matches resolve in one documented order. */
  def piiColumns(text: Column): Seq[(String, Column)] = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    Seq(
      "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
      "n_phones" -> size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"),
      "redacted" -> regexp_replace(noEmail, PhoneRe, "<PHONE>"))
  }

  /** X220: encoding / mojibake QA — the web-corpus hygiene scan run
    * before any text processing: a crawl snapshot always carries
    * replacement characters (U+FFFD — a decoder already gave up), C1
    * control codepoints U+0080–U+009F (the cp1252-read-as-latin1
    * signature), and UTF-8-read-as-latin1 digraphs ('Ã' + a latin-1
    * continuation, 'â€¦'-family punctuation wrecks) — each a loud,
    * mechanical witness of a broken decode step upstream. Counts per
    * document via codegen'd regexp passes; the non-ASCII ppm separates
    * legitimately non-English text from corruption when read next to
    * the digraph count. Engine-portable: every pattern is RE2-safe
    * (no backreferences, explicit codepoint classes).
    */
  def encodingQaColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text).cast("long"),
    "n_replacement" ->
      size(regexp_extract_all(text, lit("\\uFFFD"), lit(0))).cast("long"),
    "n_c1_controls" ->
      size(regexp_extract_all(text, lit("[\\u0080-\\u009F]"), lit(0))).cast("long"),
    "n_mojibake_digraphs" ->
      size(regexp_extract_all(text,
        lit("\\u00C3[\\u0080-\\u00BF]|\\u00E2\\u0080[\\u0090-\\u00BE]|\\u00C2[\\u00A0-\\u00BF]"),
        lit(0))).cast("long"),
    "n_non_ascii" ->
      size(regexp_extract_all(text, lit("[^\\u0000-\\u007F]"), lit(0))).cast("long"))

  /** Document fingerprints: whole-text polynomial rolling hash, plus a
    * winnowing-style selected fingerprint (min hash over all `w`-token
    * windows — robust to local edits). */
  def fingerprintColumns(text: Column, toks: Column, w: Int): Seq[(String, Column)] = Seq(
    "fp_full" -> charHash(text),
    "fp_winnow" -> when(size(toks) >= w,
      array_min(transform(shingles(toks, w), s => charHash(s))))
      .otherwise(charHash(text)))

  /** X217: classic American Soundex — the phonetic blocking key of
    * record linkage (Odell & Russell's 1918 patent family; the NARA
    * census-indexing rules): names that sound alike land on the same
    * 4-char code (Robert/Rupert → R163), so an entity-resolution pass
    * blocks candidate pairs on the CODE instead of an n² name join —
    * the phonetic sibling of the edit-distance (X65) and
    * sorted-neighborhood (X94) blockers, catching what both miss
    * (Tymczak/Tymcak agree phonetically at edit distance > window).
    *
    * Spelled as a fixed pipeline of engine-identical string primitives
    * (upper → strip non-letters → keep the first letter, drop H/W from
    * the tail → digit-translate → collapse same-digit runs → drop the
    * lead digit → drop vowels' 0s → pad to 4), so Spark and any SQL
    * oracle compute the same bytes; the run-collapse is 7 fixed
    * single-digit regexes because RE2 engines have no backreferences.
    * The H/W rule rides the pipeline order: H/W vanish BEFORE the
    * collapse (codes separated by h/w merge — Ashcraft → A261), vowels
    * become 0s that survive UNTIL after it (codes separated by vowels
    * don't — Tymczak → T522). All six canonical vectors pinned in
    * spec, plus agreement with Spark's built-in `soundex` on them.
    * Input with no letters at all reads NULL (nothing to encode —
    * callers filter or null-handle explicitly).
    */
  def soundexCode(c: Column): Column = {
    val s = regexp_replace(upper(c), "[^A-Z]", "")
    val first = substring(s, 1, 1)
    val cleaned = concat(first,
      regexp_replace(s.substr(lit(2), length(s)), "[HW]", ""))
    val digits = translate(cleaned,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (0 to 6).foldLeft(digits)((d, i) =>
      regexp_replace(d, s"$i{2,}", i.toString))
    val tail = regexp_replace(
      collapsed.substr(lit(2), length(collapsed)), "0", "")
    when(length(s) === 0, lit(null).cast("string"))
      .otherwise(concat(first, rpad(substring(tail, 1, 3), 3, "0")))
  }
}
