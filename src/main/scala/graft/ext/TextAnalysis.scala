package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID (stopword/charset heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * Everything here is a pure `Column` expression (no UDFs): narrow,
  * shuffle-free, whole-stage-codegen friendly — exactly what a 100 TB
  * text sweep needs. Hot counting paths use the repo's native
  * codegen'd expressions ([[graft.functions.StopwordHits]],
  * [[graft.functions.RollingHash]]); the rest are codegen'd built-ins.
  * The primitives (regex, md5/sha2, integer arithmetic) are
  * engine-portable, which is what makes these oracle-checkable
  * bit-for-bit.
  */
object TextAnalysis {

  /** Canonical text normalization: lowercase, trim, collapse whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens (non-space runs — split-semantics-proof). */
  def wsTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Lowercase alphabetic word tokens. */
  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** BPE-ish pre-tokenizer: letter runs | digit runs | single punct. */
  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Stopword hit ratio for one language list — hit counting via the
    * native fused [[graft.functions.StopwordHits]] (the HOF twin below
    * is the parity-test reference; the argmax runs four lists, so every
    * token paid four interpreted lambda calls before the fusion). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = wordTokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      graft.functions.StopwordHits(toks, stopwords).cast("double") / size(toks))
  }

  /** The interpreted HOF formulation stopwordRatio replaced — kept as
    * the readable semantic spec and the parity-test reference. */
  private[graft] def stopwordRatioHof(text: Column, stopwords: Seq[String]): Column = {
    val toks = wordTokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))).cast("double")
        / size(toks))
  }

  /** Non-ASCII character ratio (CJK/diacritic signal for language-ID):
    * stripping the full ASCII range (\x00-\x7F, so tabs/newlines in
    * plain ASCII text do NOT count as foreign) leaves exactly the
    * non-ASCII characters; the ratio is remaining/total. (The
    * pre-round-6 form computed `(total - remaining)/total` — the ASCII
    * ratio — which made the zh signal 1.0 on every ASCII document and
    * the argmax always pick zh; caught when x25's funnel counted zero
    * 'en' survivors.) */
  def nonAsciiRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[\\x00-\\x7F]", "")).cast("double") / length(text))

  // Minimal per-language stopword profiles (public common-word lists).
  val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val stopEs = Seq("el", "la", "que", "y", "en", "un", "es", "los", "se", "del")
  val stopFr = Seq("le", "la", "et", "un", "que", "pour", "dans", "ce", "une", "sur")

  /** Per-language scores in the x02 argmax order: stopword-hit ratios
    * for de/en/es/fr plus the non-ASCII charset signal for zh. */
  def langScores(text: Column): Seq[(String, Column)] = Seq(
    "de" -> stopwordRatio(text, stopDe),
    "en" -> stopwordRatio(text, stopEn),
    "es" -> stopwordRatio(text, stopEs),
    "fr" -> stopwordRatio(text, stopFr),
    "zh" -> nonAsciiRatio(text))

  /** Argmax over (label, score) pairs with the x02 tie-break: first
    * label in sequence order whose score reaches the maximum. The ONE
    * implementation of the language decision — x02 applies it to its
    * selected score columns, the funnel to freshly computed ones. */
  def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val g = greatest(scores.map(_._2): _*)
    scores.init.foldRight(lit(scores.last._1): Column) {
      case ((l, s), acc) => when(s >= g, l).otherwise(acc)
    }
  }

  /** Argmax language of a text column (see [[argmaxLang]]) — a
    * convenience one-liner. In a FILTER on a large corpus, stage
    * [[langScores]] as columns first and argmax over the references
    * instead: predicate pushdown rewrites a filter in terms of the raw
    * score trees, re-running every regex per row where subexpression
    * elimination cannot reach (see [[Curation]], which does exactly
    * that staging). */
  def predictedLang(text: Column): Column = argmaxLang(langScores(text))

  /** The x03 combined quality score as one expression (0.4·stopword +
    * 0.3·capped-avg-token-length + 0.3·(1−digit-ratio) — identical op
    * order to the x03 checked columns, so the doubles are bit-equal). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("long")
    val nTokens = size(wsTokens(text)).cast("long")
    val avgLen = when(nTokens === 0, 0.0)
      .otherwise((nChars - nTokens + 1).cast("double") / nTokens)
    lit(0.4) * stopwordRatio(text, stopEn) +
      lit(0.3) * (least(avgLen, lit(10.0)) / 10.0) +
      lit(0.3) * (lit(1.0) - digitRatio(text))
  }

  /** Digit-character ratio. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  /** MD5 fingerprint of normalized text (exact near-identity under
    * case/whitespace noise). */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** 64-bit fingerprint: leading 16 hex chars of SHA-256 of normalized
    * text. */
  def fingerprint64(text: Column): Column =
    substring(sha2(normalize(text).cast("binary"), 256), 1, 16)

  /** Polynomial rolling hash (Rabin–Karp, base 257 mod 2^61−1) over the
    * normalized text's code points — the classic content-defined
    * fingerprint, as the native LINEAR [[graft.functions.RollingHash]]
    * expression (the earlier HOF fold re-sliced the string per character
    * — O(n²) — and overflowed int64 under ANSI once the accumulator
    * passed 2⁶³/257; see the expression's scaladoc for the overflow-free
    * Mersenne-rotate arithmetic). Library surface, not an oracle query
    * (the 61-bit ring is not portable to the DuckDB oracle). */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHash(normalize(text))
}
