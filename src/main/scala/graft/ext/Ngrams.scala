package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram and fixed-size passage (token-chunk) generation as pure
  * `Column` expressions — the shared primitive under decontamination
  * (x19), repetition-quality signals (x20), and passage-level dedup
  * (x21).
  *
  * Everything is codegen'd built-ins (`transform`/`sequence`/`slice`/
  * `array_join`), so the per-document work is narrow and shuffle-free;
  * the downstream operators shuffle only on gram/fingerprint keys,
  * never on document text. Tokenization matches
  * [[TextAnalysis.wsTokens]] over normalized text so fingerprints are
  * stable under case/whitespace noise.
  */
object Ngrams {

  /** Whitespace tokens of normalized (lowercased, ws-collapsed) text. */
  def normTokens(text: Column): Column =
    TextAnalysis.wsTokens(TextAnalysis.normalize(text))

  /** All word n-grams (space-joined) of a token array; empty when the
    * document has fewer than `n` tokens. `sequence(a,b)` is empty-safe
    * only for a <= b, so guard short docs explicitly. */
  def ngrams(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))

  /** Consecutive `chunkTokens`-token passages (last one may be short):
    * the unit of passage-level dedup. A document with no tokens yields
    * a single empty passage so it survives reassembly. */
  def passages(tokens: Column, chunkTokens: Int): Column =
    when(size(tokens) === 0, array(lit(""))).otherwise(
      transform(sequence(lit(0), floor((size(tokens) - 1) / chunkTokens).cast("int")),
        c => array_join(slice(tokens, c * chunkTokens + lit(1), lit(chunkTokens)), " ")))
}
