package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives used by the wordcount / dedup / quality
  * operators. All are built from codegen'd `functions._` — no UDFs —
  * so they stay inside whole-stage codegen on the scan side.
  *
  * Tokenization is deliberately the simplest deterministic rule
  * (split on single space, drop empties) so the DuckDB oracle can
  * reproduce it exactly with `string_split(text, ' ')`.
  */
object Texts {

  /** Whitespace tokens, empties dropped (single-pass kernel — same
    * semantics as `filter(split(text, " ", -1), _ =!= "")` and as the
    * oracle's `list_filter(string_split(text,' '), x -> x <> '')`). */
  def tokens(text: Column): Column = TextKernels.wsTokens(text)

  /** Word 3-gram shingles (space-joined), empty array below 3 tokens. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1),
          element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Word k-grams (space-joined, 1-based slice), empty array below k
    * tokens — ONE definition shared by decontamination (raw + bloom
    * modes) and the span dedup, whose shared-oracle / equality-gate
    * guarantees require the gram expression to stay byte-identical
    * across call sites. (`sequence(1, m)` DESCENDS for m <= 0, hence
    * the explicit short-doc guard.) */
  def kGrams(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Canonical form: tokens re-joined with single spaces. */
  def canonical(toks: Column): Column = concat_ws(" ", toks)

  /** md5 fingerprint of the canonical form (hex, lowercase — identical
    * to DuckDB's md5()). */
  def fingerprint(toks: Column): Column = md5(canonical(toks).cast("binary"))
}
