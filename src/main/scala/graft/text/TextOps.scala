package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for the LLM-data-pipeline tier: normalization,
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * The reference pipeline's text surface is keyword filtering over market
  * questions (`producers/market_discovery.py:35-48`); a training-data
  * pipeline at 100 TB needs the full per-document feature family. Every
  * op here is a pure narrow projection (codegen'd builtins + higher-order
  * functions, zero UDFs, zero shuffles) — scales linearly with input
  * splits and keeps whole-stage codegen intact.
  */
object TextOps {

  /** Canonical normalization: collapse runs of whitespace, trim, lowercase.
    * Shared by dedup/minhash/simhash so near-dup keys are whitespace- and
    * case-insensitive. */
  def norm(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Space-padded form so word-boundary markers like " the " match at
    * string edges too. */
  def padded(text: Column): Column = concat(lit(" "), text, lit(" "))

  /** Number of non-overlapping occurrences of literal `marker` —
    * (len - len(remove(marker))) / len(marker), exact integer math. */
  def countOccurrences(s: Column, marker: String): Column =
    ((length(s) - length(regexp_replace(s, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast(LongType)

  /** Language-ID heuristic: count a marker token per candidate language
    * over the padded normalized text, pick the first language (in `markers`
    * order) whose count ties the maximum — deterministic argmax. */
  def langId(pad: Column, markers: Seq[(String, String)]): Column = {
    val counts = markers.map { case (lang, m) => lang -> countOccurrences(pad, m) }
    val maxCnt = greatest(counts.map(_._2): _*)
    counts.init.foldLeft(null.asInstanceOf[Column]) { case (acc, (lang, c)) =>
      val w = c >= maxCnt
      if (acc == null) when(w, lang) else acc.when(w, lang)
    }.otherwise(markers.last._1)
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast(LongType)

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * the pre-tokenizer regex family used by byte-pair encoders. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Count of characters matching a regex character class. */
  def charClassCount(text: Column, clazz: String): Column =
    (length(text) - length(regexp_replace(text, clazz, ""))).cast(LongType)

  /** Rolling polynomial document fingerprint: fold (acc*31 + codepoint)
    * mod 1e9+7 over the characters — a content hash computable identically
    * by any engine (no engine-specific hash function), usable as an exact
    * dedup key. No shuffle; a native codegen'd Catalyst expression
    * (graft.plans.PolyHash) — the HOF formulation of the same fold is
    * CodegenFallback and ~100× slower per row. */
  def fingerprint(text: Column): Column =
    graft.plans.functions.poly_hash(text)
}
