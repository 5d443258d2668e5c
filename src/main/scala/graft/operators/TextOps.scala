package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-level text analysis tables (north-star extensions): per-doc
  * stats, language ID, quality scores, fingerprints. All pure projections —
  * they run inside whole-stage codegen at scan speed, no shuffle. */
object TextOps {

  /** Per-document token/char statistics + quality score. */
  def textStats(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokens(col(text))
    docs.select(col(id),
      length(col(text)).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      qualityScore(col(text)).as("quality"))
  }

  /** Heuristic language ID per document. */
  def langIdTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), langId(col(text)).as("lang_pred"))

  /** Exact + content fingerprints per document (md5 of normalized text,
    * min-shingle-hash winnowing representative). */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      fingerprint(col(text)).as("fp_md5"),
      minShingleHash(col(text)).as("fp_minshingle"))

  /** Word n-gram shingles of the normalized text as `(id, ngrams)` —
    * the benchmark-decontamination unit (n≈5-13 in practice). Built by
    * chaining `zip_with` over n offset slices of the ONE bound token
    * array (per-element lambdas never re-evaluate the tokenization);
    * docs shorter than n tokens yield an empty array. */
  def wordNgrams(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    require(n >= 2, s"n-grams need n >= 2, got $n")
    val bound = docs.select(col(id), tokens(normalized(col(text))).as("__toks"))
    val toks = col("__toks")
    val m = greatest(size(toks) - (n - 1), lit(0))
    val ngrams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m), (a, b) => concat(a, lit(" "), b))
    }
    bound.select(col(id), ngrams.as("ngrams"))
  }

  /** Word n-gram HASHES without materializing the n-gram strings:
    * one codegen'd kernel ([[graft.expressions.NgramHashes]]) hashes
    * each token (xxhash64) and combines every window of n with a
    * rotate-left-7 ⊕ mix — position-sensitive, collision odds
    * ~|grams|²/2⁶⁴ (fine for containment scans where both sides use
    * the same function). 5-10x faster than the interpreted
    * higher-order-function forms and allocation-free per gram. */
  def wordNgramHashes(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    require(n >= 2, s"n-grams need n >= 2, got $n")
    docs.select(col(id), graft.expressions.GraftFunctions.ngramHashes(
      tokens(normalized(col(text))), n).as("gram_hashes"))
  }

  /** Benchmark decontamination: corpus documents sharing at least one
    * word n-gram with the held-out evaluation set are flagged (the
    * train/test-leak scan every LLM data pipeline runs). Inverted-index
    * join on hashed n-grams ([[wordNgramHashes]] — the gram strings are
    * never built); eval grams are tiny and broadcast; the corpus side
    * is one explode + one semi-join, never O(n²). */
  def contaminatedDocs(corpus: DataFrame, evalSet: DataFrame,
      id: String, text: String, n: Int): DataFrame = {
    val evalGrams = wordNgramHashes(evalSet, id, text, n)
      .select(explode(col("gram_hashes")).as("gh")).distinct()
    wordNgramHashes(corpus, id, text, n)
      .select(col(id), explode(col("gram_hashes")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .select(col(id)).distinct()
  }
}
