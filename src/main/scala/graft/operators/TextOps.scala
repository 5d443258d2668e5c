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
}
