package graft.core

/** Engine error carrying the failing SQL with credentials redacted.
  *
  * The reference's `LoaderError` (utils.ts:81-98) stores the failing query
  * text but rewrites any `CREDENTIALS AS '…'` clause to
  * `CREDENTIALS ='SECRET_XXXX'` (utils.ts:91) so secrets never reach logs.
  * `details` carries load-diagnostics rows (the reference attaches the last
  * `stl_load_errors` row — core.ts:40-48).
  */
final class LoaderError(
    val code: String,
    message: String,
    val query: Option[String] = None,
    val details: Option[Map[String, String]] = None,
    cause: Throwable = null)
    extends RuntimeException(s"$code: $message", cause) {
  /** Redacted copy of the failing SQL (never the raw credentials). */
  val redactedQuery: Option[String] = query.map(LoaderError.redact)
}

object LoaderError {
  private val CredPattern =
    "(?i)CREDENTIALS\\s+(AS\\s+)?'[^']*'".r

  /** Redact any credentials clause in SQL text (reference utils.ts:91;
    * Spark precedent: `spark.redaction.regex`). */
  def redact(sql: String): String =
    CredPattern.replaceAllIn(sql, "CREDENTIALS ='SECRET_XXXX'")
}
