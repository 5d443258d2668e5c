package graft.exec

import scala.util.matching.Regex

import graft.core.LoaderError

/** Sequential transaction runner with the reference's full failure protocol
  * (reference core.ts:7-60, SURVEY.md §2.4 X1-X3):
  *
  *   - run the statement list in order on one executor;
  *   - on any failure: `ROLLBACK;`, then the optional cleanup statement;
  *   - COPY failures (message mentioning `stl_load_errors`) → fetch the most
  *     recent `stl_load_errors` row and raise `RS_COPY_ERROR` with it as
  *     `details` (core.ts:40-48);
  *   - serializable-isolation conflicts → exponential backoff
  *     `1000 * 3^retry` ms and re-run the WHOLE transaction, up to
  *     [[maxRetries]] times (core.ts:13, 49-53);
  *   - anything else → rethrow.
  *
  * `sleeper` is injectable so tests don't wait out the 1 s/3 s/9 s/27 s
  * schedule.
  */
final class RetryingTxnRunner(
    maxRetries: Int = 4,
    sleeper: Long => Unit = Thread.sleep) {

  import RetryingTxnRunner._

  def run(
      exec: SqlExecutor,
      queries: Seq[String],
      cleanUp: Option[String] = None): Unit = runAttempt(exec, queries, cleanUp, 0)

  @annotation.tailrec
  private def runAttempt(
      exec: SqlExecutor,
      queries: Seq[String],
      cleanUp: Option[String],
      retry: Int): Unit = {
    val failure =
      try { queries.foreach(exec.run); None }
      catch { case e: Throwable => Some(e) }
    failure match {
      case None => ()
      case Some(e) =>
        try exec.run("ROLLBACK;")
        catch { case _: Throwable => () } // best-effort, like the reference
        cleanUp.foreach { c =>
          try exec.run(c)
          catch { case _: Throwable => () }
        }
        val msg = Option(e.getMessage).getOrElse("")
        if (CopyErrorPattern.findFirstIn(msg).isDefined) {
          val details = try {
            exec.run(DiagnosticsSql).headOption
          } catch { case _: Throwable => None }
          throw new LoaderError("RS_COPY_ERROR", msg, details = details, cause = e)
        } else if (SerializationPattern.findFirstIn(msg).isDefined && retry < maxRetries) {
          sleeper(backoffMs(retry))
          runAttempt(exec, queries, cleanUp, retry + 1)
        } else throw e
    }
  }
}

object RetryingTxnRunner {
  /** `1000 * 3^retry` ms — 1 s, 3 s, 9 s, 27 s (reference core.ts:50). */
  def backoffMs(retry: Int): Long = 1000L * math.pow(3, retry.toDouble).toLong

  val DiagnosticsSql: String =
    "SELECT * FROM stl_load_errors ORDER BY starttime DESC LIMIT 1;"

  private val CopyErrorPattern: Regex = "'stl_load_errors'".r
  private val SerializationPattern: Regex =
    "(?i)serializable isolation violation on table".r
}
