package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.LoaderError
import graft.exec._

/** Transaction-runner parity tests — one-for-one with the reference's
  * core.spec.ts (SURVEY.md §5): happy path, rollback on failure, COPY
  * diagnostics, cleanup query, retry-with-backoff. */
class TxnRunnerSpec extends AnyFunSuite {

  private def runner = new RetryingTxnRunner(sleeper = _ => ())

  test("happy path: all queries run in order, no rollback (core.spec.ts:31-38)") {
    val ex = new InMemorySqlExecutor()
    runner.run(ex, Seq("Q1;", "Q2;", "Q3;"))
    assert(ex.executed.toSeq == Seq("Q1;", "Q2;", "Q3;"))
  }

  test("mid-transaction failure: ROLLBACK issued, error propagates (core.spec.ts:39-60)") {
    val ex = new InMemorySqlExecutor({
      case "Q2;" => Left(new RuntimeException("boom"))
    })
    val e = intercept[RuntimeException](runner.run(ex, Seq("Q1;", "Q2;", "Q3;")))
    assert(e.getMessage == "boom")
    assert(ex.executed.toSeq == Seq("Q1;", "Q2;", "ROLLBACK;"))
  }

  test("COPY failure fetches stl_load_errors diagnostics (core.spec.ts:70-91)") {
    val diag = Map("err_reason" -> "Invalid JSON", "line_number" -> "7")
    val ex = new InMemorySqlExecutor({
      case "COPY;" => Left(new RuntimeException(
        "load into table failed, check 'stl_load_errors' for details"))
      case RetryingTxnRunner.DiagnosticsSql => Right(Seq(diag))
    })
    val e = intercept[LoaderError](runner.run(ex, Seq("BEGIN;", "COPY;")))
    assert(e.code == "RS_COPY_ERROR")
    assert(e.details.contains(diag))
    // BEGIN, COPY, ROLLBACK, diagnostics = 4 calls (reference asserts 3 post-failure)
    assert(ex.executed.toSeq ==
      Seq("BEGIN;", "COPY;", "ROLLBACK;", RetryingTxnRunner.DiagnosticsSql))
  }

  test("cleanup query runs on failure (core.spec.ts:92-112)") {
    val ex = new InMemorySqlExecutor({
      case "Q1;" => Left(new RuntimeException("boom"))
    })
    intercept[RuntimeException](
      runner.run(ex, Seq("Q1;"), cleanUp = Some("DROP TABLE IF EXISTS tmp;")))
    assert(ex.executed.toSeq == Seq("Q1;", "ROLLBACK;", "DROP TABLE IF EXISTS tmp;"))
  }

  test("serializable-isolation conflicts retried with 1000*3^n backoff, cap 4 (core.ts:13,49-53)") {
    var sleeps = Seq.empty[Long]
    var failures = 0
    val ex = new InMemorySqlExecutor({
      case "Q1;" if failures < 2 =>
        failures += 1
        Left(new RuntimeException("Serializable isolation violation on table tgt"))
    })
    new RetryingTxnRunner(sleeper = ms => sleeps :+= ms).run(ex, Seq("Q1;", "Q2;"))
    assert(sleeps == Seq(1000L, 3000L))
    assert(ex.executed.count(_ == "Q2;") == 1) // succeeded exactly once
  }

  test("retry cap: 4 retries then the conflict propagates") {
    var sleeps = 0
    val ex = new InMemorySqlExecutor({
      case "Q1;" => Left(new RuntimeException("serializable isolation violation on table t"))
    })
    intercept[RuntimeException](
      new RetryingTxnRunner(sleeper = _ => sleeps += 1).run(ex, Seq("Q1;")))
    assert(sleeps == 4)
    assert(ex.executed.count(_ == "Q1;") == 5) // initial + 4 retries
    assert(RetryingTxnRunner.backoffMs(3) == 27000L)
  }
}
