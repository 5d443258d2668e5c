package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec._

/** Integration smoke for [[JdbcSqlExecutor]] — the one execution path the
  * in-memory fake cannot cover: a REAL java.sql.Connection, statement
  * execution, result-set→Map marshalling, and the runner's
  * failure→ROLLBACK→cleanup protocol over live JDBC errors.
  *
  * Endpoint: embedded in-memory Derby (`jdbc:derby:memory:...` — ships in
  * /opt/spark/jars, fully in-process, zero egress), so unlike an external
  * pg-wire endpoint this runs on every `sbt test` instead of being
  * env-gated into permanent dormancy. Dialect note: the statements here
  * are Derby-valid (no trailing semicolons, FETCH FIRST not LIMIT) — the
  * REDSHIFT texts the loader emits are parity-tested against the
  * reference in CopySqlSpec/TxnRunnerSpec; this spec's subject is the
  * JDBC boundary itself, which is dialect-independent. */
class JdbcExecutorSpec extends AnyFunSuite {

  // Keep Derby from dropping derby.log into the repo root.
  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")

  private def withConn(f: java.sql.Connection => Unit): Unit = {
    val db = s"memory:graftsmoke_${System.nanoTime()}"
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try f(conn)
    finally {
      conn.close()
      // In-memory Derby dbs persist for the JVM lifetime unless dropped.
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" with 08006 by design
    }
  }

  test("DDL/DML/SELECT round-trip: result sets marshal to column->string maps") {
    withConn { conn =>
      val ex = new JdbcSqlExecutor(conn)
      assert(ex.run("CREATE TABLE t (id INT, name VARCHAR(20), score DOUBLE)")
        .isEmpty)
      assert(ex.run("INSERT INTO t VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, NULL, 3.5)")
        .isEmpty) // update-count path: execute() returns false
      val rows = ex.run("SELECT id, name FROM t ORDER BY id")
      assert(rows.size == 3)
      assert(rows.head == Map("ID" -> "1", "NAME" -> "alpha"))
      assert(rows(1) == Map("ID" -> "2", "NAME" -> "beta"))
      // NULL marshals via String.valueOf — the documented fake-parity
      // behavior ("null", not an absent key).
      assert(rows(2) == Map("ID" -> "3", "NAME" -> "null"))
      val one = ex.run("SELECT COUNT(*) AS n FROM t WHERE score > 2.0")
      assert(one == Seq(Map("N" -> "2")))
    }
  }

  test("live SQL failure propagates as SQLException with engine diagnostics") {
    withConn { conn =>
      val ex = new JdbcSqlExecutor(conn)
      val e = intercept[java.sql.SQLException](ex.run("SELECT * FROM no_such_table"))
      assert(e.getMessage.toUpperCase.contains("NO_SUCH_TABLE"))
      // The statement handle is closed even on failure: the connection
      // stays usable for the runner's rollback/cleanup follow-ups.
      assert(ex.run("VALUES (1)").nonEmpty)
    }
  }

  test("runner protocol over live JDBC: failure -> best-effort ROLLBACK -> cleanup -> rethrow") {
    withConn { conn =>
      val ex = new JdbcSqlExecutor(conn)
      ex.run("CREATE TABLE staging (id INT)")
      ex.run("CREATE TABLE target (id INT)")
      val runner = new RetryingTxnRunner(sleeper = _ => ())
      // Mid-sequence failure: Derby rejects the bad INSERT; the runner
      // then issues its literal "ROLLBACK;" (a Redshift-dialect text
      // Derby rejects too — exercising the documented best-effort
      // swallow on a REAL driver error, core.ts:41-44 parity), runs the
      // cleanup statement, and rethrows the ORIGINAL failure.
      val e = intercept[java.sql.SQLException](runner.run(ex,
        Seq("INSERT INTO staging VALUES (1)",
          "INSERT INTO staging SELECT * FROM missing_src",
          "INSERT INTO target SELECT * FROM staging"),
        cleanUp = Some("DROP TABLE staging")))
      assert(e.getMessage.toUpperCase.contains("MISSING_SRC"))
      // Cleanup really ran on the live engine: staging is gone...
      intercept[java.sql.SQLException](ex.run("SELECT * FROM staging"))
      // ...and the failed transaction never reached target.
      assert(ex.run("SELECT COUNT(*) AS n FROM target") == Seq(Map("N" -> "0")))
    }
  }

  test("transaction boundaries: autoCommit(false) + rollback discards, commit persists") {
    withConn { conn =>
      val ex = new JdbcSqlExecutor(conn)
      ex.run("CREATE TABLE acct (id INT)")
      conn.setAutoCommit(false)
      ex.run("INSERT INTO acct VALUES (42)")
      conn.rollback()
      assert(ex.run("SELECT COUNT(*) AS n FROM acct") == Seq(Map("N" -> "0")))
      ex.run("INSERT INTO acct VALUES (7)")
      conn.commit()
      conn.setAutoCommit(true)
      assert(ex.run("SELECT id FROM acct") == Seq(Map("ID" -> "7")))
    }
  }
}
