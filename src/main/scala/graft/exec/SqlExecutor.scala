package graft.exec

import scala.collection.mutable

/** Minimal SQL execution boundary — anything that can run a statement and
  * return rows. The reference's structural pool typing (`PoolLike` /
  * `ClientLike`, reference types.ts:75-87) made it testable without a live
  * warehouse; this trait is the Scala restatement (SURVEY.md §2.4 X4).
  *
  * Production deployments back this with a JDBC connection; tests use
  * [[InMemorySqlExecutor]] (the reference's DUMMY_POOL, core.spec.ts:10-17).
  */
trait SqlExecutor {
  /** Run one statement, return result rows as column->value maps. */
  def run(sql: String): Seq[Map[String, String]]
}

/** Recording fake: scripts responses / failures per statement and records
  * the exact SQL sequence — assertion style mirrors the reference's specs
  * (exact call counts + SQL text, core.spec.ts:31-112). */
final class InMemorySqlExecutor(
    script: PartialFunction[String, Either[Throwable, Seq[Map[String, String]]]] =
      PartialFunction.empty)
    extends SqlExecutor {
  val executed: mutable.Buffer[String] = mutable.Buffer.empty

  override def run(sql: String): Seq[Map[String, String]] = {
    executed += sql
    if (script.isDefinedAt(sql)) script(sql).fold(throw _, identity)
    else Seq.empty
  }
}

/** JDBC-backed executor. Compiled but unused in CI — the harness is
  * zero-egress (SURVEY.md §7.2 M4). */
final class JdbcSqlExecutor(conn: java.sql.Connection) extends SqlExecutor {
  override def run(sql: String): Seq[Map[String, String]] = {
    val st = conn.createStatement()
    try {
      if (st.execute(sql)) {
        val rs = st.getResultSet
        val meta = rs.getMetaData
        val cols = (1 to meta.getColumnCount).map(meta.getColumnName)
        val out = mutable.Buffer.empty[Map[String, String]]
        while (rs.next())
          out += cols.map(c => c -> String.valueOf(rs.getString(c))).toMap
        out.toSeq
      } else Seq.empty
    } finally st.close()
  }
}
