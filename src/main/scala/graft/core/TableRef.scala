package graft.core

/** A (schema, table) reference with parse/render round-trip.
  *
  * Mirrors the reference's table-name handling: `parseRsTables`
  * (reference utils.ts:139-149) accepts either a `"schema.table"` string or a
  * `{schema, table}` object, and `getQualifiedTable`
  * (reference RedshiftLoader.ts:258-266) renders the qualified name back.
  *
  * Identifiers are validated on construction — the reference interpolates
  * names into SQL unescaped (a documented injection hazard, reference
  * README.md:36-38); we reject anything that is not a plain identifier
  * instead of replicating that.
  */
final case class TableRef(schema: String, table: String) {
  require(TableRef.isValidIdent(table), s"invalid table identifier: '$table'")
  require(
    schema.isEmpty || TableRef.isValidIdent(schema),
    s"invalid schema identifier: '$schema'")

  /** `schema.table` when a schema is present, else bare `table`
    * (reference RedshiftLoader.ts:258-266). */
  def qualified: String = if (schema.isEmpty) table else s"$schema.$table"

  override def toString: String = qualified
}

object TableRef {
  private val Ident = "^[A-Za-z_][A-Za-z0-9_$]*$".r

  def isValidIdent(s: String): Boolean = Ident.matches(s)

  /** Parse `"schema.table"` / bare `"table"` (reference utils.ts:139-149:
    * split on '.', one part → schema = ""). */
  def parse(name: String): TableRef = name.split('.') match {
    case Array(t)    => TableRef("", t)
    case Array(s, t) => TableRef(s, t)
    case _ => throw new IllegalArgumentException(
      s"table name must be 'table' or 'schema.table': '$name'")
  }
}
