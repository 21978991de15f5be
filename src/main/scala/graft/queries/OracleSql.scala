package graft.queries

/** Helpers for rendering Scala constants into the DuckDB oracle SQL, so a
  * literal that must byte-match an engine constant (e.g. the enrichment
  * preamble) has exactly one definition on both sides.
  */
private[queries] object OracleSql {
  /** Render a Scala string as a SQL string literal (quote-doubling;
    * embedded newlines are legal inside DuckDB string literals). */
  def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
}
