package org.apache.spark.sql.jdbc

import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions

/** Derby dialect extended with LIMIT/OFFSET pushdown — the Spark-native
  * re-expression of the reference's limit-into-scan connector mechanic
  * (pinot/druid compile a query's LIMIT into the store request,
  * `presto-pinot/.../PinotQueryGenerator.java`; base-jdbc pushes
  * nothing). Spark's stock `DerbyDialect` reports `supportsLimit =
  * false` because Derby has no `LIMIT n` clause — but Derby (like DB2)
  * speaks the SQL:2008 `OFFSET n ROWS FETCH FIRST m ROWS ONLY` form, so
  * this dialect supplies those clauses and a query builder that places
  * them after ORDER BY, the same shape Spark's own `DB2SQLQueryBuilder`
  * emits. With it registered, `pushDownLimit` lets the DSv2 JDBC scan
  * push LIMIT and ORDER-BY-LIMIT (TopN) into the remote engine — rows
  * never leave the store unsorted or uncapped.
  *
  * Lives in `org.apache.spark.sql.jdbc` because `JdbcSQLQueryBuilder`'s
  * collaborators (`JDBCOptions`) are package-visible. Registering this
  * instance REPLACES the stock Derby dialect (case-class equality makes
  * `registerDialect`'s dedup drop it), so every Derby behavior not
  * overridden here still comes from the parent.
  */
private[jdbc] class GraftDerbyDialect extends DerbyDialect {

  override def supportsLimit: Boolean = true
  override def supportsOffset: Boolean = true

  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""

  override def getOffsetClause(offset: Integer): String =
    if (offset > 0) s"OFFSET $offset ROWS" else ""

  override def getJdbcSQLQueryBuilder(options: JDBCOptions): JdbcSQLQueryBuilder =
    new GraftDerbyDialect.DerbyFetchFirstBuilder(this, options)
}

object GraftDerbyDialect {

  /** SQL:2008 fetch-first query shape: the offset/fetch clauses follow
    * ORDER BY (Derby rejects them anywhere else). */
  private class DerbyFetchFirstBuilder(dialect: JdbcDialect,
      options: JDBCOptions) extends JdbcSQLQueryBuilder(dialect, options) {
    override def build(): String = {
      val limitClause = dialect.getLimitClause(limit)
      val offsetClause = dialect.getOffsetClause(offset)
      // plain concatenation: JdbcSQLQueryBuilder exposes a member named
      // `s`, which shadows the string interpolator in subclasses
      options.prepareQuery +
        "SELECT " + hintClause + columnList + " FROM " + tableOrQuery +
        " " + tableSampleClause + " " + whereClause + " " + groupByClause +
        " " + orderByClause + " " + offsetClause + " " + limitClause
    }
  }

  @volatile private var installed = false

  /** Register (idempotently) as THE Derby dialect. */
  def install(): Unit = synchronized {
    if (!installed) {
      JdbcDialects.registerDialect(new GraftDerbyDialect)
      installed = true
    }
  }
}
