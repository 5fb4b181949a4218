package graft.sources

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import scala.collection.mutable

/** Table/column model shared by the in-process JDBC dialect shims
  * (MySQL, PostgreSQL — reference: `presto-base-jdbc/.../
  * BaseJdbcClient.java` is one client parameterized by per-dialect
  * modules `presto-mysql/.../MySqlClientModule.java`,
  * `presto-postgresql/.../PostgreSqlClientModule.java`; the shims
  * mirror that factoring: ONE statement engine, per-dialect stores).
  *
  * A [[ShimModel.ColDef]] is one column exactly as the remote engine
  * models it — its RSMD answers (type name, JDBC code, precision,
  * scale, signedness) are what Spark's dialect `getCatalystType`
  * consumes, so these fields ARE the read-side inference surface under
  * test. */
object ShimModel {

  final case class ColDef(name: String, typeName: String, jdbcType: Int,
      precision: Int, scale: Int, signed: Boolean, nullable: Boolean)

  final class MTable(val columns: Seq[ColDef]) {
    private[sources] val rows = mutable.ArrayBuffer.empty[Array[Any]]
    private[sources] val colIdx: Map[String, Int] =
      columns.map(_.name.toLowerCase).zipWithIndex.toMap
  }
}

/** The per-dialect half of a JDBC shim: the store plus everything the
  * shared statement engine ([[MiniSql]], [[ShimJdbcCore]]) must know
  * about the dialect whose SQL it receives. */
private[sources] trait ShimBackend {
  import ShimModel._

  /** Error-message prefix, e.g. "graft-mysql". */
  def who: String
  /** The identifier quote the dialect emits (backtick vs `"`). */
  def quote: Char
  /** MySQL's literal grammar treats `\` as an escape; standard SQL
    * (Postgres with standard_conforming_strings) does not. */
  def escapeBackslashInLiterals: Boolean
  def productName: String
  def productVersion: String
  def majorVersion: Int
  def minorVersion: Int

  def table(name: String): MTable
  def create(name: String, cols: Seq[ColDef]): Unit
  def insert(name: String, values: Seq[Any]): Unit
  def drop(name: String): Unit
  /** Dialect DDL type → column model (the inverse of the dialect's
    * getJDBCType, probed empirically; loud on anything unmapped). */
  def ddlType(name: String, ddl: String, nullable: Boolean): ColDef
  /** Every SQL text that crossed the shim boundary. */
  def statementLog: ConcurrentLinkedQueue[String]
  /** Recorded CREATE TABLE column DDL per table. */
  def ddlLog: ConcurrentHashMap[String, String]
}
