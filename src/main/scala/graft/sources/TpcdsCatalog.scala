package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The catalog face of the TPC-DS generator — Presto's `tpcds` catalog
  * spelling verbatim (`presto-tpcds/.../TpcdsMetadata.java` schemas
  * `tiny, sf1, ...`; `SELECT * FROM tpcds.tiny.store_sales`): a DSv2
  * TableCatalog whose namespaces are scale factors and whose tables are
  * the 24 generators. Wired in Sessions.local as
  * `spark.sql.catalog.graft_tpcds`:
  * {{{ SELECT count(*) FROM graft_tpcds.tiny.store_sales }}}
  * Read-only, like [[TpchCatalog]].
  */
class TpcdsCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName = "graft_tpcds"
  private val namedSfs = Seq("tiny", "sf1", "sf10", "sf100", "sf1000")

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  private def sfOf(namespace: Array[String]): Option[Double] =
    namespace match {
      case Array("tiny") => Some(0.01)
      case Array(s) if s.matches("(?i)sf\\d+") => Some(s.drop(2).toDouble)
      case _ => None
    }

  private def ro = new UnsupportedOperationException(
    s"$catalogName is a read-only generator catalog")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(sfOf(namespace).isDefined,
      s"$catalogName: unknown schema ${namespace.mkString(".")}")
    TpcdsGen.tables.map(Identifier.of(namespace, _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val sf = sfOf(ident.namespace()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    if (!TpcdsGen.tables.contains(ident.name().toLowerCase))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GenTable(TpcdsGen, ident.name().toLowerCase, sf, 8)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = throw ro
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw ro
  override def dropTable(ident: Identifier): Boolean = throw ro
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw ro

  override def listNamespaces(): Array[Array[String]] =
    namedSfs.map(Array(_)).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    sfOf(namespace).isDefined
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    require(sfOf(namespace).isDefined,
      s"$catalogName: unknown schema ${namespace.mkString(".")}")
    util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = throw ro
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = throw ro
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = throw ro
}
