package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.collection.mutable.ArrayBuffer

/** `graft_mem` — the WRITABLE catalog face of the graft-memory connector
  * (reference: presto-memory's `MemoryMetadata.java`, which implements
  * createTable / dropTable / renameTable AND the column-evolution
  * surface the bare DataSource V2 TableProvider path cannot express).
  * Registering the store as a TableCatalog lets Spark's native DDL
  * resolution drive it end-to-end:
  *
  *   CREATE TABLE graft_mem.default.t (...)      → empty store entry
  *   INSERT INTO graft_mem.default.t ...         → the DSv2 write path
  *   ALTER TABLE ... RENAME COLUMN a TO b        → SqlBase.g4#renameColumn
  *   ALTER TABLE ... DROP COLUMN a               → SqlBase.g4#dropColumn
  *   ALTER TABLE ... ADD COLUMN c type           → SqlBase.g4#addColumn
  *   ALTER TABLE ... RENAME TO u / DROP TABLE    → renameTable/dropTable
  *
  * — closing the two statements qk7's managed-parquet lifecycle had to
  * descope (a path-based table cannot alter columns in place; a catalog
  * table can). Column evolution REWRITES the stored rows (delete drops
  * the ordinal, add appends NULL) — the store is fixture/dimension-sized
  * by the connector's documented scale stance, so the rewrite is a
  * driver-side loop over at most memory-resident rows, never a
  * distributed job.
  */
class MemCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName = "graft_mem"
  private val Namespace = Array("default")

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  private def key(ident: Identifier): String = {
    require(ident.namespace().sameElements(Namespace) ||
      ident.namespace().isEmpty,
      s"$catalogName: unknown schema ${ident.namespace().mkString(".")}")
    ident.name().toLowerCase
  }

  // ——— TableCatalog ———

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.sameElements(Namespace),
      s"$catalogName: unknown schema ${namespace.mkString(".")}")
    val names = MemoryConn.store.keySet()
    names.toArray(new Array[String](0)).sorted
      .map(Identifier.of(Namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    MemoryConn.store.containsKey(key(ident))

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    val entry = MemoryConn.store.get(k)
    if (entry == null) throw new NoSuchTableException(ident)
    new MemoryTable(k, entry._1)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val k = key(ident)
    require(partitions.isEmpty,
      s"$catalogName: partitioned tables are not supported")
    MemoryConn.store.synchronized {
      if (MemoryConn.store.containsKey(k))
        throw new TableAlreadyExistsException(ident)
      MemoryConn.store.put(k, (schema, ArrayBuffer.empty[Array[InternalRow]]))
    }
    new MemoryTable(k, schema)
  }

  override def dropTable(ident: Identifier): Boolean =
    MemoryConn.store.remove(key(ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    MemoryConn.store.synchronized {
      val from = key(oldIdent); val to = key(newIdent)
      val entry = MemoryConn.store.get(from)
      if (entry == null) throw new NoSuchTableException(oldIdent)
      if (MemoryConn.store.containsKey(to))
        throw new TableAlreadyExistsException(newIdent)
      MemoryConn.store.remove(from)
      MemoryConn.store.put(to, entry)
    }

  /** RENAME COLUMN is metadata-only; ADD/DROP COLUMN rewrite the stored
    * rows (store is fixture-sized by the connector's scale stance). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    MemoryConn.store.synchronized {
      val k = key(ident)
      val entry = MemoryConn.store.get(k)
      if (entry == null) throw new NoSuchTableException(ident)
      var (schema, chunks) = entry
      changes.foreach {
        case rn: TableChange.RenameColumn =>
          require(rn.fieldNames().length == 1,
            s"$catalogName: nested column rename not supported")
          val from = rn.fieldNames()(0)
          val idx = schema.fieldIndex(from)
          schema = StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(name = rn.newName())))
        case del: TableChange.DeleteColumn =>
          require(del.fieldNames().length == 1,
            s"$catalogName: nested column drop not supported")
          val idx = schema.fieldIndex(del.fieldNames()(0))
          val keptTypes = schema.fields.zipWithIndex.collect {
            case (f, i) if i != idx => (i, f.dataType)
          }
          chunks = chunks.map(_.map { row =>
            new GenericInternalRow(keptTypes.map { case (i, dt) =>
              row.get(i, dt)
            }): InternalRow
          })
          schema = StructType(schema.fields.patch(idx, Nil, 1))
        case add: TableChange.AddColumn =>
          require(add.fieldNames().length == 1,
            s"$catalogName: nested column add not supported")
          require(add.isNullable,
            s"$catalogName: added columns must be nullable " +
              "(existing rows read NULL)")
          val n = schema.fields.length
          val types = schema.fields.map(_.dataType)
          chunks = chunks.map(_.map { row =>
            val vals = new Array[Any](n + 1)
            var i = 0
            while (i < n) { vals(i) = row.get(i, types(i)); i += 1 }
            vals(n) = null
            new GenericInternalRow(vals): InternalRow
          })
          schema = StructType(schema.fields :+
            StructField(add.fieldNames()(0), add.dataType(), nullable = true))
        case other =>
          throw new UnsupportedOperationException(
            s"$catalogName: unsupported table change $other")
      }
      MemoryConn.store.put(k, (schema, chunks))
      new MemoryTable(k, schema)
    }

  // ——— SupportsNamespaces ———

  override def listNamespaces(): Array[Array[String]] = Array(Namespace)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Namespace)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    require(namespaceExists(namespace),
      s"$catalogName: unknown schema ${namespace.mkString(".")}")
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName has a single fixed 'default' schema")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName has a single fixed 'default' schema")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName has a single fixed 'default' schema")
}
