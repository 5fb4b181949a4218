package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog face of the Kudu analog — what enables STORAGE-PARTITIONED
  * JOINS (SPARK-37375), the shuffle-free co-located join the reference
  * models with its bucketed-table execution
  * (`presto-hive/.../HiveBucketing.java` decides bucket-compatible
  * exchanges; Kudu itself co-locates by hash bucket): two tables hash
  * bucketed the same way join WITHOUT any exchange, because each scan
  * reports its bucket layout as a `KeyGroupedPartitioning` and Spark's
  * `EnsureRequirements` recognizes the two sides as co-partitioned.
  *
  * Spark's V2ScanPartitioning rule resolves the reported
  * `bucket(n, col)` transform through the owning catalog's
  * FUNCTION catalog — that is why the SPJ path needs this catalog
  * face (a bare `format("graft-kudu")` read carries no catalog, so
  * its partitioning is dropped): [[loadFunction]] serves the
  * `bucket` function whose bound form replays [[KuduStore.bucketOf]]
  * exactly, and whose canonical name ties the two sides' transforms
  * together at plan time.
  *
  * Read-only by design (population goes through the DSv2
  * `format("graft-kudu")` write path); `spark.sql.sources.v2.bucketing
  * .enabled=true` activates the planner side.
  */
class KuduCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array.empty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    import scala.jdk.CollectionConverters._
    KuduStore.tables.keySet().asScala.toArray.sorted
      .map(t => Identifier.of(Array.empty, t))
  }

  override def loadTable(ident: Identifier): Table = {
    if (KuduStore.tables.get(ident.name()) == null)
      throw new NoSuchTableException(ident)
    // via-catalog marks the scan as SPJ-capable: only catalog-loaded
    // scans have their reported KeyGroupedPartitioning honored, so only
    // they must hold their split set stable under runtime filtering
    new KuduTabletTable(new CaseInsensitiveStringMap(
      util.Map.of("table", ident.name(), "via-catalog", "true")))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-kudu catalog is read-only: create tables via KuduStore " +
        "and populate through format(\"graft-kudu\") writes")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft-kudu: alterTable")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft-kudu: dropTable")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft-kudu: renameTable")

  // ---- FunctionCatalog: the bucket transform resolver ----

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket"))
      KuduBucketFunction.Unbound
    else throw new NoSuchFunctionException(ident)
}

/** The `bucket(numBuckets, col)` V2 function: the SAME arithmetic
  * [[KuduStore.bucketOf]] used to place every row — the partition-key
  * values each split reports are therefore exactly what this function
  * would compute, the consistency SPJ relies on. */
object KuduBucketFunction {

  object Unbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col...) — graft-kudu hash-bucket id"
    // N hash columns bind too (Kudu grids routinely hash >1 PK column;
    // the scan's reported transform lists ALL of t.hashCols, so a
    // 2-arg-only bind would IllegalArgumentException at plan time on
    // any multi-column catalog table under v2 bucketing)
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length >= 2,
        s"bucket expects (numBuckets, col...), got $inputType")
      new Bound(inputType.fields.drop(1).map(_.dataType).toSeq)
    }
  }

  final class Bound(colTypes: Seq[DataType])
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      (IntegerType +: colTypes).toArray
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft-kudu.bucket"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // same Seq-based hash as row placement (KuduStore.bucketIdOf) —
      // the consistency SPJ relies on
      val vs: Seq[Any] = colTypes.zipWithIndex.map { case (dt, i) =>
        dt match {
          case LongType => input.getLong(i + 1)
          case IntegerType => input.getInt(i + 1)
          case StringType => input.getUTF8String(i + 1).toString
          case DoubleType => input.getDouble(i + 1)
          case other => throw new UnsupportedOperationException(
            s"graft-kudu bucket over $other")
        }
      }
      Integer.valueOf(KuduStore.bucketIdOf(vs, n))
    }
  }
}
