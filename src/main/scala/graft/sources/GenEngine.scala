package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The shared closed-form generator engine behind the `graft-tpch` and
  * `graft-tpcds` connectors (reference: `presto-tpch/.../TpchMetadata
  * .java`, `presto-tpcds/.../TpcdsMetadata.java` — both serve
  * deterministic generator tables through the same connector SPI).
  *
  * A [[ClosedFormGen]] describes a table family: row counts per scale
  * factor, schemas, a monotone primary key whose predicates prune
  * GENERATION (the reference's split pruning), and per-column
  * `row index → value` functions. The engine supplies the DataSource
  * V2 plumbing once: column pruning, key-range pushdown, key-range
  * splits (`parts` independent slices — a 1000-executor cluster hands
  * each task its contiguous range), and exact
  * SupportsReportStatistics so joins broadcast without hints.
  */
trait ClosedFormGen extends Serializable {
  /** connector short name, used in scan descriptions */
  def genName: String
  def rowCount(table: String, sf: Double): Long
  /** monotone primary-key column; predicates on it prune generation */
  def keyColumn(table: String): String
  /** row index range [lo, hi) whose keys satisfy key ∈ [kLo, kHi] */
  def indexRangeForKeys(table: String, kLo: Long, kHi: Long, n: Long): (Long, Long)
  def schemaOf(table: String): StructType
  /** column generator: row index k → Catalyst value */
  def generator(table: String, column: String, sf: Double): Long => Any
}

class GenTable(gen: ClosedFormGen, table: String, sf: Double, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"${gen.genName}.$table(sf=$sf)"
  override def schema(): StructType = gen.schemaOf(table)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(gen, table, sf, parts)
}

/** Column pruning + key-range predicate pushdown: supported key
  * predicates are fully absorbed (generation range narrows, Spark does
  * NOT re-evaluate them); everything else stays with Spark. */
class GenScanBuilder(gen: ClosedFormGen, table: String, sf: Double, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = gen.schemaOf(table)
  private var pushed: Array[Filter] = Array.empty
  private var kLo: Long = Long.MinValue
  private var kHi: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val key = gen.keyColumn(table)
    val (supported, rest) = filters.partition {
      case EqualTo(c, v: Number) => c == key && v.longValue() >= 0
      case GreaterThan(c, _: Number) => c == key
      case GreaterThanOrEqual(c, _: Number) => c == key
      case LessThan(c, _: Number) => c == key
      case LessThanOrEqual(c, _: Number) => c == key
      case _ => false
    }
    supported.foreach {
      case EqualTo(_, v: Number) =>
        kLo = math.max(kLo, v.longValue()); kHi = math.min(kHi, v.longValue())
      case GreaterThan(_, v: Number) => kLo = math.max(kLo, v.longValue() + 1)
      case GreaterThanOrEqual(_, v: Number) => kLo = math.max(kLo, v.longValue())
      case LessThan(_, v: Number) => kHi = math.min(kHi, v.longValue() - 1)
      case LessThanOrEqual(_, v: Number) => kHi = math.min(kHi, v.longValue())
      case _ =>
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GenScan(gen, table, sf, parts, required, pushed, kLo, kHi)
}

final case class GenRange(start: Long, end: Long) extends InputPartition

class GenScan(gen: ClosedFormGen, table: String, sf: Double, parts: Int,
    required: StructType, pushed: Array[Filter], kLo: Long, kHi: Long)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${gen.genName} $table sf=$sf PushedFilters: [${pushed.mkString(", ")}]"

  private def prunedRange: (Long, Long) = {
    val n = gen.rowCount(table, sf)
    if (kLo == Long.MinValue && kHi == Long.MaxValue) (0L, n)
    else {
      // guard the index arithmetic against overflow (a `< Long.MaxValue`
      // bound times a lines-per-key factor would wrap) WITHOUT clamping
      // into [0, n] — key spaces may sit far above the row count
      // (julian d_date_sk, week-based inv_date_sk); each generator's
      // inverse clamps its OUTPUT to [0, n]
      val cap = 1L << 40
      gen.indexRangeForKeys(table,
        math.max(-cap, math.min(cap, kLo)),
        math.max(-cap, math.min(cap, kHi)), n)
    }
  }

  /** Exact post-pruning cardinality — the generator knows it, so
    * broadcast-vs-shuffle picks are right without ANALYZE. Width:
    * 8 bytes per fixed field, 20 per string — only has to land the
    * broadcast threshold. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (lo, hi) = prunedRange
    val rows = math.max(0L, hi - lo)
    val width = required.fields.map(_.dataType match {
      case StringType => 20L
      case _ => 8L
    }).sum
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * math.max(1L, width))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = prunedRange
    if (hi <= lo) return Array.empty
    val span = hi - lo
    val p = math.max(1, math.min(parts, span).toInt)
    (0 until p).map { i =>
      GenRange(lo + span * i / p, lo + span * (i + 1) / p)
    }.filter(r => r.end > r.start).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(gen, table, sf, required.fieldNames)
}

class GenReaderFactory(gen: ClosedFormGen, table: String, sf: Double,
    columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GenRange]
    new PartitionReader[InternalRow] {
      private val gens = columns.map(gen.generator(table, _, sf))
      private var k = r.start - 1
      override def next(): Boolean = { k += 1; k < r.end }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(gens.length)
        var i = 0
        while (i < gens.length) { row.update(i, gens(i)(k)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
