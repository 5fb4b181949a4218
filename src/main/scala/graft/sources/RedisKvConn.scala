package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Redis-shaped key/value connector — the Spark-native re-expression
  * of the reference's Redis connector
  * (`presto-redis/src/main/java/com/facebook/presto/redis/
  * RedisConnectorFactory.java:39`) against an IN-PROCESS key/value
  * store, the same documented-substitution pattern that carries the
  * kafka-shaped topic log ([[KafkaLog]]).
  *
  * DOCUMENTED SUBSTITUTION: no Redis server or client jar exists in
  * this zero-egress distribution, so the wire half (Jedis pools, node
  * addresses) is replaced by [[RedisStore]], a JVM-wide store holding
  * the three value shapes the reference reads — string, hash, sorted
  * set. EVERYTHING above the socket is the real integration surface,
  * kept exactly Redis-connector-shaped:
  *
  *   - '''Table mapping''' follows the reference's key-prefix
  *     convention (`RedisRecordCursor.setScanParms`,
  *     `RedisRecordCursor.java:263-291`): a table's keys match
  *     `schema<delim>table<delim>*`, the `"default"` schema is NOT
  *     prefixed, the delimiter is configurable
  *     (`redis.key-delimiter`, default `:`), and
  *     `key.prefix.schema.table=false` treats the whole keyspace as
  *     one table — all four behaviors reproduced here.
  *   - '''Split model''' mirrors `RedisSplitManager.getSplits`
  *     (`RedisSplitManager.java:62-113`): when the key list lives in a
  *     user-provided ZSET (`key.format=zset`), the zset is chunked
  *     into index-range splits of stride 100, capped at 100 splits
  *     (stride grows past the cap), the last split's end marked `-1`
  *     (redis "until the end"); each split fetches its own
  *     `ZRANGE key start end` slice and then its members' values —
  *     the shape that fans out one task per chunk on a cluster. A
  *     SCAN-discovered string-key table is ONE split, exactly like the
  *     reference (a Redis SCAN cursor cannot be sharded).
  *   - '''Value shapes''': `value.format=string` surfaces the value
  *     text; `value.format=hash` surfaces the field map (the
  *     reference's `jedis.hgetAll` arm, `RedisRecordCursor.java:343`).
  *     A key deleted between key discovery and value fetch SKIPS the
  *     row, matching the cursor's "data modified while query was
  *     running" behavior (`RedisRecordCursor.java:337-349`).
  *   - '''Schema''' carries the reference's internal columns
  *     (`RedisInternalFieldDescription.java:42-67`) in Spark spelling:
  *     `_key`/`_value`/`_key_length`/`_value_length` become
  *     `key`/`value`/`key_length`/`value_length`, plus `hash` for the
  *     hash-value field map. The `_key_corrupt`/`_value_corrupt` flags
  *     are deliberately NOT reproduced: decoding bytes onto typed
  *     columns lives in `graft.functions.RecordDecoders` projections
  *     (exactly like the reference splits `presto-redis` from
  *     `presto-record-decoder`), and corruption surfaces there
  *     per-expression, loudly or via TRY.
  *
  * Read-only, like the reference's Redis connector (no insert path).
  *
  * Scale stance: the in-process store stands in for the server; the
  * connector layer above it (zset index-range splits, match-pattern
  * table mapping, per-split value fetch) is the real contract. At
  * cluster scale the zset path fans out ~100 ways; the scan path is
  * single-cursor by Redis's own design — the reference has the same
  * bound.
  */
object RedisStore {

  sealed trait RVal
  final case class RString(value: String) extends RVal
  final case class RHash(fields: Map[String, String]) extends RVal
  /** Sorted set: member -> score, iterated by (score, member) — the
    * redis ZRANGE order. */
  final case class RZSet(members: Map[String, Double]) extends RVal

  private[sources] val db = new ConcurrentHashMap[String, RVal]()

  def flushAll(): Unit = db.clear()

  def set(key: String, value: String): Unit = db.put(key, RString(value))

  /** MSET shape — one batched call per fixture load (a real client
    * pipelines SETs or issues MSET; gate setup must not drive one
    * driver round-trip per row). */
  def setBatch(pairs: Seq[(String, String)]): Unit =
    pairs.foreach { case (k, v) => db.put(k, RString(v)) }

  def hset(key: String, fields: Map[String, String]): Unit = {
    val merged = db.get(key) match {
      case RHash(old) => old ++ fields
      case _ => fields
    }
    db.put(key, RHash(merged))
  }

  def zadd(key: String, score: Double, member: String): Unit = {
    val merged = db.get(key) match {
      case RZSet(old) => old + (member -> score)
      case _ => Map(member -> score)
    }
    db.put(key, RZSet(merged))
  }

  def get(key: String): Option[String] = db.get(key) match {
    case RString(v) => Some(v)
    case _ => None
  }

  def hgetAll(key: String): Option[Map[String, String]] = db.get(key) match {
    case RHash(f) => Some(f)
    case _ => None
  }

  /** ZCOUNT key -inf +inf (== ZCARD) — the split-count probe
    * (`RedisSplitManager.java:82`). */
  def zcard(key: String): Long = db.get(key) match {
    case RZSet(m) => m.size.toLong
    case _ => 0L
  }

  /** ZRANGE key start end: inclusive index range in (score, member)
    * order; end == -1 means "through the last element" — redis
    * semantics, the split-fetch call (`RedisRecordCursor.java:313`). */
  def zrange(key: String, start: Long, end: Long): Seq[String] = {
    val ordered = db.get(key) match {
      case RZSet(m) => m.toSeq.sortBy { case (mem, s) => (s, mem) }.map(_._1)
      case _ => Seq.empty
    }
    val until = if (end < 0) ordered.length else math.min(end + 1, ordered.length).toInt
    if (start >= until) Seq.empty
    else ordered.slice(start.toInt, until)
  }

  /** SCAN with an optional glob MATCH pattern (only `*` wildcards, the
    * shape the key-prefix convention emits). Deterministic order for
    * replayable tests; a real SCAN guarantees no order. */
  def scanKeys(matchGlob: Option[String]): Seq[String] = {
    val all = db.keySet().asScala.toSeq.sorted
    matchGlob match {
      case None => all
      case Some(glob) =>
        val re = java.util.regex.Pattern.compile(
          glob.split("\\*", -1).map(java.util.regex.Pattern.quote)
            .mkString(".*"))
        all.filter(k => re.matcher(k).matches())
    }
  }
}

class RedisKvProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-redis"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RedisKvTable.Schema

  override def supportsExternalMetadata(): Boolean = false

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RedisKvTable(new CaseInsensitiveStringMap(properties))
}

object RedisKvTable {
  /** `_key`/`_value`/`_key_length`/`_value_length` in Spark spelling
    * (`RedisInternalFieldDescription.java:42-67`) + the hash field map.
    * `value` is null for hash-valued tables, `hash` for string-valued
    * ones. */
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("hash", MapType(StringType, StringType)),
    StructField("key_length", LongType),
    StructField("value_length", LongType)))

  final case class Opts(schema: String, table: String, keyFormat: String,
      keyName: String, valueFormat: String, delimiter: String,
      prefixSchemaTable: Boolean) {
    /** The SCAN match pattern of `setScanParms`: `schema:table:*`,
      * "default" schema unprefixed. */
    def matchGlob: Option[String] =
      if (!prefixSchemaTable) None
      else Some((if (schema == "default") "" else schema + delimiter) +
        table + delimiter + "*")
  }

  private[graft] def parse(options: CaseInsensitiveStringMap): Opts = {
    val table = options.get("table")
    require(table != null && table.nonEmpty,
      "graft-redis requires option 'table'")
    val keyFormat = Option(options.get("key.format")).getOrElse("string")
    require(keyFormat == "string" || keyFormat == "zset",
      s"graft-redis key.format must be string|zset, got '$keyFormat'")
    val keyName = options.get("key.name")
    require(keyFormat != "zset" || (keyName != null && keyName.nonEmpty),
      "graft-redis key.format=zset requires option 'key.name' (the zset " +
        "holding the table's keys)")
    val valueFormat = Option(options.get("value.format")).getOrElse("string")
    require(valueFormat == "string" || valueFormat == "hash",
      s"graft-redis value.format must be string|hash, got '$valueFormat'")
    Opts(
      Option(options.get("schema")).getOrElse("default"),
      table, keyFormat,
      Option(keyName).getOrElse(""),
      valueFormat,
      Option(options.get("key.delimiter")).getOrElse(":"),
      Option(options.get("key.prefix.schema.table")).forall(_.toBoolean))
  }

  /** The reference's split constants (`RedisSplitManager.java:47-48`). */
  val StrideSplits = 100L
  val MaxSplits = 100L

  /** ZSET index-range split planning, `RedisSplitManager.getSplits`
    * semantics: stride-100 chunks, stride grows when the chunk count
    * would exceed 100 splits, the last chunk's end is -1. */
  private[graft] def zsetRanges(numberOfKeys: Long): Seq[(Long, Long)] = {
    var stride = StrideSplits
    if (numberOfKeys / stride > MaxSplits) stride = numberOfKeys / MaxSplits
    val out = Seq.newBuilder[(Long, Long)]
    var start = 0L
    while (start < numberOfKeys) {
      val end = if (start + stride - 1 >= numberOfKeys) -1L
        else start + stride - 1
      out += ((start, end))
      start += stride
    }
    out.result()
  }
}

class RedisKvTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val opts = RedisKvTable.parse(options)

  override def name(): String = s"graft-redis.${opts.schema}.${opts.table}"
  override def schema(): StructType = RedisKvTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new RedisKvScan(opts)
}

/** zset split: one ZRANGE index chunk (`RedisSplit` start/end). */
final case class RedisZRange(keyName: String, start: Long, end: Long,
    valueFormat: String) extends InputPartition

/** string-key split: one SCAN over the match pattern. */
final case class RedisScanAll(matchGlob: Option[String],
    valueFormat: String) extends InputPartition

class RedisKvScan(opts: RedisKvTable.Opts) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = RedisKvTable.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-redis ${opts.schema}.${opts.table} key=${opts.keyFormat} " +
      s"value=${opts.valueFormat}"

  override def planInputPartitions(): Array[InputPartition] =
    if (opts.keyFormat == "zset")
      RedisKvTable.zsetRanges(RedisStore.zcard(opts.keyName))
        .map { case (s, e) =>
          RedisZRange(opts.keyName, s, e, opts.valueFormat): InputPartition
        }.toArray
    else Array(RedisScanAll(opts.matchGlob, opts.valueFormat))

  override def createReaderFactory(): PartitionReaderFactory =
    new RedisKvReaderFactory

  // exact key counts from the store — lets a small control table
  // broadcast, same honesty as the kafka/memory scans
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val rows =
      if (opts.keyFormat == "zset") RedisStore.zcard(opts.keyName)
      else RedisStore.scanKeys(opts.matchGlob).length.toLong
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * 256L)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }
}

class RedisKvReaderFactory extends PartitionReaderFactory with Serializable {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (keys, valueFormat) = p match {
      case RedisZRange(k, s, e, vf) => (RedisStore.zrange(k, s, e), vf)
      case RedisScanAll(glob, vf) => (RedisStore.scanKeys(glob), vf)
    }
    new PartitionReader[InternalRow] {
      private val it = keys.iterator
      private var row: InternalRow = _
      override def next(): Boolean = {
        row = null
        while (row == null && it.hasNext) {
          val k = it.next()
          val kUtf = UTF8String.fromString(k)
          if (valueFormat == "hash") {
            // a key deleted (or re-typed) between discovery and fetch
            // skips the row — RedisRecordCursor.java:343-349
            RedisStore.hgetAll(k).foreach { m =>
              val entries = m.toSeq.sortBy(_._1)
              val vlen = entries.map { case (f, v) =>
                f.length.toLong + v.length.toLong
              }.sum
              row = InternalRow(kUtf, null,
                ArrayBasedMapData(
                  entries.map(e => UTF8String.fromString(e._1)).toArray,
                  entries.map(e => UTF8String.fromString(e._2)).toArray),
                k.length.toLong, vlen)
            }
          } else {
            RedisStore.get(k).foreach { v =>
              row = InternalRow(kUtf, UTF8String.fromString(v), null,
                k.length.toLong, v.length.toLong)
            }
          }
        }
        row != null
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
