package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directory tables — the Spark-native
  * re-expression of Raptor's shard organization
  * (`presto-raptor/src/main/java/com/facebook/presto/raptor/storage/
  * organization/CompactionSetCreator.java:60-96`, `ShardCompactor.java`):
  * the managed-storage maintenance pass that fixes the small-files
  * problem a long-lived ingesting table accumulates.
  *
  * Faithful pieces:
  *   - '''Compaction sets''' form exactly like the reference's
  *     `buildCompactionSets`: shards (files) sort ascending by size,
  *     then pack greedily until adding the next file would exceed
  *     `maxBytes` OR `maxRows` (`CompactionSetCreator.java:75-76`) —
  *     a set then finalizes and a new one starts. Sets with a single
  *     file are left alone (`addToCompactionSets`: only >1-shard sets
  *     organize), so already-compacted files are never rewritten —
  *     the pass is idempotent.
  *   - '''Execution''': each set's files are read together and
  *     rewritten as ONE file (the reference's OrganizationJob runs
  *     ShardCompactor over the set); source files are deleted only
  *     AFTER the replacement file is committed — the crash-safe order
  *     (a crash between write and delete leaves duplicates visible,
  *     which the reference prevents with its metadata transaction;
  *     without a transaction log this pass is a MAINTENANCE-WINDOW
  *     operation, documented, exactly like `VACUUM`/`OPTIMIZE` on
  *     log-less tables).
  *
  * Scale: per-file row counts come straight from each parquet FOOTER
  * (one O(KB) metadata read per file, no data pages touched, no Spark
  * job) — the same place the reference's shard metadata keeps
  * `row_count`; set planning is driver-side over the FILE list
  * (thousands of entries, not rows), O(files log files); each set
  * rewrite is a distributed job over just that set's files. At 100 TB
  * the pass compacts a day's ingest partition-by-partition; the
  * reference's temporal bucketing (`getShardsByDaysBuckets`) is the
  * same idea — run this per partition directory.
  */
object Compaction {

  final case class FileInfo(path: String, bytes: Long, rows: Long)

  final case class Summary(filesBefore: Long, filesAfter: Long,
      setsCompacted: Long, rowsBefore: Long, rowsAfter: Long)

  /** Per-file sizes and row counts of a parquet directory table.
    * Row counts read from each file's parquet footer — a metadata-only
    * O(KB) read per file, no data pages, no Spark job (the reference
    * reads `row_count` off its shard-metadata table the same way). */
  def fileInfos(spark: SparkSession, dir: String): Seq[FileInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf))
        val rows = try reader.getRecordCount finally reader.close()
        FileInfo(s.getPath.toUri.toString, s.getLen, rows)
      }
  }

  /** Greedy compaction-set planning, `CompactionSetCreator` semantics:
    * sort ascending by size, pack until the NEXT file would push the
    * set past either bound, finalize, continue. Only sets holding more
    * than one file are returned (single-file sets never rewrite). */
  def planSets(files: Seq[FileInfo], maxBytes: Long,
      maxRows: Long): Seq[Seq[FileInfo]] = {
    require(maxBytes > 0 && maxRows > 0,
      "compaction bounds must be positive")
    val sorted = files.sortBy(f => (f.bytes, f.path))
    val sets = scala.collection.mutable.ArrayBuffer.empty[Seq[FileInfo]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[FileInfo]
    var bytes = 0L; var rows = 0L
    sorted.foreach { f =>
      if (cur.nonEmpty &&
          (bytes + f.bytes > maxBytes || rows + f.rows > maxRows)) {
        sets += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer.empty[FileInfo]
        bytes = 0L; rows = 0L
      }
      cur += f; bytes += f.bytes; rows += f.rows
    }
    if (cur.nonEmpty) sets += cur.toSeq
    sets.filter(_.size > 1).toSeq
  }

  /** Compact a parquet directory in place: plan sets, rewrite each as
    * one file appended to the directory, then delete that set's source
    * files (write-then-delete order). Returns the before/after facts
    * the caller's gate pins. */
  def compact(spark: SparkSession, dir: String, maxBytes: Long,
      maxRows: Long): Summary = {
    val before = fileInfos(spark, dir)
    val sets = planSets(before, maxBytes, maxRows)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    sets.foreach { set =>
      spark.read.parquet(set.map(_.path): _*)
        .coalesce(1)
        .write.mode("append").parquet(dir)
      // replacement committed — now retire the sources (the reference
      // deletes old shards inside the same metadata transaction)
      set.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(f.path), false))
    }
    val after = fileInfos(spark, dir)
    Summary(before.size.toLong, after.size.toLong, sets.size.toLong,
      before.map(_.rows).sum, after.map(_.rows).sum)
  }
}
