package graft

import org.apache.spark.sql.SparkSession

/** Session construction — one place for the engine's Spark configuration.
  *
  * Local defaults mirror what the cluster deployment would set, scaled to
  * one machine:
  *  - `shuffle.partitions` = cores (cluster: ~2-3x total executor cores;
  *    AQE coalesces down, so err high at scale)
  *  - AQE on (default in Spark 4): runtime re-plan, skew-join splitting,
  *    partition coalescing — the mechanisms this engine leans on instead
  *    of hand-scheduling (SURVEY §4)
  *  - `codegen.maxFields` raised so the wide sketch aggregates (64-min
  *    minhash, 60-sum simhash) stay in whole-stage codegen
  *  - UTC session timezone (the oracle compares timestamps)
  *
  * At 100 TB additionally set `spark.sql.files.maxPartitionBytes` (128-256
  * MB so a scan task's columns fit in memory), bucket the fact tables on
  * their join keys, and leave `autoBroadcastJoinThreshold` defaulted — the
  * query packs place explicit `broadcast()` hints where dimension sides
  * are known-small.
  */
object Sessions {

  def local(cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      // Generated-class cache sized to the whole query surface (~100
      // queries x several stages); the 100-entry default thrashes when a
      // session runs the full pack and re-pays janino compilation.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      // r17 OPT: ObjectHashAggregate falls back to SORT-based
      // aggregation past 128 in-memory keys per task — the
      // per-(flag,suppkey) partial sketch passes (3000 groups: qc7/qi9
      // qdigest/tdigest partials, qb1 HLL partials) each paid a full
      // input sort in that fallback (~1.0 s of a 1.9 s gate at sf0.1).
      // Graft's sketch states are KB-bounded by construction (buffered
      // inserts compress at fixed limits), so thousands of in-memory
      // states per task are safe at any scale — group count per task,
      // not data volume, is what this bounds; the sort fallback still
      // engages beyond it.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // analysis-time zoned-instant rewrite (literal-literal
      // comparisons must rewrite BEFORE constant folding; the
      // optimizer-rule installation covers driver-built sessions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Presto's tpch-catalog spelling: SELECT ... FROM graft_tpch.tiny.orders
      .config("spark.sql.catalog.graft_tpch", "graft.sources.TpchCatalog")
      // Presto's jmx catalog: SELECT ... FROM graft_jmx.current.`java.lang:type=runtime`
      .config("spark.sql.catalog.graft_jmx", "graft.sources.JmxCatalog")
      // Presto's tpcds catalog: SELECT ... FROM graft_tpcds.tiny.store_sales
      .config("spark.sql.catalog.graft_tpcds", "graft.sources.TpcdsCatalog")
      // The writable memory catalog (presto-memory MemoryMetadata):
      // CREATE/INSERT/ALTER ... RENAME|DROP|ADD COLUMN / RENAME TO / DROP
      .config("spark.sql.catalog.graft_mem", "graft.sources.MemCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARNs (WindowExec "No Partition Defined" on
    // VALUES-scale semantic-lock windows) flood the driver's few-KB stdout
    // tail capture and have crowded out the Bench metric line.
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
