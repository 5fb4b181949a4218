package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access for the TPC-H-ish testdata (see TESTDATA.md).
  *
  * Mirrors the reference's catalog layer (PrestoDB's connector catalog,
  * `presto-spi/.../ConnectorTableMetadata.java`) in the idiomatic-Spark way:
  * parquet-backed temp views in the session catalog, letting Catalyst drive
  * pushdown/pruning into the scan.
  *
  * Scale notes: at 100 TB these would be partitioned/bucketed external tables
  * (e.g. `orders` bucketed by `o_orderkey`, date-partitioned on
  * `o_orderdate`), but the read path below — `spark.read.parquet` + catalyst
  * filter/column pushdown — is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One raw DataFrame for a fixture table. */
  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // Temp views are session-global, so track the single sfDir currently
  // registered per session and re-register on any change — a Set of
  // (session, dir) pairs would let a stale dir hit the cache and silently
  // serve another scale factor's data (r1 ADVICE). Keyed by the session
  // reference itself rather than identityHashCode, which can be reused
  // after GC and wrongly skip registration for a new session. Weak keys so
  // stopped sessions aren't pinned for the JVM lifetime (sessions have no
  // equals override, so WeakHashMap's equals-based lookup IS identity).
  private val registered = new java.util.WeakHashMap[SparkSession, String]()

  /** Registers every fixture table as a temp view named after the table. */
  def register(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (registered.get(spark) != sfDir) {
      // events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
      // read the raw int64 nanos and convert to a microsecond timestamp
      // (integer division — nanos-since-2024 exceed double precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        val raw = df(spark, sfDir, n)
        val v =
          if (n == "events")
            raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
          else raw
        v.createOrReplaceTempView(n)
      }
      registered.put(spark, sfDir)
    }
  }

  /** Registers views and returns the named table. */
  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }
}
