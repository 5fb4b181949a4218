package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries.
  *
  * Each entry in `defs` is a Spark implementation; a same-keyed entry in
  * `oracles` is ANSI SQL that DuckDB runs over the identical parquet tables
  * for the differential-oracle check (the Spark analog of PrestoDB's H2
  * differential harness, `presto-tests/.../H2QueryRunner.java:101`).
  * Keys present in `defs` but absent from `oracles` get the driver's weaker
  * rows-only check (used for non-SQL-expressible ops like LSH dedup).
  *
  * Column names and types must line up between the two sides — the driver
  * sorts columns by name before hashing values.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracles: Map[String, String]
}
