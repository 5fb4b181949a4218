package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** TableWriter / CTAS coverage (SURVEY §2 #4): write a derived table to
  * parquet — partitioned, the way a 100 TB deployment lays out event/date
  * data — then read it back through the scan path.
  *
  * Reference: Presto's `TableWriterOperator` + `TableFinishOperator`
  * (`presto-main/.../operator/TableWriterOperator.java`) with
  * INSERT/CTAS commit semantics; Spark's equivalent is the
  * `DataFrameWriter` commit protocol (staging + atomic rename), which is
  * what `.write.parquet` exercises here, including dynamic partition
  * layout (`partitionBy`).
  *
  * The oracle recomputes the same derivation directly — so the round-trip
  * (write → commit → scan, including partition-column reconstruction from
  * directory values) must be lossless to pass.
  */
object Storage extends QueryPack {

  /** CTAS output path, keyed by fixture dir AND Spark application id:
    * concurrent JVMs against the same fixture (Bench + Verify, parallel
    * test runs) must never race on one directory with mode=overwrite
    * (ADVICE r3). Within one session the path is stable, so tests can
    * read back what the query wrote. */
  def ctasPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_ctas_${Integer.toHexString(dir.hashCode)}_" +
        s.sparkContext.applicationId).getAbsolutePath

  override def defs: Map[String, Q] = Map(
    "qa8_ctas_roundtrip" -> ((s, dir) => {
      val out = ctasPath(s, dir)
      val derived = Tables.view(s, dir, "lineitem")
        .filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag"),
          year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 4).as("revenue"))
      derived.write.mode("overwrite").partitionBy("ship_year").parquet(out)
      s.read.parquet(out)
        .select(col("l_returnflag"), col("ship_year").cast("int"),
          col("n"), col("revenue"))
        .orderBy(col("l_returnflag"), col("ship_year"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "qa8_ctas_roundtrip" ->
      """SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
        |  count(*) AS n, round(sum(l_extendedprice), 4) AS revenue
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
