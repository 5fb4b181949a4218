package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** HLL sketch types (SURVEY §2 #61, previously deferred): build, merge,
  * and estimate HyperLogLog sketches as first-class values — the Presto
  * `approx_set` / `merge` / `cardinality` workflow
  * (`presto-main/.../scalar/HyperLogLogFunctions.java`,
  * `aggregation/MergeHyperLogLogAggregation.java`), expressed with
  * Spark's Datasketches builtins (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`).
  *
  * Oracle strategy: sketch binaries are engine-specific, so queries emit
  * the exact cardinality plus tolerance booleans (the q85 pattern) —
  * estimator drift fails loudly. The merge query proves the re-aggregation
  * property that matters at scale: sketch per partition, union across
  * partitions, one small state per group ever shuffled.
  *
  * (qdigest/tdigest remain deferred: Spark ships no quantile-sketch type;
  * `percentile_approx` covers the use case in q85.)
  */
object Sketches extends QueryPack {

  override def defs: Map[String, Q] = Map(
    // Build + estimate per group, tolerance-checked against exact.
    "qa9_hll_sketch" -> ((s, dir) => {
      val li = Tables.view(s, dir, "lineitem")
      val est = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("l_partkey"), lit(12))).as("est"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.join(est, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("est") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("hll_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Merge: per-supplier partial sketches unioned per flag must estimate
    // the same cardinality as a direct sketch (re-aggregation soundness).
    "qb1_hll_merge" -> ((s, dir) => {
      val li = Tables.view(s, dir, "lineitem")
      val partials = li.groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      val merged = partials.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.join(merged, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("merged_est") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("merge_ok"))
        .orderBy(col("l_returnflag"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "qa9_hll_sketch" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS hll_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "qb1_hll_merge" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS merge_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
