package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presto aggregate functions Spark lacks as built-ins, expressed as
  * compositions of built-in (codegen'd, partial-aggregatable) aggregates —
  * the Spark-first preference over opaque UDAFs, which would break
  * whole-stage codegen and map-side combine.
  *
  * Reference implementations:
  *  - geometric_mean: `presto-main/.../aggregation/DoubleGeometricMeanAggregations.java`
  *  - entropy: `presto-main/.../aggregation/EntropyAggregation.java`
  *  - checksum: `presto-main/.../aggregation/ChecksumAggregationFunction.java`
  *    (order-independent XOR of per-row hashes)
  *  - bool_and/bool_or: `BooleanAndAggregation.java` / `BooleanOrAggregation.java`
  *  - count_if: `CountIfAggregation.java`
  *
  * Each expands to sums/avgs that Spark executes as partial+final hash
  * aggregation — at 100 TB every one of these is a single shuffle of
  * small partial states, identical in shape to Presto's
  * partial/final Step machinery (`AggregationNode.Step`).
  */
object PrestoAggregates {

  /** exp of the mean of logs; matches Presto geometric_mean for x > 0. */
  def geometricMean(c: Column): Column = exp(avg(log(c)))

  /** Shannon entropy (bits) of a distribution given per-row counts `c`:
    * -Σ (c/S) log2 (c/S)  =  log2(S) - Σ c·log2(c) / S,  S = Σc.
    * Streaming-safe: two sums, no per-group state beyond two doubles.
    */
  def entropy(c: Column): Column = {
    val cd = c.cast("double")
    val s = sum(cd)
    val weighted = sum(when(cd > 0, cd * log(2.0, cd)).otherwise(lit(0.0)))
    when(s > 0, log(2.0, s) - weighted / s).otherwise(lit(0.0))
  }

  /** Order-independent checksum: XOR of a 60-bit hash of each row value.
    * Uses md5 (available in every engine) so the differential oracle can
    * reproduce it; Presto uses xxhash64 internally — same contract
    * (commutative, associative, drop-in for distributed merge).
    */
  def checksum(c: Column): Column =
    bit_xor(conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long"))

  /** Presto count_if / bool_and / bool_or (Spark has these since 3.5;
    * aliased here under the Presto names for registry completeness). */
  def countIf(c: Column): Column = count_if(c)
  def boolAnd(c: Column): Column = bool_and(c)
  def boolOr(c: Column): Column = bool_or(c)
}
