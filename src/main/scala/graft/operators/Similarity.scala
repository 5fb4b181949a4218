package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity building blocks over embedding columns
  * (`array<float>`): deterministic random-hyperplane LSH bucketing plus
  * double-precision casting helpers shared by the ANN query pack.
  *
  * Reference semantics: PrestoDB exposes `cosine_similarity`
  * (`presto-main/.../scalar/MathFunctions.java`) and array math; the
  * bucketed composition is standard SimHash/random-projection LSH
  * (Charikar '02), the same family the reference's users run for ANN.
  *
  * Scale design: bucketing is per-row map work over the embedding array —
  * all built-in higher-order functions, fully inside whole-stage codegen,
  * no UDFs. Candidate generation downstream is an equi-join on the bucket
  * id, so shuffle volume grows linearly with corpus size (never an
  * all-pairs crossJoin). More planes → smaller buckets → higher precision,
  * lower recall; multiple plane-tables recover recall.
  *
  * Determinism: plane weights derive from md5("p_i") rather than an RNG so
  * the DuckDB differential oracle replays the identical planes
  * (`(('0x'||substr(md5(p||'_'||i),1,15))::BIGINT % 2001 - 1000)/1000.0`)
  * and both engines must produce the same buckets — recall loss cannot
  * hide from the correctness gate. A production deployment would swap in a
  * seeded Gaussian matrix; the plan shape is identical.
  */
object Similarity {

  /** Deterministic pseudo-random weight in [-1, 1] for plane `p`, dim `i`,
    * bit-reproducible in DuckDB SQL (see object doc). */
  def planeWeight(p: Int, i: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${p}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  /** Cast a float array column to double elementwise — all similarity math
    * must run in doubles so Spark and the oracle agree bit-for-bit. */
  def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Signed projection of a double-array embedding onto plane `p`.
    * Sequential left-to-right aggregate — same summation order as the
    * oracle's dot product, so the sign (all the bucket needs) matches. */
  def planeDot(emb: Column, p: Int, dims: Int): Column = {
    val w = array((0 until dims).map(i => lit(planeWeight(p, i))): _*)
    aggregate(zip_with(emb, w, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  }

  /** LSH bucket id: `planes` sign bits from planes [pFrom, pFrom+planes)
    * packed into a long. 2^planes buckets. */
  def bucket(emb: Column, pFrom: Int, planes: Int, dims: Int): Column =
    (0 until planes).map(j =>
      when(planeDot(emb, pFrom + j, dims) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Multi-table bucketing: `tables` independent bucket ids of
    * `planesPerTable` bits each, as (table, bucket) pairs for posexplode.
    * Recall at threshold θ: 1 - (1 - (1-θ/π)^planesPerTable)^tables. */
  def bucketTables(emb: Column, tables: Int, planesPerTable: Int,
                   dims: Int): Column =
    array((0 until tables).map(t =>
      bucket(emb, t * planesPerTable, planesPerTable, dims)): _*)
}
