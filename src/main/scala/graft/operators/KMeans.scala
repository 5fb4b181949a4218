package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PrestoScalars, VectorAvg}

/** Lloyd-iteration k-means over an embedding column — the coarse-quantizer
  * TRAINER for IVF ANN (qk6; qb4 uses the untrained stride quantizer this
  * upgrades). Deterministic by construction: seeds are the vec_id-stride
  * sample (no RNG), assignment ties break on cent_id, and the iteration
  * count is fixed — same stance as the md5-derived LSH planes.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - centroids stay √n rows — broadcast to every assignment scan;
  *  - assignment is ONE codegen'd scan per iteration (broadcast
  *    nested-loop + windowed argmax, no shuffle of the corpus);
  *  - centroid recompute is a map-side-partial `vector_avg` aggregate
  *    (O(k·d) state), NOT a posexplode of n·d rows;
  *  - lineage truncates per round (localCheckpoint — swap for
  *    checkpoint(reliable) on a cluster), the ConnectedComponents stance.
  *
  * The training objective (mean update + cosine assignment, unnormalized
  * means) is classic spherical k-means without the normalize step;
  * inertia Σ(1−cos) decreasing across rounds is asserted by the caller's
  * gate rather than assumed.
  */
object KMeans {

  /** Deterministic seeds: the vec_id-stride sample. (vec_id, e) →
    * (cent_id, ce). */
  def seeds(e: DataFrame, stride: Long): DataFrame =
    e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))

  /** One Lloyd round: assign, recompute means, truncate lineage. */
  def step(e: DataFrame, cents: DataFrame): DataFrame =
    assign(e, cents)
      .groupBy(col("cent_id"))
      .agg(VectorAvg.agg(col("e")).as("ce"))
      .localCheckpoint()

  /** Columns: in = (vec_id, e); out centroids = (cent_id, ce). */
  def train(e: DataFrame, stride: Long, iters: Int): DataFrame =
    (1 to iters).foldLeft(seeds(e, stride))((cents, _) => step(e, cents))

  /** Nearest-centroid assignment: (vec_id, e, cent_id, cd).
    *
    * The argmax is a `max(struct(cd, -cent_id, …))` aggregation, NOT a
    * window: all k candidate rows for a vector sit in the broadcast-join
    * output partition that produced them, so the map-side partial max
    * collapses k→1 in place and the exchange moves ONE compact row per
    * vector — a window (partitionBy vec_id, row_number) would shuffle
    * and sort the full n×k cross product instead. Ties break to the
    * smallest cent_id via the negated key, same contract as qb4. */
  def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("cd", PrestoScalars.cosineSimilarity(col("e"), col("ce")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cd"), (-col("cent_id")).as("neg_cent"),
        col("cent_id"), col("e"))).as("m"))
      .select(col("vec_id"), col("m.e").as("e"),
        col("m.cent_id").as("cent_id"), col("m.cd").as("cd"))

  /** Σ(1−cos) of an assignment, as a single-row frame. */
  def inertia(assigned: DataFrame, name: String): DataFrame =
    assigned.agg(sum(lit(1.0) - col("cd")).as(name))
}
