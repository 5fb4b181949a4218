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
    * r17 OPT (guide §1.2/§2.4): centroids are √n rows — MODEL-SIZED —
    * so the argmax runs ROW-LOCALLY against the collected centroid set
    * ([[graft.functions.NearestCentroid]] — the same fused cosine fold
    * and the same smallest-cent_id tie contract as qb4) instead of the
    * former broadcast cross join + `max(struct(...))` re-aggregation,
    * which pushed n·k joined rows (with the full embedding payload in
    * the aggregation buffer) through a hash aggregate per round. No
    * join, no exchange: one fused cosine loop per vector row — the
    * assignment kernel a production Lloyd iteration ships to workers. */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.{NearestAssign, NearestAssignColumns}
    val model: Array[NearestAssign.Entry] = NearestAssign.entriesOf(
      cents.select(col("cent_id").cast("long"), col("ce")).collect()
        .toSeq.map(r => (r.getLong(0),
          r.getAs[scala.collection.Seq[Double]](1).toSeq)))
    e.withColumn("graft_km_asn",
        NearestAssignColumns.nearestCentroid(col("e"), model))
      .filter(col("graft_km_asn").isNotNull) // join form: empty cents
      .select(col("vec_id"), col("e"),
        col("graft_km_asn.id").as("cent_id"),
        col("graft_km_asn.score").as("cd"))
  }

  /** Σ(1−cos) of an assignment, as a single-row frame. */
  def inertia(assigned: DataFrame, name: String): DataFrame =
    assigned.agg(sum(lit(1.0) - col("cd")).as(name))
}
