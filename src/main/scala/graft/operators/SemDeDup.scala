package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PrestoScalars

/** Semantic deduplication — the SemDeDup recipe (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): k-means-cluster the embedding
  * space, call two documents semantic duplicates when their cosine
  * similarity inside a cluster exceeds a threshold, and keep ONE
  * representative per duplicate group — the paper keeps the example
  * with the LOWEST similarity to its cluster centroid (the "farthest
  * from the centroid" choice that preserves diversity).
  *
  * Composition over this repo's existing primitives: [[KMeans.assign]]
  * provides (vec_id, e, cent_id, cd); the duplicate test is a
  * cluster-blocked self-join (never all-pairs — the cluster is the
  * blocking unit, exactly the paper's reason for clustering first).
  *
  * Scale shape: with k clusters over n vectors the pair work is
  * Σ sizeᵢ² ≈ n²∕k — choose k ∝ n ∕ target-cluster-size so per-cluster
  * work stays bounded (the paper runs k = 110k on 5B embeddings); the
  * join shuffles on cent_id so each cluster's pairs materialize
  * partition-locally. A pathologically hot cluster is the same skewed
  * key MinHash's hot-bucket cap handles — cap cluster size upstream if
  * the embedding space collapses.
  *
  * Drop rule (deterministic): b is dropped when SOME a in the same
  * cluster has cos(a,b) ≥ τ and a ranks before b, where rank = (cd
  * ascending, vec_id ascending) — low centroid-similarity survives,
  * matching the paper's keep choice; a total order makes the kept set
  * unique regardless of plan shape.
  */
object SemDeDup {

  /** The operator's cluster-count INVARIANT, not a caller knob
    * (r11 verdict: the gate fixed k but the operator should assert
    * it): seeds stride ⌊√n⌋ → k ≈ ⌈√n⌉ centroids with expected
    * cluster size √n. With this engine's broadcast-assignment KMeans
    * the two halves of the work balance: assignment costs n·k
    * cosines, the cluster-blocked pair join costs Σ sizeᵢ² ≈ n²∕k —
    * total Θ(n^1.5), the MINIMUM of n·k + n²/k over k, and
    * subquadratic at any corpus size. A caller-chosen constant k
    * leaves the pair join quadratic as the corpus grows; a constant
    * cluster SIZE (k ∝ n) makes the pair join linear but blows the
    * broadcast assignment up to n²∕size — bounded-size clustering
    * only wins with a sub-linear assignment index, which is IVF-PQ's
    * job (q2k), not this operator's. OperatorsSuite locks the
    * resulting pair-count growth at ≈10^1.5 per 10× corpus. */
  def sqrtStride(n: Long): Long =
    math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)

  /** Cluster with the √n invariant: (vec_id, e) → the
    * [[KMeans.assign]] frame this operator's [[dedup]] consumes.
    * Callers pass n (usually known from parquet metadata) so no extra
    * count scan is paid. */
  def assignSqrt(e: DataFrame, n: Long): DataFrame =
    KMeans.assign(e, KMeans.seeds(e, sqrtStride(n)))

  /** The whole recipe: √n-cluster, then drop τ-near duplicates. */
  def run(e: DataFrame, n: Long, tau: Double): DataFrame =
    dedup(assignSqrt(e, n), tau)

  /** Kept rows of `assigned` (the [[KMeans.assign]] output): drops every
    * vector that has an earlier-ranked τ-near neighbor in its cluster. */
  def dedup(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.select(col("cent_id"), col("vec_id").as("a_id"),
      col("e").as("ea"), col("cd").as("cda"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("b_id"),
      col("e").as("eb"), col("cd").as("cdb"))
    val drops = a.join(b, Seq("cent_id"))
      .filter(col("cda") < col("cdb") ||
        (col("cda") === col("cdb") && col("a_id") < col("b_id")))
      .filter(PrestoScalars.cosineSimilarity(col("ea"), col("eb")) >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(drops, Seq("vec_id"), "left_anti")
  }
}
