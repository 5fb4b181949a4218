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
