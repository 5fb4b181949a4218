package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * transitive-closure step of duplicate clustering (bucket/candidate
  * pairs → clusters), the piece that turns pairwise near-dup evidence
  * (MinHash/SimHash/TF-IDF buckets) into keep-one-per-cluster decisions.
  *
  * Algorithm: every vertex starts labeled with itself; each round, a
  * vertex takes the min of its own and its neighbors' labels; stop when
  * no label changes (or maxIter). Deterministic for any edge order —
  * min is order-independent — so results are gate-checkable against a
  * recursive-CTE oracle.
  *
  * Scale: one shuffle join + partial-min aggregation per round; round
  * count is the graph diameter, and dedup-bucket graphs (stars to each
  * bucket's representative) have tiny diameters regardless of corpus
  * size. Lineage is truncated every round (localCheckpoint — swap for
  * checkpoint(dir) on a cluster), and the convergence check is a scalar
  * count, not a data collect. For adversarial long-chain graphs swap in
  * the small-star/large-star rewrite (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) — same join primitive,
  * O(log n) rounds.
  */
object ConnectedComponents {

  /** edges: two columns `src`, `dst` (undirected; symmetrized here).
    * Returns (`v`, `c`): vertex → min vertex id of its component. Only
    * vertices appearing in an edge are returned — left-join and coalesce
    * for isolated-vertex semantics at the call site. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("c", col("v"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("dst") === labels("v"))
        .select(sym("src").as("v"), col("c"))
      val next = labels.union(prop)
        .groupBy(col("v")).agg(min(col("c")).as("c"))
        .localCheckpoint()
      changed = next.join(labels.select(col("v"), col("c").as("c0")), "v")
        .filter(col("c") =!= col("c0")).count()
      labels = next
      iter += 1
    }
    labels
  }
}
