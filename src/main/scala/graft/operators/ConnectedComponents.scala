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
  * count, not a data collect. For adversarial long-chain graphs use
  * [[runStar]] — the alternating small-star/large-star rewrite
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): same join primitive, O(log n) double-rounds on a chain
  * instead of diameter rounds.
  */
object ConnectedComponents {

  /** edges: two columns `src`, `dst` (undirected; symmetrized here).
    * Returns (`v`, `c`): vertex → min vertex id of its component. Only
    * vertices appearing in an edge are returned — left-join and coalesce
    * for isolated-vertex semantics at the call site. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // r17 OPT: materialize the symmetrized edge set ONCE — every round
    // joins against it, and an un-truncated `sym` re-derived the
    // caller's whole edge pipeline (qf2: two window passes + distinct)
    // per round (guide §1.2: don't recompute what a pass already
    // produced; same lineage-truncation stance as the per-round labels)
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("c", col("v"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("dst") === labels("v"))
        .select(sym("src").as("v"), col("c"), lit(false).as("o"))
      // r17 OPT: carry the PREVIOUS label through the same aggregation
      // (each vertex's single self-row is tagged, so min(c where o) is
      // exactly the old label) — the convergence probe is then a scan
      // of the just-checkpointed result instead of a second
      // join+shuffle action per round (qf2 ran 58 jobs; ~2 fewer
      // stages per round).
      val next = labels.withColumn("o", lit(true)).union(prop)
        .groupBy(col("v")).agg(min(col("c")).as("c"),
          min(when(col("o"), col("c"))).as("c0"))
        .localCheckpoint()
      changed = next.filter(col("c") =!= col("c0")).limit(1).count()
      labels = next.select(col("v"), col("c"))
      iter += 1
    }
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al. SoCC'14) — same (`v`, `c`) contract as [[run]], but diameter-
    * independent: each large-star hangs every strictly-larger neighbor
    * of a node onto its neighborhood minimum, each small-star re-points
    * the smaller neighbors, and the edge set contracts toward per-
    * component stars in O(log n) double-rounds even on an n-chain
    * (where [[run]] needs n rounds). Use for long-chain / high-diameter
    * duplicate graphs; bucket-star graphs converge in 1-2 rounds under
    * either. Each phase is one groupBy + one equi-join — the same
    * shuffle shape as [[run]], so the 100 TB cost model is unchanged
    * per round with far fewer rounds. */
  def runStar(edges: DataFrame, maxIter: Int = 35): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("m0"))
        .select(col("src").as("u"),
          least(col("m0"), col("src")).as("m"))
      sym.join(mins, sym("src") === col("u"))
        .filter(col("dst") > sym("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient larger -> smaller; m = min of the strictly-smaller
      // neighborhood (always < the center, so min(N ∪ {u}) = min(N))
      val dir = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val mins = dir.groupBy(col("src")).agg(min(col("dst")).as("m"))
      dir.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    val vertices = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v"))).distinct()
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // fixpoint when the distinct edge sets match (two scalar counts —
      // no data collect; each except is one shuffle on the shrunken set)
      changed = next.except(e).limit(1).count() > 0 ||
        e.except(next).limit(1).count() > 0
      e = next
      iter += 1
    }
    // labeling from a non-fixpoint edge set would be silently wrong —
    // fail loudly instead (ADVICE r6); O(log n) double-rounds means 35
    // covers any graph that fits in storage
    require(!changed,
      s"connected components did not converge in $maxIter double-rounds")
    // converged edges are stars onto component minima: label = min of
    // self and neighbors; vertices absent from the final edge set are
    // their own component (singletons and fully-contracted minima)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val nbrMin = sym.groupBy(col("src")).agg(min(col("dst")).as("m"))
    vertices.join(nbrMin, vertices("v") === nbrMin("src"), "left")
      .select(col("v"),
        least(col("v"), coalesce(col("m"), col("v"))).as("c"))
  }
}
