package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{VectorAvg, VectorExpressions}

/** Product quantization for ANN search (Jégou, Douze & Schmid 2011,
  * "Product Quantization for Nearest Neighbor Search", IEEE TPAMI —
  * the IVF-PQ recipe every billion-scale vector index uses): split
  * each d-dim vector into m contiguous d/m-dim sub-vectors, train an
  * independent k-codeword codebook per subspace (Lloyd, the same
  * deterministic machinery as [[KMeans]]: stride seeds, no RNG,
  * smallest-cid tie-breaks), and ENCODE each vector as its m nearest
  * codeword ids — m·log₂(k) bits instead of d floats (64-dim float64
  * at m=8, k=16 compresses 512 bytes → 4). Queries never decode:
  * asymmetric distance computation (ADC) precomputes one m×k table of
  * sub-distances per probe and scores a candidate by summing m table
  * lookups.
  *
  * Spark-first shape, and why it scales:
  *  - codes live in LONG FORM (vec_id, j, cid) — a compact columnar
  *    table; ADC is a BROADCAST join of the m×k×|probes| distance
  *    table onto it with a map-side-partial sum per (probe, vec): no
  *    shuffle of vectors, one aggregate of 8-byte rows.
  *  - codebooks are m×k rows (KBs at any corpus size) — trained with
  *    broadcast assignment scans + the `vector_avg` mergeable
  *    aggregate; driver state stays model-sized.
  *  - queries follow the standard two-stage path: ADC produces a
  *    SHORTLIST (top tens of candidates by approximate distance), the
  *    shortlist alone is re-ranked with exact arithmetic — full
  *    vectors are touched only for shortlist rows (q2e's gate makes
  *    shortlist recall the pass bar: the re-ranked top-1 must equal
  *    the exact nearest neighbor).
  *  - at 100 TB, compose with the IVF cell index (qk6): route probes
  *    to nprobe cells, ADC-score only those cells' codes — this module
  *    is the within-cell scorer of a standard IVF-PQ index.
  */
object Pq {

  /** (vec_id, e) → (vec_id, j, sv): the m contiguous sub-vectors. */
  def subVectors(e: DataFrame, m: Int, d: Int): DataFrame = {
    require(d % m == 0, s"d=$d must split evenly into m=$m subspaces")
    val sub = d / m
    val parts = (0 until m).map { j =>
      struct(lit(j).as("j"), slice(col("e"), j * sub + 1, sub).as("sv"))
    }
    e.select(col("vec_id"), explode(array(parts: _*)).as("p"))
      .select(col("vec_id"), col("p.j").as("j"), col("p.sv").as("sv"))
  }

  /** Deterministic seeds — the vec_id-stride sample per subspace
    * (dense cids via integer division; contiguous fixture ids). */
  def seeds(subs: DataFrame, stride: Long): DataFrame =
    subs.filter(col("vec_id") % stride === 0)
      .select(col("j"), (col("vec_id") / stride).cast("long").as("cid"),
        col("sv").as("cv"))

  /** Nearest-codeword assignment per (vec_id, j): min squared L2,
    * ties to the smallest cid. r17 OPT (guide §1.2/§2.4): the codebook
    * is model-sized (m·k rows, KBs at any corpus scale — header), so
    * the argmin runs ROW-LOCALLY against the collected codebook
    * ([[graft.functions.NearestCodeword]] — identical d2 composition
    * and tie order) instead of the former broadcast join + struct-max
    * re-aggregation, which pushed n·k joined rows through a hash
    * aggregate per pass (2M rows / ~0.65 s per PQ pass at sf0.1). No
    * join, no exchange: one fused distance loop per sub-vector row —
    * the plan a production PQ encoder runs (codebooks ship to workers,
    * vectors never fan out k-fold). */
  def assign(subs: DataFrame, codebook: DataFrame): DataFrame = {
    import graft.functions.{NearestAssign, NearestAssignColumns}
    val model: Map[Int, Array[NearestAssign.Entry]] = codebook
      .select(col("j"), col("cid").cast("long"), col("cv"))
      .collect()
      .groupBy(_.getAs[Number]("j").intValue())
      .map { case (j, rows) =>
        j -> NearestAssign.entriesOf(rows.toSeq.map(r =>
          (r.getAs[Number]("cid").longValue(),
            r.getAs[scala.collection.Seq[Double]]("cv").toSeq)))
      }
    subs
      .withColumn("graft_pq_asn",
        NearestAssignColumns.nearestCodeword(col("j"), col("sv"), model))
      .filter(col("graft_pq_asn").isNotNull) // join form: unmatched j drops
      .select(col("vec_id"), col("j"), col("sv"),
        col("graft_pq_asn.id").as("cid"),
        col("graft_pq_asn.score").as("d2"))
  }

  /** Codebook recompute from a MATERIALIZED assignment — callers that
    * also read the assignment (distortion, codes) checkpoint it once
    * and pay each Lloyd scan a single time. */
  def stepFrom(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("j"), col("cid"))
      .agg(VectorAvg.agg(col("sv")).as("cv"))
      .localCheckpoint()

  /** One Lloyd round per subspace: assign, recompute means, truncate
    * lineage. */
  def step(subs: DataFrame, codebook: DataFrame): DataFrame =
    stepFrom(assign(subs, codebook))

  def train(subs: DataFrame, stride: Long, iters: Int): DataFrame =
    (1 to iters).foldLeft(seeds(subs, stride))((cb, _) => step(subs, cb))

  /** Σ d2 of an assignment — the Lloyd objective, one row. */
  def distortion(assigned: DataFrame, name: String): DataFrame =
    assigned.agg(sum(col("d2")).as(name))

  /** The PQ code in long form: (vec_id, j, cid). */
  def encode(subs: DataFrame, codebook: DataFrame): DataFrame =
    assign(subs, codebook).select(col("vec_id"), col("j"), col("cid"))

  /** The per-probe ADC table: (probe_id, j, cid, pd2) — m×k rows per
    * probe, squared sub-distance probe-subvector → codeword. */
  def adcTable(probeSubs: DataFrame, codebook: DataFrame): DataFrame =
    probeSubs
      .select(col("vec_id").as("probe_id"), col("j"), col("sv").as("psv"))
      .join(broadcast(codebook), Seq("j"))
      .withColumn("pd2", exactD2(col("psv"), col("cv")))
      .select(col("probe_id"), col("j"), col("cid"), col("pd2"))

  /** ADC scoring: m table lookups summed per (probe, vector) — a
    * broadcast join on (j, cid) over the code table, partial-summed
    * map-side. (probe_id, vec_id, adc). */
  def adcDistances(codes: DataFrame, table: DataFrame): DataFrame =
    codes.join(broadcast(table), Seq("j", "cid"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adc"))

  /** Exact squared L2 from dot products — the composition an external
    * engine replays bitwise (`dot(a,a) + dot(b,b) - 2·dot(a,b)`). */
  def exactD2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    VectorExpressions.dot(a, a) + VectorExpressions.dot(b, b) -
      lit(2.0) * VectorExpressions.dot(a, b)
}
