package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH / SimHash near-duplicate detection over a text corpus.
  *
  * The training-data-pipeline dedup operator family. Reference semantics:
  * Presto exposes the building blocks (`ngrams`, `minhash`-style set ops in
  * `presto-main/.../scalar/ArrayFunctions` + `MathFunctions.java` cosine);
  * the composed pipeline here is the standard MMDS construction
  * (shingle → minhash signature → banded LSH → bucket join → exact verify).
  *
  * Scale design (the whole point): candidate generation is a *bucket
  * equi-join* on (band index, band hash) — a plain shuffle join whose key
  * cardinality grows with corpus size, never an all-pairs crossJoin. At
  * 100 TB: shingling/minhashing is per-row map work (stays in whole-stage
  * codegen — every step below is built-in higher-order functions, no UDFs);
  * the band join shuffles |docs| × bands small rows; exact verification
  * touches only the candidate pairs. Skewed buckets (boilerplate docs) can
  * be salted or capped with a bucket-size limit before the self-join.
  */
object MinHash {

  /** Distinct word k-shingles of a text column (lowercase-free: fixture is
    * already normalized). n-k+1 shingles for n words. Native single-pass
    * expression — see `graft.functions.WordShingles` for why the
    * higher-order-function composition was replaced. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.TextExpressions.wordShingles(text, k)

  /** MinHash signatures via one explode + a codegen'd hash-aggregate:
    * (idCol, sig array<long>) from (idCol, "sh" array<string>).
    *
    * The shingle string is hashed ONCE (xxhash64), then the `numHashes`
    * independent functions are cheap long remixes `xxhash64(seed_i, h)`
    * minimized per document. Spark's higher-order functions
    * (transform/aggregate) are CodegenFallback — a per-seed `transform`
    * over the shingle array evaluates interpreted with per-element boxing
    * — so the hot path here is explode → hash → 64 `min` aggregates,
    * which stays in whole-stage codegen and gets map-side partial
    * aggregation for free at cluster scale.
    *
    * NOTE: documents with an EMPTY shingle array (fewer than k words)
    * produce no exploded rows and therefore NO signature row — the output
    * may have fewer rows than the input. Near-dup semantics are unchanged
    * (a doc with no shingles has Jaccard 0 against everything), but
    * consumers that count documents or join back by id must use the
    * original table, not the signature table (ADVICE r3). */
  def signatures(withShingles: DataFrame, idCol: String,
                 numHashes: Int): DataFrame = {
    val base = withShingles.select(col(idCol), explode(col("sh")).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    base.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Explode a signature into (band, band_hash) rows: `bands` groups of
    * `rowsPerBand` signature slots hashed together. A pair agreeing on any
    * full band lands in the same bucket. */
  def bandize(df: DataFrame, idCol: String, sigCol: String,
              bands: Int, rowsPerBand: Int): DataFrame = {
    val bandHashes = array((0 until bands).map { b =>
      xxhash64((0 until rowsPerBand).map(r =>
        element_at(col(sigCol), b * rowsPerBand + r + 1)): _*)
    }: _*)
    df.select(col(idCol), posexplode(bandHashes).as(Seq("band", "band_hash")))
  }

  /** Candidate pairs via the LSH bucket self-join (id_a < id_b, distinct).
    * This is the scale-critical step: an equi-join on (band, band_hash).
    *
    * `maxBucketSize` caps pathological buckets BEFORE the self-join: a
    * boilerplate-heavy corpus (license headers, templated pages) can put
    * millions of documents into one band bucket, and that single bucket's
    * O(size²) pair expansion would dominate the whole job. A bucket above
    * the cap is dropped — its members still reach each other through
    * their other (more selective) bands, the standard LSH treatment for
    * stop-shingles. The bucket-size window reuses the same hash
    * partitioning as the join, so the cap costs no extra shuffle. The
    * fixture corpus has no bucket anywhere near the default cap, so
    * q91/q92 output is unchanged; OperatorsSuite plants a hot bucket to
    * prove the bound. */
  def candidatePairs(banded: DataFrame, idCol: String,
                     maxBucketSize: Int = 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val bounded = banded
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")
    val a = bounded.select(col("band"), col("band_hash"), col(idCol).as("a_id"))
    val b = bounded.select(col("band"), col("band_hash"), col(idCol).as("b_id"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the shingle
    * sets; keeps pairs with similarity >= threshold. `withShingles` must
    * have (idCol, "sh"). Candidates are tiny relative to the corpus, so
    * both joins broadcast them. */
  def verifyJaccard(candidates: DataFrame, withShingles: DataFrame,
                    idCol: String, threshold: Double): DataFrame = {
    val sa = withShingles.select(col(idCol).as("a_id"), col("sh").as("sh_a"))
    val sb = withShingles.select(col(idCol).as("b_id"), col("sh").as("sh_b"))
    sa.join(broadcast(candidates), "a_id")
      .join(sb, "b_id")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_total", size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jac", col("n_common") / col("n_total"))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("n_common"), col("n_total"),
        round(col("jac"), 3).as("jac"))
  }

  /** 60-bit SimHash over shingle features. For each bit position, sums
    * +1/-1 according to the feature hash's bit, then packs sign bits into
    * 4 × 15-bit chunk columns (chunk0..chunk3): candidates at hamming
    * distance <= 3 are guaranteed to collide on at least one chunk
    * (pigeonhole). Input: (idCol, "sh" array<string>).
    *
    * The feature hash is the first 15 hex chars of md5 — reproducible in
    * DuckDB (`('0x'||substr(md5(f),1,15))::BIGINT`) so the differential
    * oracle can mirror the whole algorithm; a production deployment would
    * swap in `xxhash64` (same shape, ~3x cheaper). */
  def simhashChunks(withShingles: DataFrame, idCol: String): DataFrame = {
    val perFeature = withShingles
      .select(col(idCol), explode(col("sh")).as("f"))
      .withColumn("h", graft.functions.TextExpressions.md5Prefix60(col("f")))
    // 60 signed-sum aggregates; weight 1 per distinct shingle.
    val bitSums = (0 until 60).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$k"))
    val sums = perFeature.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    // Pack sign bits into 4 chunks of 15 bits.
    val chunks = (0 until 4).map { c =>
      (0 until 15).map { j =>
        when(col(s"b${c * 15 + j}") > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _).as(s"chunk$c")
    }
    sums.select(col(idCol) +: chunks: _*)
  }

  /** SimHash candidate pairs: collide on any equal chunk (chunk index is
    * part of the join key), then filter to hamming distance <= maxHamming
    * over the full 64 bits. Equi-join on (chunk idx, chunk value) — same
    * bucketed-shuffle shape as the MinHash band join. */
  def simhashCandidates(chunked: DataFrame, idCol: String,
                        maxHamming: Int): DataFrame = {
    val exploded = chunked.select(col(idCol), col("chunk0"), col("chunk1"),
        col("chunk2"), col("chunk3"),
        posexplode(array(col("chunk0"), col("chunk1"), col("chunk2"),
          col("chunk3"))).as(Seq("ci", "cv")))
    val a = exploded.select(col("ci"), col("cv"), col(idCol).as("a_id"),
      col("chunk0").as("a0"), col("chunk1").as("a1"),
      col("chunk2").as("a2"), col("chunk3").as("a3"))
    val b = exploded.select(col("ci"), col("cv"), col(idCol).as("b_id"),
      col("chunk0").as("b0"), col("chunk1").as("b1"),
      col("chunk2").as("b2"), col("chunk3").as("b3"))
    val hamming = (0 until 4).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"b$i")))).reduce(_ + _)
    a.join(b, Seq("ci", "cv"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id").distinct()
  }
}
