package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming NEAR-duplicate suppression — the online-LSH complement to
  * [[StreamingDedup]] (exact keys) and the batch MinHash family
  * (`operators/MinHash.scala`): an ingestion firehose drops an arriving
  * document when it is a *near*-copy of one already admitted, with
  * keyed state and without ever forming candidate pairs. State growth
  * follows the [[StreamingDedup]] physics: [[firstArrival]] remembers
  * every claimed band key (exact-forever suppression cannot forget —
  * O(distinct band keys admitted)); [[firstArrivalWithin]] is the
  * horizon-bounded production arm for unbounded streams (claims expire
  * with the watermark — O(band keys in horizon)).
  *
  * Algorithm (the standard greedy online-LSH dedup, insert-all-bands
  * variant): each document carries `bands` LSH band keys derived from a
  * MinHash signature over its word shingles. A band key's FIRST arrival
  * claims it; a document is ADMITTED iff it claims every one of its
  * band keys, and dropped otherwise (some band was seen before — i.e. a
  * probable near-dup of an earlier arrival). Insert-all means a dropped
  * document's remaining bands still claim their buckets — the variant
  * whose kept-set is order-deterministic and replayable in plain SQL,
  * which is what makes the differential oracle possible (the
  * kept-if-kept-predecessor variant needs a sequential scan).
  *
  * Spark-native, no custom state machinery:
  *   - band keys are ROW-LOCAL columns (shingle → per-seed md5-derived
  *     60-bit hash → array_min → band concat), so the stream pays one
  *     projection, no per-doc aggregation;
  *   - first-arrival claiming is Structured Streaming's own stateful
  *     dedup on (band, band_key) — strict-forever in [[firstArrival]],
  *     watermark-evicted (bounded) in [[firstArrivalWithin]];
  *   - admission is a downstream windowed count (claims == bands),
  *     Spark 4's chained-stateful-operator support.
  *
  * Scale: a 100 TB/day firehose shuffles |docs|×bands small rows by
  * band key (horizon-bounded state on the [[firstArrivalWithin]]
  * arm) — no pair expansion, no
  * corpus join. The md5-derived hash mirrors `MinHash.simhashChunks`'s
  * oracle-reproducibility choice (`('0x'||substr(md5(f),1,15))::BIGINT`
  * in DuckDB); a production deployment would swap in xxhash64 (same
  * shape, ~3x cheaper) once differential testing is done.
  *
  * Reference grounding: the building blocks are the reference's
  * n-gram/minhash scalar surfaces (presto-main ArrayFunctions /
  * MathFunctions); the composed online pipeline is the MMDS banding
  * construction run incrementally.
  */
object StreamingNearDup {

  /** Array of `bands` band-key strings for one document's text — a
    * row-local Column (usable on an unbounded stream): distinct word
    * k-shingles md5-hashed ONCE each, `numHashes` universal-family
    * remixes minimized per seed, `numHashes / bands` consecutive slots
    * per band concatenated. One native pass per row
    * ([[graft.functions.MinHashBandKeys]] — the composed HOF form
    * re-digested every shingle per seed and read 14 s on the 5000-doc
    * fixture; the native pass is sub-second on the same plan). NULL
    * when the text has fewer than k words. */
  def bandKeyArray(text: Column, numHashes: Int, bands: Int,
      k: Int): Column =
    graft.functions.TextExpressions
      .minHashBandKeys(text, k, numHashes, bands)

  /** (input columns..., band int, band_key string) — one row per band
    * per document with at least one shingle. Documents shorter than k
    * words have NO shingles hence no band rows: they carry no near-dup
    * evidence and are always admitted (the `MinHash.signatures`
    * empty-shingle convention). */
  def bandKeys(df: DataFrame, textCol: String, numHashes: Int,
      bands: Int, k: Int): DataFrame = {
    val keyed = df
      .withColumn("graft_nd_keys",
        bandKeyArray(col(textCol), numHashes, bands, k))
      .filter(col("graft_nd_keys").isNotNull)
    val passthrough = df.columns.filter(_ != textCol).map(col).toSeq
    keyed.select(passthrough :+
      posexplode(col("graft_nd_keys")).as(Seq("band", "band_key")): _*)
  }

  /** Online near-dup suppression on a STREAM: emits the ADMITTED
    * documents' (idCol, window start). First-arrival claims ride
    * `dropDuplicates` under the watermark; admission finalizes when the
    * watermark closes the document's window (claims == bands).
    * Shingle-less documents (< k words) carry no bands and never enter
    * the claim pipeline — a caller admits them directly (union), the
    * same always-kept convention the batch twin reports for them. */
  def firstArrival(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, horizon: String, windowLen: String,
      numHashes: Int = 12, bands: Int = 4, k: Int = 3): DataFrame = {
    val claims = bandKeys(
      stream.select(col(idCol), col(tsCol), col(textCol)),
      textCol, numHashes, bands, k)
      .withWatermark(tsCol, horizon)
      .dropDuplicates("band", "band_key")
    claims.groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("claimed"))
      .filter(col("claimed") === bands)
      .select(col(idCol), col("window.start").as("w_start"))
  }

  /** Re-admitting variant: claims expire past the horizon of the
    * claiming sighting (`dropDuplicatesWithinWatermark`) — the re-crawl
    * semantics where the same boilerplate a month later is fresh. */
  def firstArrivalWithin(stream: DataFrame, idCol: String,
      textCol: String, tsCol: String, horizon: String, windowLen: String,
      numHashes: Int = 12, bands: Int = 4, k: Int = 3): DataFrame = {
    val claims = bandKeys(
      stream.select(col(idCol), col(tsCol), col(textCol)),
      textCol, numHashes, bands, k)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("band", "band_key")
    claims.groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("claimed"))
      .filter(col("claimed") === bands)
      .select(col(idCol), col("window.start").as("w_start"))
  }

  /** Deterministic batch twin under ordered replay (arrival = idCol
    * order): per document, how many of its band keys it claims first
    * (min idCol over the band bucket), and whether it is admitted
    * (claims every band; shingle-less documents admitted with 0
    * bands). One shuffle on (band, band_key) + one on idCol — never a
    * pair join. */
  def firstArrivalBatch(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 12, bands: Int = 4, k: Int = 3): DataFrame = {
    val keys = bandKeys(docs.select(col(idCol), col(textCol)),
      textCol, numHashes, bands, k)
    val wB = Window.partitionBy(col("band"), col("band_key"))
    val perDoc = keys
      .withColumn("fid", min(col(idCol)).over(wB))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bands"),
        sum(when(col("fid") === col(idCol), 1L).otherwise(0L))
          .as("first_bands"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bands"), lit(0L)).as("n_bands"),
        coalesce(col("first_bands"), lit(0L)).as("first_bands"),
        (coalesce(col("n_bands"), lit(0L)) ===
          coalesce(col("first_bands"), lit(0L))).as("kept"))
  }
}
