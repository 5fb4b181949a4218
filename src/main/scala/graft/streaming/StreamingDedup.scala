package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming deduplication — the firehose half of the dedup family
  * (the batch arms are `queries/Dedup.scala` + `operators/MinHash
  * .scala`/`SemDeDup.scala`): an ingestion pipeline deduplicates
  * ARRIVING documents/events against what it has already admitted,
  * with BOUNDED state — the property that decides whether the operator
  * survives an unbounded 100 TB stream at all.
  *
  * Spark-native throughout (no custom state machinery): both arms ride
  * Structured Streaming's own stateful dedup operators. The two arms
  * trade exactness against state growth — the honest physics of
  * streaming dedup, not an implementation accident:
  *
  *   - [[firstArrival]]: `dropDuplicates(keys)` under a watermark —
  *     the first arrival of a key is emitted, every later duplicate is
  *     dropped FOREVER; events older than the watermark are late data
  *     and dropped outright. Exact global first-wins necessarily
  *     remembers every admitted key, and Spark only watermark-evicts
  *     dedup state when the event-time column is part of the key set —
  *     so this arm's state is O(distinct keys admitted), keyed state
  *     that grows with key cardinality (never O(stream rows)). Right
  *     when the key universe is bounded (entity ids) or the stream is
  *     a finite replay; on an unbounded 100 TB firehose, use the
  *     bounded arm below.
  *   - [[firstArrivalWithin]]: `dropDuplicatesWithinWatermark(keys)` —
  *     duplicates are suppressed only while they arrive WITHIN the
  *     horizon of the first sighting; a key re-appearing later than
  *     the horizon is re-admitted (the re-crawl / reprocessing-window
  *     semantics a training-data firehose wants when "the same URL a
  *     month later" counts as a fresh document). State IS
  *     watermark-evicted here — O(keys inside the horizon) — making
  *     this the production arm for unbounded streams.
  *
  * [[firstArrivalBatch]] is the deterministic batch twin the
  * differential gate checks: the exact rows an ordered replay (arrival
  * = (ts, id) order) of [[firstArrival]] emits — per key, the row with
  * the smallest (ts, tiebreak id). StreamingSuite drives the streaming
  * arms through a MemoryStream and proves them against the twin.
  */
object StreamingDedup {

  /** First-arrival exact dedup on a STREAM: one state entry per
    * DISTINCT KEY EVER ADMITTED (exact-forever suppression cannot
    * forget; the watermark bounds late DATA, not this operator's
    * state — see the class note). Bounded-state variant:
    * [[firstArrivalWithin]]. */
  def firstArrival(stream: DataFrame, keys: Seq[String], tsCol: String,
      horizon: String): DataFrame =
    stream.withWatermark(tsCol, horizon).dropDuplicates(keys)

  /** Re-admitting dedup: duplicates suppressed only within `horizon`
    * of the retained sighting; later re-appearances pass. */
  def firstArrivalWithin(stream: DataFrame, keys: Seq[String],
      tsCol: String, horizon: String): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Deterministic batch twin of [[firstArrival]] under ordered
    * replay: per key the smallest (tsCol, idCol) row survives. */
  def firstArrivalBatch(df: DataFrame, keys: Seq[String], tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("graft_dedup_rn", row_number().over(w))
      .filter(col("graft_dedup_rn") === 1)
      .drop("graft_dedup_rn")
  }
}
