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
  * Structured Streaming's own stateful dedup operators, whose state
  * store is keyed by the dedup columns and EVICTED by the watermark —
  * state size is O(keys inside the horizon), not O(stream).
  *
  *   - [[firstArrival]]: `dropDuplicates(keys)` under a watermark —
  *     the first arrival of a key is emitted, every later duplicate is
  *     dropped; events older than the watermark are late data and
  *     dropped outright (so the state horizon is also the correctness
  *     horizon — the reference semantics of a keyed first-wins dedup).
  *   - [[firstArrivalWithin]]: `dropDuplicatesWithinWatermark(keys)` —
  *     duplicates are suppressed only while they arrive WITHIN the
  *     horizon of the first sighting; a key re-appearing later than
  *     the horizon is re-admitted (the re-crawl / reprocessing-window
  *     semantics a training-data firehose wants when "the same URL a
  *     month later" counts as a fresh document).
  *
  * [[firstArrivalBatch]] is the deterministic batch twin the
  * differential gate checks: the exact rows an ordered replay (arrival
  * = (ts, id) order) of [[firstArrival]] emits — per key, the row with
  * the smallest (ts, tiebreak id). StreamingSuite drives the streaming
  * arms through a MemoryStream and proves them against the twin.
  */
object StreamingDedup {

  /** First-arrival exact dedup on a STREAM: one state entry per key
    * inside the watermark horizon, evicted as the watermark passes. */
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
