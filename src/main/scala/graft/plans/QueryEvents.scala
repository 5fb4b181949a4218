package graft.plans

import java.time.Instant
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** The reference's EventListener SPI — the plugin surface audit/
  * telemetry integrations hang off (`presto-spi/.../eventlistener/
  * EventListener.java`: queryCreated/queryCompleted/splitCompleted,
  * with the event shapes of QueryCreatedEvent/QueryCompletedEvent/
  * SplitCompletedEvent and their QueryContext/QueryMetadata/
  * QueryStatistics/QueryFailureInfo payloads) — re-expressed
  * Spark-first:
  *
  *   - '''queryCreated/queryCompleted''' fire from the statement
  *     router's own lifecycle (record → finish — the same transitions
  *     system.runtime.queries renders), with statistics aggregated
  *     from Spark's application status store for the statement's job
  *     group (the data system.runtime.tasks serves): CPU time, input
  *     rows/bytes, output rows/bytes, completed splits are REAL stage
  *     aggregates, not placeholders.
  *   - '''splitCompleted''' fires per completed Spark TASK (the
  *     engine's split) through a real `SparkListener`, correlated to
  *     its query by job group — exactly how the tasks table joins.
  *
  * Honest-subset note (documented, not stubbed): of the reference's
  *  executor-internal gauges, the two with faithful driver-side
  *  sources in Spark's status store ARE served — `peakTaskTotalMemory`
  *  (max over the statement's tasks of per-task peakExecutionMemory)
  *  and `stageGcStatistics` (per-stage aggregates of per-task
  *  jvmGcTime; Spark reports total GC, not a full-vs-minor split —
  *  see [[StageGcStatistics]]). The rest (user-vs-revocable memory
  *  split, operator summaries, resource distributions, cumulative
  *  memory) have no faithful driver-side source in local mode and are
  *  OMITTED from the event shape rather than reported as zeros;
  *  `uri`/`remoteClientAddress`/`userAgent` are wire-protocol fields
  *  a library has none of.
  *
  * Listener failures never fail the query: dispatch isolates each
  * listener call (the reference's event framework is fire-and-forget
  * off the query path the same way).
  */
object QueryEvents {

  // ——— event model (reference field names) ————————————————————————————

  final case class QueryContext(
      user: String,
      principal: Option[String],
      source: Option[String],
      clientTags: Set[String],
      catalog: Option[String],
      schema: Option[String],
      resourceGroupId: Option[Seq[String]],
      sessionProperties: Map[String, String],
      serverVersion: String,
      environment: String)

  final case class QueryMetadata(
      queryId: String,
      query: String,
      queryState: String,
      transactionId: Option[String] = None,
      plan: Option[String] = None)

  /** Per-stage GC aggregate (StageGcStatistics.java:20-52, field
    * names preserved). Spark's task metrics expose TOTAL JVM GC time
    * per task, not a full-vs-minor split, so the *FullGc* fields here
    * carry total-GC figures — faithful per-task aggregates of
    * `jvmGcTime`, documented rather than zero-filled: `fullGcTasks`
    * counts tasks that paused for GC at all, and min/max/total/average
    * are over per-task GC seconds. */
  final case class StageGcStatistics(
      stageId: Int,
      stageExecutionId: Int,
      tasks: Int,
      fullGcTasks: Int,
      minFullGcSec: Int,
      maxFullGcSec: Int,
      totalFullGcSec: Int,
      averageFullGcSec: Int)

  final case class QueryStatistics(
      cpuTimeMillis: Long,
      wallTimeMillis: Long,
      queuedTimeMillis: Long,
      analysisTimeMillis: Option[Long],
      // QueryStatistics.java:35 — the peak of a single task's memory;
      // Spark's per-task peakExecutionMemory is the faithful source
      // (max over the statement's tasks)
      peakTaskTotalMemory: Long,
      totalRows: Long,
      totalBytes: Long,
      outputRows: Long,
      outputBytes: Long,
      // QueryStatistics.java:46 — one row per stage attempt
      stageGcStatistics: Seq[StageGcStatistics],
      completedSplits: Int,
      complete: Boolean)

  final case class QueryFailureInfo(
      failureType: Option[String],
      failureMessage: Option[String])

  final case class QueryCreatedEvent(
      createTime: Instant,
      context: QueryContext,
      metadata: QueryMetadata)

  final case class QueryCompletedEvent(
      metadata: QueryMetadata,
      statistics: QueryStatistics,
      context: QueryContext,
      failureInfo: Option[QueryFailureInfo],
      createTime: Instant,
      executionStartTime: Option[Instant],
      endTime: Instant)

  final case class SplitStatistics(
      cpuTimeMillis: Long,
      wallTimeMillis: Long,
      completedPositions: Long,
      completedDataSizeBytes: Long)

  final case class SplitCompletedEvent(
      queryId: String,
      stageId: String,
      taskId: String,
      createTime: Instant,
      startTime: Option[Instant],
      endTime: Option[Instant],
      statistics: SplitStatistics,
      failureMessage: Option[String])

  /** EventListener.java:18-28 — all arms default to no-ops, a plugin
    * overrides what it consumes. */
  trait EventListener {
    def queryCreated(event: QueryCreatedEvent): Unit = ()
    def queryCompleted(event: QueryCompletedEvent): Unit = ()
    def splitCompleted(event: SplitCompletedEvent): Unit = ()
  }

  // ——— registry ———————————————————————————————————————————————————————

  private val listeners =
    new java.util.WeakHashMap[SparkSession, java.util.List[EventListener]]()
  private val splitTaps =
    new java.util.WeakHashMap[SparkSession, SplitTap]()

  /** Register a listener. `ownsQuery` scopes split events to queries
    * recorded on THIS session (a shared SparkContext can host several
    * sessions — one session's listeners must not hear another's
    * splits); the Registry facade wires the query log's probe in. */
  def addListener(spark: SparkSession, l: EventListener,
      ownsQuery: (SparkSession, String) => Boolean = (_, _) => true):
      Unit = synchronized {
    listeners.computeIfAbsent(spark,
      _ => new java.util.concurrent.CopyOnWriteArrayList[EventListener]())
      .add(l)
    // split events need a real SparkListener — installed once per
    // session on first registration; it holds the session WEAKLY (so
    // a dropped session stays collectable) and removes itself from
    // the bus once the session is gone
    if (!splitTaps.containsKey(spark)) {
      val tap = new SplitTap(
        new java.lang.ref.WeakReference(spark),
        spark.sparkContext, ownsQuery)
      spark.sparkContext.addSparkListener(tap)
      splitTaps.put(spark, tap)
    }
  }

  def removeListener(spark: SparkSession, l: EventListener): Unit =
    synchronized {
      Option(listeners.get(spark)).foreach(_.remove(l))
    }

  def hasListeners(spark: SparkSession): Boolean = synchronized {
    Option(listeners.get(spark)).exists(!_.isEmpty)
  }

  private def snapshot(spark: SparkSession): Seq[EventListener] =
    synchronized {
      Option(listeners.get(spark))
        .map(l => Seq(l.toArray(Array.empty[EventListener]): _*))
        .getOrElse(Seq.empty)
    }

  private def isolate(body: => Unit): Unit =
    try body catch { case _: Throwable => () } // plugins never fail queries

  def fireCreated(spark: SparkSession, e: QueryCreatedEvent): Unit =
    snapshot(spark).foreach(l => isolate(l.queryCreated(e)))

  def fireCompleted(spark: SparkSession, e: QueryCompletedEvent): Unit =
    snapshot(spark).foreach(l => isolate(l.queryCompleted(e)))

  private def fireSplit(spark: SparkSession, e: SplitCompletedEvent): Unit =
    snapshot(spark).foreach(l => isolate(l.splitCompleted(e)))

  // ——— the split tap: Spark tasks are the engine's splits ————————————

  /** Correlates task ends to query ids via the job group the router
    * set (the same join system.runtime.tasks performs) and fires one
    * SplitCompletedEvent per task with its REAL metrics. Stage→group
    * entries retire when their JOB ends (not per stage attempt — a
    * retried attempt's tasks must still correlate, and stages a job
    * SKIPS never get a completion event to clean on). The session
    * rides as a weak reference: a dropped session is collectable, and
    * the tap removes itself from the bus on the next event after. */
  private final class SplitTap(
      sessionRef: java.lang.ref.WeakReference[SparkSession],
      sc: org.apache.spark.SparkContext,
      ownsQuery: (SparkSession, String) => Boolean) extends SparkListener {
    private val stageToGroup = new ConcurrentHashMap[Int, String]()
    private val jobToStages = new ConcurrentHashMap[Int, Seq[Int]]()

    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val group = Option(js.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      // only statements the router tagged (query-id shaped groups)
      if (group != null && group.endsWith("_graft")) {
        val sids = js.stageIds.map(_.asInstanceOf[Int])
        sids.foreach(sid => stageToGroup.put(sid, group))
        jobToStages.put(js.jobId, sids)
      }
    }

    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val session = sessionRef.get()
      if (session == null) {
        // the session is gone: unhook and drop the correlation state
        sc.removeSparkListener(this)
        stageToGroup.clear()
        jobToStages.clear()
        return
      }
      val qid = stageToGroup.get(te.stageId)
      if (qid != null && te.taskInfo != null &&
          ownsQuery(session, qid)) {
        val m = Option(te.taskMetrics)
        val stats = SplitStatistics(
          cpuTimeMillis = m.map(_.executorCpuTime / 1000000L).getOrElse(0L),
          wallTimeMillis = te.taskInfo.duration,
          completedPositions =
            m.map(_.inputMetrics.recordsRead).getOrElse(0L),
          completedDataSizeBytes =
            m.map(_.inputMetrics.bytesRead).getOrElse(0L))
        val failure = te.reason match {
          case org.apache.spark.Success => None
          case other => Some(other.toString)
        }
        fireSplit(session, SplitCompletedEvent(
          queryId = qid,
          stageId = s"${te.stageId}.${te.stageAttemptId}",
          taskId = te.taskInfo.taskId.toString,
          createTime = Instant.ofEpochMilli(te.taskInfo.launchTime),
          startTime = Some(Instant.ofEpochMilli(te.taskInfo.launchTime)),
          endTime = if (te.taskInfo.finishTime > 0)
            Some(Instant.ofEpochMilli(te.taskInfo.finishTime)) else None,
          statistics = stats,
          failureMessage = failure))
      }
    }

    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val sids = jobToStages.remove(je.jobId)
      if (sids != null) sids.foreach(stageToGroup.remove(_))
    }
  }
}
