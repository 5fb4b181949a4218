package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.status.api.v1.StageData

/** Bridge to Spark's `private[spark]` application status store, backing
  * the engine's `system.runtime.tasks` table
  * (`presto-main/.../connector/system/TaskSystemTable.java` analog).
  * The store is the same data Spark's own UI and REST API serve —
  * stage-attempt rows with task counts and I/O aggregates. `flush`
  * drains the listener bus so a JUST-finished query's stages are
  * visible (the live store updates asynchronously off the event bus).
  */
object StatusBridge {
  def stages(sc: SparkContext): Seq[StageData] =
    sc.statusStore.stageList(null)

  /** stageId → owning job's group id (the engine's query id — the
    * statement router sets a job group per routed statement). */
  def stageGroups(sc: SparkContext): Map[Int, String] =
    sc.statusStore.jobsList(null).flatMap { j =>
      j.jobGroup.toSeq.flatMap(g =>
        j.stageIds.map(sid => sid.asInstanceOf[Int] -> g))
    }.toMap

  /** Per-task metrics for one stage attempt (the UI/REST task table) —
    * feeds the event SPI's task-granular gauges (peak task memory, GC
    * aggregates). Only called on listener-bearing sessions. */
  def taskMetrics(sc: SparkContext, stageId: Int, attemptId: Int):
      Seq[org.apache.spark.status.api.v1.TaskMetrics] =
    try sc.statusStore.taskList(stageId, attemptId, Int.MaxValue)
      .flatMap(_.taskMetrics)
    catch { case _: NoSuchElementException => Seq.empty }

  def flush(sc: SparkContext): Unit =
    // serve the current snapshot even if the bus is backed up — the
    // reference's table never errors, it reads whatever state exists
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
