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

  def flush(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(10000L)
}
