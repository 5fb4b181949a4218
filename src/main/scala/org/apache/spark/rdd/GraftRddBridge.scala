package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is `private[rdd]` — bridged (the
  * StatusBridge/ColumnBridge pattern) for the ProbeSweep dev tool's
  * between-trial residue release: only localCheckpoint blocks are
  * harness residue there; deliberate persists must survive (see
  * ProbeSweep's measurement-hygiene note). */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean =
    rdd.isLocallyCheckpointed
}
