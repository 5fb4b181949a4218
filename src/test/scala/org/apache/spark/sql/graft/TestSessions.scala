package org.apache.spark.sql.graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Test bridge to the classic session's primary constructor: builds a
  * session with an EXPLICITLY EMPTY extension set over an existing
  * context — the shape of a session a driver application provides to
  * the library (no GraftExtensions), for testing the post-hoc-only
  * hook paths. The public 1-arg constructor would NOT do: it re-applies
  * `spark.sql.extensions` from the context conf, which carries
  * GraftExtensions when the shared test context was engine-built. The
  * primary constructor is Scala-restricted but JVM-public, hence the
  * reflective call (test-only code). */
object TestSessions {
  def bare(sc: SparkContext): SparkSession = {
    val cls = Class.forName("org.apache.spark.sql.classic.SparkSession")
    val ctor = cls.getConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(sys.error("classic.SparkSession 6-arg constructor missing"))
    ctor.newInstance(sc, None, None, new SparkSessionExtensions,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
