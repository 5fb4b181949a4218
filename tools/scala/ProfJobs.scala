package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: run one gate (construction + noop sink, the Bench timed
  * region) with a job listener and print every Spark job's wall time —
  * the per-job breakdown for gates that run many eager actions.
  * Usage: runMain graft.ProfJobs <name> <dir> */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = Sessions.local("32")
    val q = SparkEntry.queries(name)
    q(spark, dir).write.format("noop").mode("overwrite").save() // warm
    case class J(id: Int, var start: Long = 0L, var end: Long = 0L,
      var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.start = e.time
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        if (j.desc.isEmpty)
          j.desc = e.stageInfos.lastOption.map(_.name.take(90)).getOrElse("")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q(spark, dir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"[profjobs] $name pass=$sec%.3f s, ${jobs.size} jobs")
    var gapFrom = 0L
    jobs.values.foreach { j =>
      val dur = (j.end - j.start) / 1e3
      val gap = if (gapFrom == 0) 0.0 else (j.start - gapFrom) / 1e3
      gapFrom = j.end
      println(f"  job ${j.id}%3d ${dur}%8.3f s (gap before: ${gap}%6.3f) ${j.desc.take(100)}")
    }
    spark.stop()
  }
}
