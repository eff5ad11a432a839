package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch: per-JOB breakdown of a battery query (warm pass first, then
  * a profiled pass) — shows how many Spark jobs a gate submits and where
  * the wall-clock goes, which is the first question for any multi-action
  * referee gate on local[n] (driver gaps between jobs = eager actions /
  * layout builds / collects; long single jobs = the actual heavy stage).
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [query...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-jobprofile")
    val sc = spark.sparkContext
    val dir = args(0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    sc.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1e3}%7.3f s  $desc")
        }
      }
      override def onStageCompleted(sc2: SparkListenerStageCompleted): Unit = {
        val si = sc2.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime)
          stageTimes.put(si.stageId, c - s)
      }
    })
    args.drop(1).foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      jobs.clear(); lines.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"===== $q  wall=" + f"$wall%.3f s  jobs=${lines.size}")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
