package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch: time a single battery query end-to-end (noop sink). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-timeq")
    val dir = args(0)
    args.drop(1).foreach { q =>
      val fn = SparkEntry.queries(q)
      // warm-up pass then timed pass
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $q ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
