package graft.tools

import graft.{GraftSession, SparkEntry}

/** Replicates the driver's t1 smoke: call SparkEntry.entry and assert
  * it returns rows. `sbt "runMain graft.tools.EntrySmoke"`.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-entry-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[entry-smoke] rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry() must return rows")
    spark.stop()
  }
}
