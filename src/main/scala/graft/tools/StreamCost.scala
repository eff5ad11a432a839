package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch: decompose the stateful-streaming gates' fixed cost. Runs a
  * query repeatedly under different state configurations (shuffle
  * partition count at stream start, state-store provider) in one JVM —
  * the deltas attribute the per-query floor to state-store instances vs
  * micro-batch machinery. Usage:
  *   runMain graft.tools.StreamCost <sfDir> <query> [query...]
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-streamcost")
    val dir = args(0)
    def time(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.drop(1).foreach { q =>
      time(q) // warm
      val base = time(q)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val few = time(q)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      val hdfs = time(q)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        GraftSession.RocksDbProvider)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      val both = time(q)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        GraftSession.RocksDbProvider)
      println(f"[streamcost] $q base(rocks,32p)=$base%.2f " +
        f"rocks4p=$few%.2f hdfs32p=$hdfs%.2f hdfs4p=$both%.2f")
    }
    spark.stop()
  }
}
