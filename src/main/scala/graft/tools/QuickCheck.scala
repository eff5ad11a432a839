package graft.tools

import graft.{GraftSession, SparkEntry}

/** Throwaway dev runner: `runMain graft.tools.QuickCheck <sfDir> <q>...`
  * prints each named query's row count (prefix match).
  */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-quickcheck")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.drop(1).isEmpty || args.drop(1).exists(n.startsWith) }
    sel.foreach { case (n, fn) =>
      val t0 = System.nanoTime()
      val c = fn(spark, dir).count()
      println(f"[quickcheck] $n rows=$c (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
  }
}
