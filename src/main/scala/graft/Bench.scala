package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Plans are executed through the `noop` sink so the full projection is
  * materialized (a bare `.count()` would let Catalyst prune most of the
  * query away and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.get("graft-bench")

    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // Untimed warm-up: exercises scan + shuffle + codegen paths once so
    // the first measured query doesn't absorb JVM/JIT/codegen start-up
    // (~4-5 s otherwise attributed to whichever query sorts first).
    try SparkEntry.queries("q12_star_revenue")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Same for the CSV datasource and file-committer classes (~3 s of
    // one-time class-loading/codegen otherwise attributed to the first
    // CSV-reading query, q44 — the baseline-comparable number).
    try {
      val wdir = java.nio.file.Files.createTempDirectory("graft_bench_warm")
      try {
        val f = wdir.resolve("warm.csv")
        java.nio.file.Files.writeString(f, "a,b\n1,x\n2,y\n")
        spark.read.option("header", "true").csv(f.toString)
          .write.mode("overwrite").parquet(wdir.resolve("out").toString)
      } finally graft.pipeline.Ingest.deleteRecursively(wdir)
    } catch { case _: Throwable => () }

    // Optional positional args = query-name prefixes, for iterating on a
    // subset locally; the driver passes none and measures everything.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      args.isEmpty || args.exists(name.startsWith)
    }
    val results = selected.map { case (name, fn) => (name, run(name, fn)) }
    val qs = results
      .map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Failed queries still report elapsed time but are named in `errors`
    // so a fast failure can't masquerade as a fast query.
    val errors = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(!_._2._2)) sys.exit(1)
  }
}
