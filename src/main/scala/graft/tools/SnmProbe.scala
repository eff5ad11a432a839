package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Throwaway dev probe for the q86 sorted-neighborhood cost at sf1:
  * times the stages separately to locate the super-linear term.
  */
object SnmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = GraftSession.get("graft-snmprobe")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[snmprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    time("full operator")(graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text").count())
    // window-only (no levenshtein): same plan minus the distance
    val probe = lower(substring(col("text"), 1, 120))
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("_id"), probe.as("_probe"),
        substring(probe, 1, 16).as("_blk"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("_blk").orderBy(col("_probe"), col("_id"))
    time("window+leads only")(base.select(Seq(col("_id")) ++
      (1 until 4).map(i => lead(col("_id"), i).over(win).as(s"n$i")): _*)
      .agg(count(lit(1))).head())
    // levenshtein against self-shifted probes, no window
    time("levenshtein only")(base.select(
      levenshtein(col("_probe"), reverse(col("_probe"))).as("d"))
      .agg(sum("d")).head())
    val blocks = base.groupBy("_blk").count()
      .agg(max("count"), count(lit(1))).head()
    println(s"[snmprobe] max block size=${blocks.get(0)} n_blocks=${blocks.get(1)}")
    spark.stop()
  }
}
