package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe for the q248 distinct-n hotspot: times each leg and
  * formulation variant at an arbitrary SF dir (not part of the
  * battery; see PLANS.md round-11 notes).
  */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sf1")
    val spark = GraftSession.get("graft-gram-probe")
    val w = split(col("text"), " ")
    val base = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[gram-probe] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val bigrams = base.select(col("source"), explode(when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat(element_at(w, i + 1), lit(" "), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))).as("g"))

    time("explode-only-count")(bigrams.groupBy("source")
      .agg(count(lit(1))).count())
    time("bigram-census")(bigrams.groupBy("source", "g")
      .agg(count(lit(1))).count())
    time("bigram-census-rollup")(bigrams.groupBy("source", "g")
      .agg(count(lit(1)).as("cnt")).groupBy("source")
      .agg(count(lit(1)), sum("cnt")).count())
    time("bigram-mixed-distinct")(bigrams.groupBy("source")
      .agg(count_distinct(col("g")), count(lit(1))).count())
    val unigrams = base.select(col("source"), explode(w).as("g"))
    time("uni-census-rollup")(unigrams.groupBy("source", "g")
      .agg(count(lit(1)).as("cnt")).groupBy("source")
      .agg(count(lit(1)), sum("cnt")).count())

    val bigramsZip = base.select(col("source"), explode(
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
    time("zip-explode-only-count")(bigramsZip.groupBy("source")
      .agg(count(lit(1))).count())
    time("zip-census-rollup")(bigramsZip.groupBy("source", "g")
      .agg(count(lit(1)).as("cnt")).groupBy("source")
      .agg(count(lit(1)), sum("cnt")).count())
    spark.stop()
  }
}
