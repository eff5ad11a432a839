package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions.shingles
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Dev-only probe for the q157 KMV gate bands: prints the worst
  * relative errors of the per-source distinct estimate and the pairwise
  * intersection estimate against the exact referee, per sf dir, so the
  * gate's deterministic bands carry an observed ≥2× margin.
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = GraftSession.get("kmv-probe")
    val k = 256
    for (dir <- dirs) {
      val grams = Tables.load(spark, dir, "documents")
        .select(col("source"), explode(shingles(col("text"), 3)).as("g"))
      val sk = Sketches.kmvSketch(grams, Seq("source"), "g", k)
      val est = sk.select(col("source").as("src_a"), col("sk").as("ska"))
        .join(sk.select(col("source").as("src_b"), col("sk").as("skb")),
          col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          Sketches.kmvOverlap(col("ska"), col("skb"), k).as("ov"))
      val g = grams.distinct()
      val nd = g.groupBy("source").agg(count(lit(1)).as("nd"))
      val dEst = sk.join(nd, Seq("source"))
        .select(col("source"), col("nd"),
          Sketches.kmvDistinct(col("sk"), k).as("est"),
          (abs(Sketches.kmvDistinct(col("sk"), k) - col("nd")) / col("nd"))
            .as("rel"))
      val inter = g.select(col("source").as("src_a"), col("g"))
        .join(g.select(col("source").as("src_b"), col("g")), Seq("g"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("int_exact"))
      val iEst = est.join(inter, Seq("src_a", "src_b"), "left")
        .withColumn("int_exact", coalesce(col("int_exact"), lit(0L)))
        .withColumn("abs_err", abs(col("ov.intersect_est") - col("int_exact")))
        .withColumn("rel", col("abs_err") /
          greatest(col("int_exact").cast("double"), lit(1.0)))
      println(s"== $dir")
      dEst.orderBy(col("rel").desc).show(3, false)
      iEst.select("src_a", "src_b", "int_exact", "ov.intersect_est",
          "abs_err", "rel")
        .orderBy(col("rel").desc).show(5, false)
      iEst.orderBy(col("abs_err").desc)
        .select("src_a", "src_b", "int_exact", "ov.intersect_est", "abs_err")
        .show(3, false)
    }
    spark.stop()
  }
}
