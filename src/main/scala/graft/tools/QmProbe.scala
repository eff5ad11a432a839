package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe: sweep (iters, lr) for the full-corpus logistic
  * trainer on the q110 planted fixture to pick a setting that clears
  * the 0.95 accuracy floor with the fewest Spark jobs.
  */
object QmProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("qm-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val d = Tables.load(spark, dir, "documents")
    val planted = d.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" lorem ipsum dolor sit amet lorem ipsum")))
        .otherwise(col("text")))
    val boiler = Seq("lorem", "ipsum", "dolor", "sit", "amet")
    val stops = Seq("the", "and", "for", "that", "with")
    val nTok = greatest(size(split(col("text"), " ")), lit(1)).cast("double")
    def hits(ws: Seq[String]) = ws.map(w =>
      size(filter(split(col("text"), " "), t => t === w))).reduce(_ + _)
    val feats = planted.select(col("doc_id"),
      (hits(boiler) / nTok).as("f_boiler"),
      (hits(stops) / nTok).as("f_stop"),
      (col("doc_id") % 3 === 0).cast("double").as("label"))
    val rows = feats.select(col("f_boiler"), col("f_stop"), col("label"))
      .na.drop().collect()
      .map(r => (Array(r.getDouble(0), r.getDouble(1)), r.getDouble(2)))
    for (lr <- Seq(2.0, 10.0, 30.0, 60.0, 100.0, 200.0);
         iters <- Seq(30, 60, 120, 300)) {
      val m = graft.operators.QualityModel
        .trainLogisticFullReference(rows, iters = iters, lr = lr)
      val acc = rows.map { case (x, y) =>
        var z = m.weights(0) * x(0)
        z += m.weights(1) * x(1); z += m.bias
        val p = if (1.0 / (1.0 + math.exp(-z)) >= 0.5) 1.0 else 0.0
        if (p == y) 1.0 else 0.0
      }.sum / rows.length
      println(f"[qm-probe] lr=$lr%6.1f iters=$iters%4d acc=$acc%.4f")
    }
    spark.stop()
  }
}
