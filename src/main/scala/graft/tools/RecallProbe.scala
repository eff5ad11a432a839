package graft.tools

import graft._
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev utility: probe PQ-rerank mean recall vs candidate-pool size. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-recall-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    for (cand <- Seq(100, 200, 400)) {
      val approx = Similarity.pqRerankTopK(e, q, "vec_id", "embedding",
          k = 5, candidates = cand)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      val r = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("recall"))
        .agg(avg(col("recall"))).head.getDouble(0)
      println(s"[probe] candidates=$cand mean_recall=$r")
    }
    val n = e.count()
    for ((probe, assign) <- Seq((4, 3), (6, 4), (8, 4));
         // distinct: on a small corpus the n/5 candidate count clamps
         // to 100 and would duplicate the first configuration
         cand <- Seq(100, math.max(100L, (n + 4) / 5).toInt).distinct) {
      val approx = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
          k = 5, nprobe = probe, nassign = assign, candidates = cand)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      val r = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("recall"))
        .agg(avg(col("recall"))).head.getDouble(0)
      println(s"[probe] ivfpq nprobe=$probe nassign=$assign candidates=$cand mean_recall=$r")
    }
    spark.stop()
  }
}
