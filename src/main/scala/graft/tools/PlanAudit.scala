package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps `explain("formatted")` for selected queries so plan quality
  * (filter/projection pushdown, broadcast vs shuffle joins, whole-stage
  * codegen spans, exchange counts) can be audited and regressions
  * spotted. Usage: runMain graft.tools.PlanAudit [sfDir] [q1 q2 ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q12_star_revenue", "q19_filter_pushdown", "q01_agg_returnflag",
        "q24_minhash_neardup", "q31_cosine_topk", "q10_join_using")
    val spark = GraftSession.get("graft-plan-audit")
    try names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
