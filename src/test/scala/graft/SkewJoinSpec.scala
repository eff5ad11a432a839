package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot key that dwarfs every other partition
  * is detected at runtime and its partition split into parallel reads —
  * the no-code-change complement to manual salting (q39) for skewed
  * joins at scale. Proven here by forcing sort-merge, lowering the skew
  * thresholds to test size, and asserting the final adaptive plan marks
  * the join skew=true while the result still matches the exact join.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ (skew path)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key plus a sprinkle of others: one shuffle
      // partition carries ~all bytes — the textbook hot-key shape.
      val facts = spark.range(0, 200000)
        .select(when($"id" % 100 === 0, $"id" % 7).otherwise(lit(42L)).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("v"))
      val dims = spark.range(0, 50).select($"id".as("k"), ($"id" * 10).as("w"))

      val joined = facts.join(dims, "k")
      // Execute THIS queryExecution (count() would plan a separate one
      // and leave the join's adaptive plan unfinalized).
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      // every fact key (0..6 and 42) is inside dims' 0..49 → all match
      assert(n === 200000L, s"rows=$n")
      assert(plan.contains("skew=true"),
        "AQE did not mark the hot partition as skewed:\n" + plan.take(3000))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
