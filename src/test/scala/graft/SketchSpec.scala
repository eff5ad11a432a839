package graft

import org.apache.spark.sql.functions._

/** Contract for the approximate-distinct sketch path (q47): the oracle
  * can't check an approximate operator, so the error bound and the
  * merge-invariance property (union of per-group sketches == one global
  * sketch) are pinned here.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.load(spark, sfDir, "events")

  test("HLL estimate within 5% of exact distinct per event_type") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = SparkEntry.queries("q47_hll_distinct")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05,
        s"$k: approx $a vs exact $n (>5% off)")
    }
  }

  test("sketch merge-invariance: union of monthly sketches == direct sketch") {
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[(String, Long)].collect().toMap
    val merged = SparkEntry.queries("q47_hll_distinct")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
  }
}
