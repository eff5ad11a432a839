package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: persisting both join sides bucketed and
  * sorted on the key lets the join run with NO exchange and no sort —
  * the pre-partitioning strategy for repeatedly-joined 100 TB tables
  * (pay the shuffle once at write time, never at read time).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without Exchange") {
    Bucketing.recreateBucketedTable(
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      "b_lineitem", buckets = 8, key = "l_orderkey")
    Bucketing.recreateBucketedTable(
      Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderstatus"),
      "b_orders", buckets = 8, key = "o_orderkey")

    // At this tiny SF the planner would pick broadcast (which bypasses
    // bucketing entirely); force the shuffle-join path — the one that
    // matters at scale, where neither side broadcasts — to prove the
    // bucket layout replaces the exchange.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, n) = try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      (joined.queryExecution.executedPlan.toString, joined.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!plan.contains("Exchange"),
      "bucketed join still shuffles:\n" + plan.take(3000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    // and it still computes the right thing
    val expected = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(n === expected && n > 0)
  }

  test("ensureBucketedTable reuses a current layout and rebuilds on a token change") {
    import spark.implicits._
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.ensureBucketedTable(df1, "b_ensure", buckets = 2, key = "k",
      token = "dir1")
    val created = spark.table("b_ensure").inputFiles.toSet
    // same token → table untouched (pay-the-shuffle-once contract)
    Bucketing.ensureBucketedTable(
      Seq((9L, "z")).toDF("k", "v"), "b_ensure", buckets = 2, key = "k",
      token = "dir1")
    assert(spark.table("b_ensure").inputFiles.toSet === created)
    assert(spark.table("b_ensure").count() === 2)
    // new token → rebuilt from the new frame
    Bucketing.ensureBucketedTable(
      Seq((9L, "z")).toDF("k", "v"), "b_ensure", buckets = 2, key = "k",
      token = "dir2")
    assert(spark.table("b_ensure").as[(Long, String)].collect().toSeq === Seq((9L, "z")))
  }
}
