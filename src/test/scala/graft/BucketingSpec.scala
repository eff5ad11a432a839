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

  test("purgeBucketedTable: swap-rewrite preserves the FULL multi-column " +
      "bucket+sort spec, content, and the zero-exchange join; idempotent") {
    import spark.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 20L, "c"),
      (3L, 30L, "d"), (3L, 31L, "e")).toDF("k1", "k2", "v")
    // multi-column bucket spec + two sort columns — the shape the old
    // head-only rewrite silently narrowed
    spark.sql("DROP TABLE IF EXISTS b_purge_multi")
    pipeline.Ingest.deleteRecursively(
      java.nio.file.Paths.get("spark-warehouse/b_purge_multi"))
    df.write.mode("overwrite").bucketBy(4, "k1", "k2").sortBy("k1", "k2")
      .saveAsTable("b_purge_multi")
    val specBefore = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("b_purge_multi"))
      .bucketSpec.get
    assert(Bucketing.purgeBucketedTable(spark, "b_purge_multi",
      col("v") === "c") === 1L)
    val specAfter = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("b_purge_multi"))
      .bucketSpec.get
    assert(specAfter === specBefore,
      s"purge re-laid the table out under a different spec: " +
        s"$specBefore -> $specAfter")
    assert(spark.table("b_purge_multi").select("v").as[String]
      .collect().sorted.toSeq === Seq("a", "b", "d", "e"))
    // idempotent: nothing left to purge, table untouched
    val files = spark.table("b_purge_multi").inputFiles.toSet
    assert(Bucketing.purgeBucketedTable(spark, "b_purge_multi",
      col("v") === "c") === 0L)
    assert(spark.table("b_purge_multi").inputFiles.toSet === files)
    // NULL predicate counts as KEEP
    assert(Bucketing.purgeBucketedTable(spark, "b_purge_multi",
      when(col("v") === "a", lit(null).cast("boolean"))
        .otherwise(col("v") === "b")) === 1L)
    assert(spark.table("b_purge_multi").select("v").as[String]
      .collect().sorted.toSeq === Seq("a", "d", "e"))
    // the purged single-key twin still joins bucket-to-bucket with no
    // Exchange on its side (the zero-exchange contract survives purge)
    Bucketing.recreateBucketedTable(
      df.select(col("k1").as("k"), col("v")), "b_purge_zx", 4, "k")
    Bucketing.purgeBucketedTable(spark, "b_purge_zx", col("v") === "c")
    Bucketing.recreateBucketedTable(
      Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("k", "w"),
      "b_purge_zx2", 4, "k")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_purge_zx")
        .join(spark.table("b_purge_zx2"), "k")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "post-purge bucketed join shuffles again:\n" +
          j.queryExecution.executedPlan.toString.take(2000))
      assert(j.count() === 4L)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("purgeBucketedTable works on a DB-QUALIFIED name (locations come " +
      "from catalog metadata, not a hardcoded warehouse guess)") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bspec")
    spark.sql("DROP TABLE IF EXISTS graft_bspec.b_q")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    df.write.mode("overwrite").bucketBy(2, "k").sortBy("k")
      .saveAsTable("graft_bspec.b_q")
    assert(Bucketing.purgeBucketedTable(spark, "graft_bspec.b_q",
      col("v") === "b") === 1L)
    assert(spark.table("graft_bspec.b_q").select("v").as[String]
      .collect().sorted.toSeq === Seq("a", "c"))
    // the swap landed under the SAME qualified name with the spec intact
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_bspec.b_q"))
    assert(meta.bucketSpec.exists(_.numBuckets === 2))
    // and the rewrite's tmp name is gone
    assert(!spark.catalog.tableExists("graft_bspec.b_q__purge_rewrite"))
    spark.sql("DROP TABLE graft_bspec.b_q")
    spark.sql("DROP DATABASE graft_bspec")
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
