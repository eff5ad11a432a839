package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * At 100 TB these would be partitioned external tables; the parquet
  * scan path (column pruning + predicate pushdown) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) → read as long nanos (see
    // GraftSession.tune) and convert losslessly to a µs timestamp
    // (testdata values are µs-aligned; integer `div` avoids the double
    // round-trip that would lose precision past 2^53).
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
