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

  /** Fingerprint of a source table file (size + mtime) — the staleness
    * token for derived layouts: a cached layout must be rebuilt when the
    * source it was derived from changes, even at the same path.
    */
  def sourceToken(sfDir: String, name: String): String = {
    val p = java.nio.file.Paths.get(sfDir, s"$name.parquet")
    s"${java.nio.file.Files.size(p)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Hive-style date-partitioned copy of `events` (partition column
    * `dt`, read back as DATE by partition-type inference) — the layout a
    * 100 TB event table would actually ship with, and the precondition
    * for dynamic partition pruning (q65): a runtime-only dim filter can
    * then skip whole day directories instead of scanning the full
    * history. Built once per sf dir under the system temp root and
    * reused while the source fingerprint matches (a regenerated
    * events.parquet at the same path forces a rebuild).
    */
  def eventsDayLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, to_date}
    derivedLayout(sfDir, "events", "events_by_day") { out =>
      load(spark, sfDir, "events")
        .withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
    }
  }

  /** ORC copy of `orders` — the second columnar source format (same
    * pushdown/pruning path as parquet through the ORC reader).
    */
  def ordersOrcLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "orders", "orders_orc") { out =>
      load(spark, sfDir, "orders").write.mode("overwrite").orc(out)
    }

  /** JSON-lines copy of `events` (timestamps as epoch-µs longs — JSON
    * has no timestamp type; a lossless long beats ISO-string parsing).
    * Readers must supply the schema explicitly: schema inference is a
    * full extra pass over the data, which at 100 TB doubles the scan.
    */
  def eventsJsonLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    derivedLayout(sfDir, "events", "events_json") { out =>
      load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
        .write.mode("overwrite").json(out)
    }
  }

  /** Build-once derived copy of a source table under the system temp
    * root, keyed by the source fingerprint: a regenerated source at the
    * same path forces a rebuild, an unchanged one is reused as-is.
    */
  private def derivedLayout(sfDir: String, source: String,
                            layoutName: String)(build: String => Unit): String =
    synchronized {
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
      val out = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_layout", sfName, layoutName)
      val tokenFile = out.resolve("_graft_source_token")
      val token = sourceToken(sfDir, source)
      val current =
        if (java.nio.file.Files.exists(tokenFile))
          java.nio.file.Files.readString(tokenFile)
        else ""
      if (current != token || !java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
        build(out.toString)
        java.nio.file.Files.writeString(tokenFile, token)
      }
      out.toString
    }
}
