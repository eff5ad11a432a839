package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Semantics flags (motivated in SURVEY.md §1/§7):
  *  - `spark.sql.ansi.enabled=false` — the reference relies on permissive
  *    casts ('NA' -> null for doubles, see reference src/quality_checks.py:54);
  *    Spark 4 defaults ANSI on, which would throw instead.
  *  - UTC session timezone — pins date/timestamp determinism for the oracle.
  *  - shuffle partitions sized to the local core count (not the 200 default);
  *    on a real cluster this would be executors*cores*2-3 and AQE coalesces.
  */
object GraftSession {

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft", cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
    spark
  }

  /** Apply the runtime-settable semantics confs to an externally built
    * session (the driver may hand us its own). Idempotent and cheap —
    * every SparkEntry query calls this defensively.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type, so
    // read as long and convert in Tables.load (values are µs-aligned).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // graft's custom expressions as SQL functions (idempotent).
    GraftExtensions.register(spark)
    spark
  }

  /** Spread a frame across the session's shuffle-partition count before
    * expensive per-row work — but ONLY when the input is actually
    * under-split. The local testdata is one parquet file per table,
    * which would otherwise pin whole stages to a single task; a cluster
    * input that already has >= target partitions keeps its layout and
    * pays NO exchange (an unconditional repartition() would round-trip
    * the whole corpus through the shuffle for nothing).
    */
  def fanout(df: DataFrame): DataFrame = {
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Partition count from the INITIAL physical plan, not df.rdd: under
    // AQE, materializing the adaptive RDD finalizes the plan and RUNS
    // any upstream shuffle stages just to read a number — work the later
    // real action would then redo. sparkPlan.execute() only builds the
    // lazy RDD lineage; no job is submitted.
    val parts = df.queryExecution.sparkPlan.execute().getNumPartitions
    if (parts >= target) df else df.repartition(target)
  }
}
