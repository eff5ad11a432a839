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

  /** Streaming state lives in RocksDB, not on the JVM heap: the default
    * HDFS-backed in-memory store keeps every key in executor heap, which
    * at 100 TB key cardinality (sessionization over billions of users)
    * is the bottleneck; RocksDB spills state to local SSD with bounded
    * block-cache memory and makes checkpoint deltas incremental.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

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
      // full extension surface at build time: SQL functions + table
      // functions (also registered by tune() for foreign sessions) AND
      // the GRAFT write-verb parser (injectable only here)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)

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
    // Older testdata generators stored events.ts as parquet
    // TIMESTAMP(NANOS); Spark has no nanos type, so read those as long
    // and convert in Tables.normalizeEventsTs (values are µs-aligned).
    // Harmless for µs-typed data, which never hits this legacy path.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
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
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Only narrow scan chains (leaf + project/filter) are probed: their
    // physical plan has no exchanges, so building the lazy RDD lineage
    // to read the partition count submits no job — whereas df.rdd under
    // AQE would RUN upstream shuffles, and the UNPREPARED sparkPlan of a
    // join crashes outright (missing BroadcastExchange / unequal zip
    // partitions). Anything else has a shuffle in its lineage and is
    // already split to the session's shuffle-partition count — adding a
    // repartition there would be the gratuitous full exchange this
    // helper exists to avoid.
    def narrowScan(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      // coalesce()/repartition() chains are still probe-safe (their RDD
      // builds lazily) and a coalesced input is exactly the under-split
      // shape fanout exists to fix.
      case n @ (_: Project | _: Filter | _: SubqueryAlias |
                _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation) =>
        narrowScan(n.children.head)
      case _ => false
    }
    if (!narrowScan(df.queryExecution.optimizedPlan)) df
    else {
      val parts = df.queryExecution.sparkPlan.execute().getNumPartitions
      if (parts >= target) df else df.repartition(target)
    }
  }
}
