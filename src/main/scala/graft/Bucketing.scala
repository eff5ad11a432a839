package graft

import java.nio.file.Paths
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, lit, not}

/** Bucketed-table maintenance: drop + recreate a managed table persisted
  * bucketed-and-sorted on its join key — the pay-the-shuffle-once layout
  * for repeatedly-joined tables. Centralized because the stale-location
  * cleanup is fragile: the in-memory catalog forgets tables across JVMs
  * while their `spark-warehouse/<table>` directories survive (including
  * `_temporary/` subtrees from a killed write), and `saveAsTable` then
  * refuses with "location already exists".
  */
object Bucketing {

  def recreateBucketedTable(df: DataFrame, table: String,
                            buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    pipeline.Ingest.deleteRecursively(Paths.get(s"spark-warehouse/$table"))
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Recreate ONLY when the table does not already hold this `token`'s
    * data (token = the source dir in practice). The whole point of a
    * bucketed layout is pay-the-shuffle-once / join-many-times — q63
    * measures the zero-exchange JOIN, so rebuilding the layout on every
    * invocation would bench the one-time ETL instead of the operator.
    * The in-memory catalog forgets tables across JVMs, so a fresh JVM
    * always rebuilds (correctness never rides on a stale warehouse dir).
    */
  def ensureBucketedTable(df: DataFrame, table: String, buckets: Int,
                          key: String, token: String): Unit = {
    val spark = df.sparkSession
    // The stored token covers the full layout identity — source
    // fingerprint AND bucket count, bucket key, projected columns — so
    // a later caller reusing the table name with different bucketing or
    // a changed projection rebuilds instead of silently joining against
    // a stale (wrongly-bucketed) layout.
    val fullToken =
      s"$token|buckets=$buckets|key=$key|cols=${df.columns.mkString(",")}"
    val current =
      try spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .properties.get("graft.layout.token")
      catch { case _: Exception => None }
    if (!current.contains(fullToken)) {
      recreateBucketedTable(df, table, buckets, key)
      val esc = fullToken.replace("'", "''")
      spark.sql(
        s"ALTER TABLE $table SET TBLPROPERTIES ('graft.layout.token'='$esc')")
    }
  }

  /** PHYSICAL PURGE of a bucketed index table — the maintenance job
    * behind read-time tombstones (the q186 discipline: tombstones make
    * deletions visible immediately; this reclaims the bytes in a
    * maintenance window). The table rewrites WITHOUT the victim rows
    * under its OWN catalog bucket spec, so bucket-pruned lookups keep
    * working unchanged. A full rewrite is honest here, not lazy: a
    * purged document's terms hash into essentially every bucket of a
    * word-bucketed postings index, so every bucket genuinely holds
    * victims — there is no untouched-partition shortcut. NULL-valued
    * predicates count as KEEP (the purgeRows discipline). Returns the
    * number of purged rows (0 = table untouched). Purge the SOURCE
    * table first: a later index rebuild from an unpurged source would
    * resurrect the rows — true of any derived index.
    */
  def purgeBucketedTable(spark: SparkSession, table: String,
      victim: Column): Long = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      sys.error(s"purgeBucketedTable: $table carries no bucket spec"))
    val isVictim = coalesce(victim, lit(false))
    val t = spark.table(table)
    val n = t.filter(isVictim).count()
    if (n == 0L) return 0L
    // materialize survivors BEFORE the drop — the lazy plan reads the
    // very files recreateBucketedTable deletes
    val survivors = t.filter(not(isVictim)).localCheckpoint(true)
    recreateBucketedTable(survivors, table, spec.numBuckets,
      spec.bucketColumnNames.head)
    n
  }
}
