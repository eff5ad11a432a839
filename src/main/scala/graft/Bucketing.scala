package graft

import java.nio.file.Paths
import org.apache.spark.sql.DataFrame

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
}
