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
}
