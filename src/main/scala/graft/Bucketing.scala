package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._
import scala.util.Using

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
    deleteRecursively(Paths.get(s"spark-warehouse/$table"))
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Recursive, null-safe delete (File.delete silently fails on
    * non-empty dirs; listFiles returns null for non-dirs).
    */
  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Using.resource(Files.walk(p))(s =>
        s.iterator().asScala.toSeq.reverse.foreach(Files.delete))
}
