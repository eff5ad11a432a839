package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
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

  private def ident(spark: SparkSession, table: String): TableIdentifier =
    spark.sessionState.sqlParser.parseTableIdentifier(table)

  /** The table's REAL directory from catalog metadata, falling back to
    * the catalog's default path for the name when the table doesn't
    * exist (yet) — never a hardcoded `spark-warehouse/<name>` guess,
    * which deletes the wrong path under a non-default
    * `spark.sql.warehouse.dir` or a db-qualified name.
    */
  private def tableDir(spark: SparkSession, table: String): Path = {
    val id = ident(spark, table)
    val uri =
      try spark.sessionState.catalog.getTableMetadata(id).location
      catch { case _: Exception =>
        spark.sessionState.catalog.defaultTablePath(id) }
    new Path(uri)
  }

  private def clearDir(spark: SparkSession, p: Path): Unit = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
  }

  def recreateBucketedTable(df: DataFrame, table: String,
                            buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    val dir = tableDir(spark, table) // resolve BEFORE the drop forgets it
    spark.sql(s"DROP TABLE IF EXISTS $table")
    clearDir(spark, dir)
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
        .getTableMetadata(ident(spark, table))
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
    * maintenance window). A full rewrite is honest here, not lazy: a
    * purged document's terms hash into essentially every bucket of a
    * word-bucketed postings index, so every bucket genuinely holds
    * victims — there is no untouched-partition shortcut. But the
    * rewrite must not round-trip the survivors through executor
    * storage (a `localCheckpoint` of a 100 TB postings table melts the
    * cluster): survivors stream from the OLD table's files straight
    * into a NEW bucketed table — one distributed write, no caching —
    * and the swap is two catalog operations (drop old, rename new into
    * place; the in-memory/Hive catalogs move the managed directory with
    * the rename). Readers in the swap window see a missing table, not
    * wrong data — the documented maintenance-window contract, same as
    * the previous drop+recreate.
    *
    * The FULL catalog spec is reproduced — every bucket column and
    * every sort column — so a multi-column layout is never silently
    * re-laid-out under a narrower spec (which would break downstream
    * zero-exchange join assumptions while reporting success).
    * NULL-valued predicates count as KEEP (the purgeRows discipline).
    * Returns the number of purged rows (0 = table untouched). Purge
    * the SOURCE table first: a later index rebuild from an unpurged
    * source would resurrect the rows — true of any derived index.
    */
  def purgeBucketedTable(spark: SparkSession, table: String,
      victim: Column): Long = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      ident(spark, table))
    val spec = meta.bucketSpec.getOrElse(
      sys.error(s"purgeBucketedTable: $table carries no bucket spec"))
    val isVictim = coalesce(victim, lit(false))
    val t = spark.table(table)
    val n = t.filter(isVictim).count()
    if (n == 0L) return 0L
    // survivors write to a SIDE table while the old files still exist —
    // the lazy plan reads them during the write, nothing is cached
    val tmp = s"${table}__purge_rewrite"
    val tmpDir = tableDir(spark, tmp)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    clearDir(spark, tmpDir)
    val writer = t.filter(not(isVictim)).write.mode("overwrite")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       writer.sortBy(spec.sortColumnNames.head,
         spec.sortColumnNames.tail: _*)
     else writer).saveAsTable(tmp)
    // swap: the new table (same bucket spec, survivor rows) takes the
    // old name; RENAME moves the managed directory with the metadata.
    // The rename destination is the CATALOG'S default path for the old
    // name — which may differ from the live table's actual location —
    // so clear destination debris BEFORE the drop: discovering a
    // blocked rename after the old table is gone would strand the
    // rewrite under the tmp name with the index offline.
    val oldDir = new Path(meta.location)
    val renameTarget =
      new Path(spark.sessionState.catalog.defaultTablePath(
        ident(spark, table)))
    if (renameTarget != oldDir) clearDir(spark, renameTarget)
    spark.sql(s"DROP TABLE $table")
    clearDir(spark, oldDir) // killed-write leftovers the drop skipped
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    n
  }
}
