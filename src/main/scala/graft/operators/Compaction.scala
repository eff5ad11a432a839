package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files maintenance (the OPTIMIZE/rewrite pass every lakehouse
  * table needs): a 100 TB table accreted from streaming micro-batches or
  * fine-grained backfills ends up as millions of KB-sized files, and
  * scan cost becomes file-open cost (driver listing, footer reads, task
  * scheduling) instead of byte cost. Compaction rewrites a directory
  * into ⌈totalBytes / targetBytes⌉ files — one distributed round-robin
  * exchange, no semantic change, which is exactly what the q170 gate
  * checks (compacted content ≡ source table, full hash).
  *
  * The file census runs on the Hadoop FS API (the IVF-model-persist
  * precedent), so the same code paths work against HDFS/object stores;
  * on a real lake this runs per-partition with a min-file-count trigger
  * rather than table-wide.
  */
object Compaction {

  /** (file count, total bytes) of the non-hidden data files under dir.
    * Hidden means any path COMPONENT below `dir` starting with `_` or
    * `.` — not just the leaf name, or files under a transient
    * `_temporary/` / `.staging/` tree (left by a concurrent or failed
    * write) would count into totalBytes and skew the file-size target.
    */
  def fileStats(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.getFileStatus(path).getPath.toUri.getPath
    val it = fs.listFiles(path, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(root)
      val hidden = rel.split('/')
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (!hidden) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Rewrite `inDir` into `outDir` with ~`targetBytes`-sized files.
    * Returns the output file count. `repartition(n)` is a round-robin
    * exchange — every output file lands within one row of equal size,
    * which is the point (a coalesce() would inherit the skew of the
    * input file layout).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Long = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val (_, totalBytes) = fileStats(spark, inDir)
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    fileStats(spark, outDir)._1
  }
}
