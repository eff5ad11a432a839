package graft

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.fs.{FSDataInputStream, FileStatus,
  LocatedFileStatus, Path, RawLocalFileSystem, RemoteIterator}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.TaskContext

/** A local filesystem registered under `cfs://` that counts the FS
  * calls the scale contracts forbid or require, split DRIVER vs
  * EXECUTOR by `TaskContext.get()` (null outside a task — reliable on
  * local[*], where both sides share this JVM and so this companion's
  * counters). Specs point a layout at `cfs:<tmpdir>` (after setting
  * `fs.cfs.impl` in the session's hadoopConfiguration), reset the
  * counters around the operation under test, and assert e.g. "zero
  * driver-side recursive listings" or "the 10k deletes ran in tasks".
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = URI.create("cfs:///")

  private def driver: Boolean = TaskContext.get() == null

  /** RawLocalFileSystem's statuses load permissions LAZILY through
    * `new java.io.File(uri)`, which rejects any scheme but `file` —
    * so replace them with plain pre-filled FileStatus objects (fixed
    * default permissions; nothing under test reads them).
    */
  private def strip(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault, "", "", s.getPath)

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(strip)

  override def getFileStatus(f: Path): FileStatus =
    strip(super.getFileStatus(f))

  override def listFiles(f: Path,
      recursive: Boolean): RemoteIterator[LocatedFileStatus] = {
    if (recursive) {
      if (driver) CountingFileSystem.driverRecursiveLists.incrementAndGet()
      else CountingFileSystem.executorRecursiveLists.incrementAndGet()
    }
    super.listFiles(f, recursive)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    if (f.getName.endsWith(".parquet") && !recursive) {
      if (driver) CountingFileSystem.driverParquetDeletes.incrementAndGet()
      else CountingFileSystem.executorParquetDeletes.incrementAndGet()
    }
    super.delete(f, recursive)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val m = if (driver) CountingFileSystem.driverOpens
            else CountingFileSystem.executorOpens
    m.merge(f.toUri.getPath, 1L, (a, b) => a + b)
    super.open(f, bufferSize)
  }
}

object CountingFileSystem {
  val driverRecursiveLists = new AtomicLong
  val executorRecursiveLists = new AtomicLong
  val driverParquetDeletes = new AtomicLong
  val executorParquetDeletes = new AtomicLong
  val driverOpens = new ConcurrentHashMap[String, Long]
  val executorOpens = new ConcurrentHashMap[String, Long]

  def reset(): Unit = {
    driverRecursiveLists.set(0L)
    executorRecursiveLists.set(0L)
    driverParquetDeletes.set(0L)
    executorParquetDeletes.set(0L)
    driverOpens.clear()
    executorOpens.clear()
  }

  /** Driver-side open count of paths whose LAST segment matches. */
  def driverOpensOf(pattern: String): Long = {
    import scala.jdk.CollectionConverters._
    driverOpens.asScala.collect {
      case (p, n) if p.substring(p.lastIndexOf('/') + 1).matches(pattern) => n
    }.sum
  }

  /** Executor-side open count of paths whose LAST segment matches. */
  def executorOpensOf(pattern: String): Long = {
    import scala.jdk.CollectionConverters._
    executorOpens.asScala.collect {
      case (p, n) if p.substring(p.lastIndexOf('/') + 1).matches(pattern) => n
    }.sum
  }
}
