package graft

import graft.operators.Manifest
import org.apache.spark.sql.functions._

/** SCALE-SHAPE contracts of the manifest layer, pinned by counting FS
  * calls through [[CountingFileSystem]] (`cfs://`): above the census
  * threshold the driver must issue ZERO full-tree listings, deletes
  * must run in executor tasks, and census reads must not re-open
  * manifest text driver-side beyond the one-line header reads. The
  * oracle gates prove WHAT these ops compute; this suite pins WHERE
  * the work runs — the difference between "correct at sf0.01" and
  * "alive at 10^7 files".
  */
class ManifestScaleSpec extends SparkSpec {
  import spark.implicits._

  private def cfsDir(): (String, java.nio.file.Path) = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingFileSystem].getName)
    val local = java.nio.file.Files.createTempDirectory("graft_scale_spec")
    (s"cfs:$local", local)
  }

  private def fixture = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
    (4L, "b", 40.0), (5L, "c", 50.0), (6L, "c", 60.0)
  ).toDF("id", "grp", "value")

  test("vacuum above the census threshold: zero driver full-tree " +
      "listings, a 10k-doomed-file reclamation deletes from executors") {
    val (dir, local) = cfsDir()
    Manifest.create(fixture, dir, "grp")
    Manifest.overwritePartitions(
      fixture.filter($"grp" === "b").withColumn("value", $"value" * 2),
      dir, "grp") // supersedes b's v1 files: genuine doomed bytes
    // 10k orphans from a "crashed writer": data files on disk that no
    // manifest references, inside their own commit dir
    val orphanDir = local.resolve("data/c009999-dead/__p=a")
    java.nio.file.Files.createDirectories(orphanDir)
    (1 to 10000).foreach { i =>
      java.nio.file.Files.createFile(orphanDir.resolve(f"junk_$i%05d.parquet"))
    }
    spark.conf.set("graft.manifest.driverCensusMaxFiles", "0")
    try {
      CountingFileSystem.reset()
      val (d, m, _) = Manifest.vacuum(spark, dir)
      assert(d >= 10000L, s"expected the 10k orphans reclaimed, got $d")
      assert(m >= 1L, "the superseded manifest must be reclaimed")
      assert(CountingFileSystem.driverRecursiveLists.get() === 0L,
        "vacuum above the census threshold ran a DRIVER-side recursive " +
          "listing - the O(all-files) single-threaded walk the " +
          "distributed census exists to retire")
      assert(CountingFileSystem.driverParquetDeletes.get() === 0L,
        "doomed data files were deleted driver-side")
      assert(CountingFileSystem.executorParquetDeletes.get() >= 10000L,
        "the doomed-file deletes did not fan out to executor tasks")
      // the executors did the walking
      assert(CountingFileSystem.executorRecursiveLists.get() > 0L)
      // correctness unchanged: survivors intact, orphan commit dir gone
      assert(Manifest.read(spark, dir).agg(sum("value"))
        .as[Double].head() === 280.0)
      assert(!java.nio.file.Files.exists(local.resolve("data/c009999-dead")),
        "a commit dir emptied of data files must be dropped")
    } finally spark.conf.unset("graft.manifest.driverCensusMaxFiles")
  }

  test("vacuum below the threshold still reclaims identically (the " +
      "driver fast path did not fork semantics)") {
    val (dir, local) = cfsDir()
    Manifest.create(fixture, dir, "grp")
    Manifest.overwritePartitions(
      fixture.filter($"grp" === "b").withColumn("value", $"value" * 2),
      dir, "grp")
    val orphanDir = local.resolve("data/c000777-dead/__p=a")
    java.nio.file.Files.createDirectories(orphanDir)
    (1 to 5).foreach { i =>
      java.nio.file.Files.createFile(orphanDir.resolve(s"junk_$i.parquet"))
    }
    val (d, m, _) = Manifest.vacuum(spark, dir)
    assert(d >= 5L && m >= 1L)
    assert(!java.nio.file.Files.exists(local.resolve("data/c000777-dead")))
    assert(Manifest.read(spark, dir).agg(sum("value"))
      .as[Double].head() === 280.0)
  }
}
