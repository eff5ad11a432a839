package graft

import graft.operators.Compaction

/** File-layout contract of the q170 compaction pass: content identity
  * is the driver gate's job (full hash vs the source table); this spec
  * pins what the hash cannot see — the file-count collapse and the
  * size targeting.
  */
class CompactionSpec extends SparkSpec {

  test("compaction collapses the 64-file layout to the size target " +
      "without losing a row") {
    val small = Tables.documentsSmallFilesLayout(spark, sfDir)
    val compacted = Tables.documentsCompactedLayout(spark, sfDir)
    val (nSmall, bytesSmall) = Compaction.fileStats(spark, small)
    val (nOut, bytesOut) = Compaction.fileStats(spark, compacted)
    assert(nSmall === 64L, "fixture must be the accreted small-files shape")
    val expected = math.max(1L, (bytesSmall + 512L * 1024 - 1) / (512L * 1024))
    assert(nOut === expected,
      s"expected ceil($bytesSmall / 512KiB) = $expected files, got $nOut")
    assert(nOut < nSmall / 4,
      s"compaction must collapse the layout ($nSmall -> $nOut)")
    // Parquet framing overhead per file shrinks, so the compacted total
    // must not balloon; generous 2x bound, the real point is file count.
    assert(bytesOut < bytesSmall * 2)
    assert(spark.read.parquet(compacted).count() ===
      spark.read.parquet(small).count())
  }

  test("compact() is deterministic on file count and targets equal sizes") {
    val small = Tables.documentsSmallFilesLayout(spark, sfDir)
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact_spec").toString
    val n1 = Compaction.compact(spark, small, out, targetBytes = 256L * 1024)
    val (n2, _) = Compaction.fileStats(spark, out)
    assert(n1 === n2)
    // Round-robin repartition: every file within ~2x of the mean size
    // (footer overhead dominates at this tiny sf, hence the loose band;
    // the anti-goal is one giant file + crumbs, i.e. coalesce skew).
    val path = new org.apache.hadoop.fs.Path(out)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) buf += f.getLen
      }
      buf.toSeq
    }
    if (sizes.length > 1) {
      val mean = sizes.sum.toDouble / sizes.length
      assert(sizes.max < mean * 2.5 && sizes.min > mean / 2.5,
        s"file sizes skewed: ${sizes.sorted.mkString(", ")}")
    }
  }

  test("fileStats skips files under transient _/. directories, not just " +
      "hidden leaf names") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_filestats_spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val (n0, bytes0) = Compaction.fileStats(spark, dir)
    // Plant a leftover concurrent-write tree: a real parquet file under
    // _temporary/ must count into neither n nor bytes.
    val tmp = new java.io.File(dir, "_temporary/0")
    tmp.mkdirs()
    val planted = new java.io.File(tmp, "part-leftover.parquet")
    java.nio.file.Files.write(planted.toPath, Array.fill[Byte](4096)(1))
    val (n1, bytes1) = Compaction.fileStats(spark, dir)
    assert(n1 === n0 && bytes1 === bytes0,
      "files under _temporary/ leaked into fileStats")
  }
}
