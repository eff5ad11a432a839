package graft

import graft.operators.ChangeData
import org.apache.spark.sql.functions._

/** Hand-computable contracts for the CDC operators: op classification
  * (including null-safe update detection in both directions), the
  * diff→merge round-trip on randomized snapshots, and SCD2 interval
  * invariants (contiguity, version numbering, exactly one open version
  * per key, same-timestamp tiebreak).
  */
class ChangeDataSpec extends SparkSpec {
  import spark.implicits._

  // old: 1 unchanged, 2 update (value change), 3 delete,
  //      5 update (value→null), 6 update (null→value)
  private def oldSnap = Seq(
    (1L, Option("a"), Option(10.0)), (2L, Option("b"), Option(20.0)),
    (3L, Option("c"), Option(30.0)), (5L, Option("e"), Option(50.0)),
    (6L, None: Option[String], Option(60.0))
  ).toDF("k", "s", "v")
  private def newSnap = Seq(
    (1L, Option("a"), Option(10.0)), (2L, Option("B"), Option(20.0)),
    (4L, Option("d"), Option(40.0)), (5L, None: Option[String], Option(50.0)),
    (6L, Option("f"), Option(60.0))
  ).toDF("k", "s", "v")

  test("snapshotDiff classifies insert/update/delete and skips unchanged; null moves are updates") {
    val diff = ChangeData.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(diff === Array((2L, "update"), (3L, "delete"), (4L, "insert"),
      (5L, "update"), (6L, "update")))
    val cols = ChangeData.snapshotDiff(oldSnap, newSnap, Seq("k")).columns
    assert(cols === Array("k", "op", "s", "v", "old_s", "old_v"))
    // Delete rows carry nulls on the new side, old values on the old side.
    val del = ChangeData.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .filter(col("op") === "delete").collect().head
    assert(del.isNullAt(2) && del.getString(4) == "c" && del.getDouble(5) == 30.0)
  }

  test("snapshotDiff rejects mismatched schemas; applyChangeset rejects op-less changesets") {
    intercept[IllegalArgumentException] {
      ChangeData.snapshotDiff(oldSnap, newSnap.withColumnRenamed("v", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      ChangeData.applyChangeset(oldSnap, oldSnap, Seq("k"))
    }
  }

  test("diff→merge round-trip reproduces the new snapshot on randomized snapshots") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val keys = (1L to 200L).filter(_ => rng.nextDouble() < 0.8)
      def snap(ks: Seq[Long]) = ks.map { k =>
        (k, if (rng.nextDouble() < 0.1) null else s"s${rng.nextInt(5)}",
          if (rng.nextDouble() < 0.1) None else Some(rng.nextInt(100).toDouble))
      }.toDF("k", "s", "v")
      val o = snap(keys.filter(_ => rng.nextDouble() < 0.9))
      val n = snap(keys.filter(_ => rng.nextDouble() < 0.9))
      val merged = ChangeData.applyChangeset(o,
        ChangeData.snapshotDiff(o, n, Seq("k")), Seq("k"))
      assert(ChangeData.sameContent(merged, n),
        "merge(old, diff(old,new)) must equal new")
    }
  }

  test("scd2 collapses runs into contiguous intervals with one open version per key") {
    // key a: x,x,y,x — 3 versions; same-ts rows at 30 ordered by tiebreak
    // id (4 before 5) so the run at 30 starts with y then flips to x.
    val src = Seq(
      ("a", 10L, 1L, "x"), ("a", 20L, 2L, "x"), ("a", 30L, 4L, "y"),
      ("a", 30L, 5L, "x"), ("b", 15L, 3L, "z")
    ).toDF("k", "sec", "id", "val")
      .select(col("k"), timestamp_seconds(col("sec")).as("t"), col("id"), col("val"))
    val out = ChangeData.scd2(src, Seq("k"), "t", "id", Seq("val"))
      .orderBy("k", "version_n").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000,
        if (r.isNullAt(3)) -1L else r.getTimestamp(3).getTime / 1000,
        r.getInt(4), r.getBoolean(5)))
    assert(out === Array(
      ("a", "x", 10L, 30L, 1, false),
      ("a", "y", 30L, 30L, 2, false),
      ("a", "x", 30L, -1L, 3, true),
      ("b", "z", 15L, -1L, 1, true)))
    // Invariants: per key, valid_to chains to the next valid_from and
    // exactly the last version is open.
    val byKey = out.groupBy(_._1)
    byKey.foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3); case _ =>
      }
      assert(vs.count(_._6) == 1 && vs.last._6)
    }
  }

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(sum("v").as("sum_val"),
      count(lit(1)).as("n"), count(col("v")).as("n_nonnull"))

  test("incrementalAgg(agg(old), diff(old,new)) == agg(new) on randomized " +
    "snapshots with group migration, all-null-value groups, and NULL group keys") {
    val rng = new scala.util.Random(7)
    // Group alphabet includes an all-NULL-value group ("nullv" rows
    // always carry v=NULL — its correct sum is NULL, not 0.0) and a
    // NULL group KEY (groupBy buckets it as one group; the delta merge
    // must too). Independent old/new group draws make updates migrate
    // rows between groups constantly.
    val groups = Seq(Some("g0"), Some("g1"), Some("g2"), Some("nullv"), None)
    def snap(ks: Seq[Long]) = ks.map { k =>
      val g = groups(rng.nextInt(groups.size))
      val v = if (g.contains("nullv") || rng.nextDouble() < 0.2) None
              else Some(rng.nextInt(100).toDouble)
      (k, g, v)
    }.toDF("k", "g", "v")
    for (round <- 1 to 5) {
      val o = snap((1L to 300L).filter(_ => rng.nextDouble() < 0.8))
      val n = snap((1L to 300L).filter(_ => rng.nextDouble() < 0.8))
      val maintained = ChangeData.incrementalAgg(
        aggOf(o), ChangeData.snapshotDiff(o, n, Seq("k")), Seq("g"), "v")
      assert(ChangeData.sameContent(maintained, aggOf(n)),
        s"round $round: incrementally-maintained aggregate diverged from " +
          "a full re-aggregation of the new snapshot")
    }
  }

  test("incrementalAgg handles groups vanishing entirely and appearing fresh") {
    // old: all rows in g0; new: all rows moved to g1 — g0 must disappear
    // (count reaches zero) and g1 must appear without a base row.
    val o = Seq((1L, "g0", Some(1.0)), (2L, "g0", Some(2.0))).toDF("k", "g", "v")
    val n = Seq((1L, "g1", Some(1.0)), (2L, "g1", Some(5.0))).toDF("k", "g", "v")
    val out = ChangeData.incrementalAgg(
      aggOf(o), ChangeData.snapshotDiff(o, n, Seq("k")), Seq("g"), "v")
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "g1" && out.head.getDouble(1) == 6.0 &&
      out.head.getLong(2) == 2L && out.head.getLong(3) == 2L)
  }

  test("incrementalAgg rejects key columns as groupCols/valueCol") {
    val o = Seq((1L, "g0", Some(1.0))).toDF("k", "g", "v")
    val n = Seq((1L, "g0", Some(2.0))).toDF("k", "g", "v")
    val diff = ChangeData.snapshotDiff(o, n, Seq("k"))
    intercept[IllegalArgumentException] {
      ChangeData.incrementalAgg(aggOf(o), diff, Seq("k"), "v")
    }
    intercept[IllegalArgumentException] {
      ChangeData.incrementalAgg(aggOf(o), diff, Seq("g"), "k")
    }
  }

  test("overwritePartitions replaces only the targeted partition's files") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    try {
      val base = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
        (4L, "c", 4.0)).toDF("id", "p", "v")
      base.write.mode("overwrite").partitionBy("p").parquet(dir)
      def files() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(dir))
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
      }
      val before = files()
      ChangeData.overwritePartitions(
        Seq((3L, "b", 30.0), (5L, "b", 50.0)).toDF("id", "p", "v"), dir, "p")
      val after = files()
      // a and c partitions: bit-identical files (path, size, mtime).
      def keep(fs: Seq[(String, Long, Long)]) = fs.filterNot(_._1.contains("p=b"))
      assert(keep(after) === keep(before),
        "untouched partitions were rewritten")
      // b partition fully replaced; content reflects the backfill only.
      val got = spark.read.parquet(dir).select("id", "p", "v")
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 30.0),
        (4L, "c", 4.0), (5L, "b", 50.0)))
      // the dynamic mode must not leak into the session
      assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        .contains("dynamic"))
    } finally graft.pipeline.Ingest.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }

  test("purgeRows rewrites only victim partitions, drops emptied ones, " +
      "leaves the rest byte-identical") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_purge").toString
    try {
      // p=a mixed (victim + survivor), p=b victims only (must be
      // DROPPED — the dynamic-overwrite silent-retention trap), p=c
      // untouched (must stay bit-identical).
      val base = Seq((1L, "a", 9L), (2L, "a", 1L), (3L, "b", 9L),
        (4L, "c", 1L)).toDF("id", "p", "u")
      base.write.mode("overwrite").partitionBy("p").parquet(dir)
      def files() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(dir))
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
      }
      val before = files()
      ChangeData.purgeRows(spark, dir, "p", $"u" === 9L)
      val after = files()
      def cOnly(fs: Seq[(String, Long, Long)]) = fs.filter(_._1.contains("p=c"))
      assert(cOnly(after) === cOnly(before), "untouched partition rewritten")
      assert(!after.exists(_._1.contains("p=b")),
        "a partition left empty by the purge must be dropped, not retained")
      val got = spark.read.parquet(dir).select("id", "p", "u")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(got === Seq((2L, "a", 1L), (4L, "c", 1L)))
      // no-op purge: nothing matches, nothing moves
      val snap = files()
      ChangeData.purgeRows(spark, dir, "p", $"u" === 12345L)
      assert(files() === snap)
    } finally graft.pipeline.Ingest.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }

  test("purgeRows keeps rows whose victim predicate is NULL — they are " +
      "not victims, and a partition of only victims+NULLs is not dead") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_purge_null")
      .toString
    try {
      // p=a: victim + NULL-u row (predicate u===9 is NULL there);
      // p=b: victim + NULL-u only — must be rewritten, NOT dropped.
      val base = Seq((1L, "a", Some(9L)), (2L, "a", None),
        (3L, "a", Some(1L)), (4L, "b", Some(9L)), (5L, "b", None))
        .toDF("id", "p", "u")
      base.write.mode("overwrite").partitionBy("p").parquet(dir)
      ChangeData.purgeRows(spark, dir, "p", $"u" === 9L)
      val got = spark.read.parquet(dir).select("id", "p")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got === Seq((2L, "a"), (3L, "a"), (5L, "b")),
        "NULL-predicate rows must survive a purge")
    } finally graft.pipeline.Ingest.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }

  test("scd2Merge: boundary collapse extends, untouched keys pass, " +
      "merged == from-scratch, late changes are loud") {
    def mk(rows: Seq[(String, Long, Long, String)]) =
      rows.toDF("k", "sec", "id", "val")
        .select(col("k"), timestamp_seconds(col("sec")).as("t"),
          col("id"), col("val"))
    val hist = mk(Seq(("a", 10L, 1L, "x"), ("a", 20L, 2L, "y"),
      ("b", 15L, 3L, "z")))
    // a: delta repeats 'y' (must EXTEND v2) then flips to 'x';
    // b untouched; c is a brand-new key
    val delta = mk(Seq(("a", 30L, 4L, "y"), ("a", 40L, 5L, "x"),
      ("c", 25L, 6L, "q")))
    val dim = ChangeData.scd2(hist, Seq("k"), "t", "id", Seq("val"))
    val merged = ChangeData.scd2Merge(dim, delta, Seq("k"), "t", "id",
      Seq("val"))
    val scratch = ChangeData.scd2(hist.unionByName(delta), Seq("k"),
      "t", "id", Seq("val"))
    assert(merged.exceptAll(scratch).unionAll(scratch.exceptAll(merged))
      .isEmpty, "merged dimension diverged from the from-scratch build")
    val aRows = merged.filter(col("k") === "a")
      .orderBy("version_n").collect()
    assert(aRows.length === 3, "the repeated value must extend, not fork")
    // a late change (before a's current valid_from at 20) must be loud
    val late = mk(Seq(("a", 12L, 9L, "w")))
    val e = intercept[IllegalArgumentException] {
      ChangeData.scd2Merge(dim, late, Seq("k"), "t", "id", Seq("val"))
    }
    assert(e.getMessage.contains("precedes"))
  }
}
