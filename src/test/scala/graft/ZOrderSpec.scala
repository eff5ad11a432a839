package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** The z-order layout's two contracts: the Morton code itself (bit
  * interleaving), and the pruning GEOMETRY it buys — files are compact
  * rectangles in (a, b) space, so min-max stats prune on either
  * dimension, where a linear sort only ever prunes on its own key.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (Morton codes, a in even positions)") {
    val df = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (1L, 0L), (0L, 1L)).toDF("a", "b")
    val got = df.select(ZOrder.zValue($"a", $"b")).as[Long].collect().toSeq
    // morton(3,5): b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39.
    assert(got === Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL, 1L, 2L))
  }

  test("z-order files are 2-d rectangles: a b-only box prunes; a linear sort cannot") {
    // 128×128 integer grid split into 16 files: the z-curve makes each
    // file exactly one 32×32 quadrant block, so a b ≤ 31 slab touches 4
    // of 16 files; the same slab touches ALL 16 files of an a-sorted
    // layout, because every a-range file spans the full b domain.
    val grid = spark.range(0, 16384).select(
      (col("id") % 128).as("a"), (col("id") / lit(128)).cast("long").as("b"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zdir = s"$base/z"; val ldir = s"$base/lin"
    ZOrder.writeZOrdered(grid, zdir, "a", "b", numFiles = 16)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(ldir)

    def stats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("mna"), max("a").as("mxa"),
        min("b").as("mnb"), max("b").as("mxb"))
      .select("mna", "mxa", "mnb", "mxb")
      .as[(Long, Long, Long, Long)].collect()

    val zs = stats(zdir); val ls = stats(ldir)
    assert(zs.length === 16 && ls.length === 16)
    // File cuts come from RangePartitioner's SAMPLED quantiles, so file
    // boundaries sit near — not exactly on — the 1024-z quadrant edges;
    // a file straddling an edge bleeds into a neighboring rectangle.
    // The pinned property is the robust one: a b-only slab touches at
    // most half the z files (ideal: 4/16) and ALWAYS all linear files.
    def touchesB(s: (Long, Long, Long, Long)) = s._3 <= 31
    assert(ls.count(touchesB) === 16, "linear layout must touch every file")
    assert(zs.count(touchesB) <= 8,
      s"b-slab should prune most z files, touched ${zs.count(touchesB)}/16")
    // a-only slab prunes on BOTH layouts (z-order gives up nothing).
    def touchesA(s: (Long, Long, Long, Long)) = s._1 <= 31
    assert(zs.count(touchesA) <= 8 && ls.count(touchesA) <= 8)
    // 2-d box [0,31]×[0,31]: z confines it to ~one quadrant's worth of
    // files (ideal: 1; with boundary bleed a handful); linear pays its
    // full a-slab every time. The bleed is ORDER-DEPENDENT across a
    // shared session: RangePartitioner's reservoir-sample seed mixes in
    // the global rdd.id, so file boundaries shift with how many RDDs
    // ran before this test — the bound must tolerate one straddling
    // file per box edge (≤ 4 of 16), not pin the ideal count.
    def touchesBox(s: (Long, Long, Long, Long)) = s._1 <= 31 && s._3 <= 31
    assert(zs.count(touchesBox) <= 4,
      s"box should stay ~one quadrant, touched ${zs.count(touchesBox)}/16")
    assert(zs.count(touchesBox) <= ls.count(touchesBox))
  }

  test("z-ordering is pure layout: content round-trips exactly") {
    val orders = Tables.load(spark, sfDir, "orders")
    val dir = Tables.ordersZOrderLayout(spark, sfDir)
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }
}
