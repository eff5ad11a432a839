package graft

import graft.operators.Coreset

/** Hand-checkable laws for k-center greedy (q327 gates the corpus-level
  * theorems; the exact selection order and radius arithmetic pin here).
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def deg(a: Double) = math.toRadians(a)
  private def pt(a: Double) = Array(math.cos(deg(a)), math.sin(deg(a)))

  test("selection order and prefix radii on a hand fixture") {
    // angles: id1=0°, id2=5°, id3=90°, id4=180°. Seed = min id (1).
    // Farthest from 1 is 4 (cos dist 2); then 3 (dist 1 to both);
    // radius after k=3 is id2's distance to id1 = 1 − cos 5°.
    val d = Seq((1L, pt(0)), (2L, pt(5)), (3L, pt(90)), (4L, pt(180)))
      .toDF("vec_id", "embedding")
    val centers = Coreset.kCenterGreedy(d, "vec_id", "embedding", 3)
    assert(centers.map(_._1) === Seq(1L, 4L, 3L))
    val radii = Coreset.prefixRadii(d, "vec_id", "embedding", centers)
    assert(radii.map(_._1) === Seq(1, 2, 3))
    // k=1: farthest is id4 at distance 2; k=2: id3 at 1; k=3: id2
    assert(math.abs(radii(0)._2 - 2.0) < 1e-6)
    assert(math.abs(radii(1)._2 - 1.0) < 1e-6)
    assert(math.abs(radii(2)._2 - (1.0 - math.cos(deg(5)))) < 1e-6)
  }

  test("argmax ties break to the smaller id") {
    // ids 2 and 3 are the SAME point, both farthest from the seed —
    // the smaller id must win (the determinism contract)
    val d = Seq((1L, pt(0)), (2L, pt(90)), (3L, pt(90)))
      .toDF("vec_id", "embedding")
    val centers = Coreset.kCenterGreedy(d, "vec_id", "embedding", 2)
    assert(centers.map(_._1) === Seq(1L, 2L))
  }

  test("radius sequence is non-increasing on real embeddings (the q327 theorem)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val centers = Coreset.kCenterGreedy(e, "vec_id", "embedding", 6)
    val radii = Coreset.prefixRadii(e, "vec_id", "embedding", centers)
    radii.sliding(2).foreach {
      case Seq((_, r1), (j, r2)) =>
        assert(r2 <= r1, s"radius increased at prefix $j: $r1 -> $r2")
      case _ =>
    }
  }
}
