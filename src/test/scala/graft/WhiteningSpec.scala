package graft

import graft.operators.Whitening
import org.apache.spark.sql.functions._

/** Laws for the exact-census PCA whitening stack (q323 gates the
  * corpus-level identity-covariance property; the hand-checkable
  * algebra and the partition-order-proof census live here).
  */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  // grid-exact values (multiples of 1e-6 and products thereof), so the
  // census is EXACT, not approximately right
  private def fixture = Seq(
    (1L, Array(1.0, 2.0)), (2L, Array(3.0, 6.0)),
    (3L, Array(-1.0, 0.0)), (4L, Array(5.0, 4.0))
  ).toDF("id", "v")

  test("meanAndCovGrid matches the hand covariance exactly on grid-friendly values") {
    val (mean, cov, n) = Whitening.meanAndCovGrid(fixture, "v")
    assert(n === 4L)
    assert(mean.toSeq === Seq(2.0, 3.0))
    // E[x²]=9, E[xy]=10, E[y²]=14 → cov = [[5,4],[4,5]]
    assert(cov(0).toSeq === Seq(5.0, 4.0) && cov(1).toSeq === Seq(4.0, 5.0))
  }

  test("meanAndCovGrid is bit-identical under any repartitioning") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val (m1, c1, n1) = Whitening.meanAndCovGrid(e, "embedding")
    val (m2, c2, n2) = Whitening.meanAndCovGrid(e.repartition(7), "embedding")
    assert(n1 === n2 && m1.toSeq === m2.toSeq)
    c1.zip(c2).foreach { case (r1, r2) => assert(r1.toSeq === r2.toSeq) }
  }

  test("jacobiEigen recovers the hand eigenpairs of [[5,4],[4,5]]") {
    val (vals, vecs) = Whitening.jacobiEigen(
      Array(Array(5.0, 4.0), Array(4.0, 5.0)))
    assert(math.abs(vals(0) - 9.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
    // sign canon: leading component positive
    assert(vecs(1)(0) > 0)
    assert(vecs(1).zip(Array(r, -r)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("whitenColumn yields identity covariance on the hand fixture") {
    val (mean, cov, _) = Whitening.meanAndCovGrid(fixture, "v")
    val (vals, vecs) = Whitening.jacobiEigen(cov)
    val w = fixture.select(col("id"),
      Whitening.whitenColumn(col("v"), mean, vals, vecs, 2).as("wv"))
    val (wm, wc, _) = Whitening.meanAndCovGrid(w, "wv")
    wm.foreach(m => assert(math.abs(m) < 1e-5))
    for (i <- 0 until 2; j <- 0 until 2) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(wc(i)(j) - want) < 1e-4,
        s"cov($i)($j) = ${wc(i)(j)}")
    }
  }

  test("loud on ragged vectors and grid-bound violations") {
    val ragged = Seq((1L, Array(1.0, 2.0)), (2L, Array(1.0)))
      .toDF("id", "v")
    val e1 = intercept[org.apache.spark.SparkException] {
      Whitening.meanAndCovGrid(ragged, "v")
    }
    assert(e1.getMessage.contains("ragged") ||
      Option(e1.getCause).exists(_.getMessage.contains("ragged")))
    val big = Seq((1L, Array(2000.0, 0.0))).toDF("id", "v")
    val e2 = intercept[org.apache.spark.SparkException] {
      Whitening.meanAndCovGrid(big, "v")
    }
    assert(e2.getMessage.contains("grid bound") ||
      Option(e2.getCause).exists(_.getMessage.contains("grid bound")))
  }
}
