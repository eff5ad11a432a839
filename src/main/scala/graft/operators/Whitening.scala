package graft.operators

import graft.expressions.ArrayOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA WHITENING at corpus scale — the embedding-conditioning pass a
  * retrieval/dedup stack runs before cosine work (anisotropic encoder
  * outputs make cosine scores bunch; whitening restores contrast).
  * Three pieces, each with the house exactness discipline:
  *
  *  - `meanAndCovGrid`: exact second-moment census. Every row's
  *    contributions quantize to the 1e-6 integer grid as Longs
  *    (`math.floor(x·1e6)` — the q309 discipline), summed by ONE
  *    `treeAggregate` over a persisted narrow RDD, so the d + d(d+1)/2
  *    partials are exact integers: order-independent across partitions,
  *    bit-reproducible under any repartitioning. Driver state is the
  *    d×d model, never data.
  *  - `jacobiEigen`: cyclic Jacobi on the driver over the model-sized
  *    symmetric matrix — deterministic (fixed sweep order, fixed
  *    convergence threshold), eigenpairs sorted (value desc, then a
  *    sign canon: first nonzero component positive).
  *  - `whitenColumn`: the transform y_k = (q_k·x − q_k·m)/√(λ_k+eps)
  *    as literal-weight codegen columns (`ArrayOps.dot` against a
  *    literal array per component — zero shuffle, streaming-legal, the
  *    q310 predict shape).
  *
  * The q323 gate re-runs the SAME exact census on the whitened output
  * and requires covariance ≈ I (off-diagonals and diagonal-minus-one
  * within a quantization-honest tolerance) plus exact eigen sanity
  * (trace preserved on the grid, eigenvalues non-increasing) — all as
  * violation rows against the empty oracle.
  */
object Whitening {

  /** (mean, covariance, n) of an array<double>-castable vector column.
    * Grid-exact: see object doc. Loud on ragged or oversized values
    * (the grid bound: |x| ≤ 1e3 keeps x·x·1e6 per-row ≤ 1e12, safe for
    * ~9e6 rows per Long partial per cell at worst case — embeddings
    * are unit-scale, far inside it).
    */
  def meanAndCovGrid(df: DataFrame, vecCol: String)
      : (Array[Double], Array[Array[Double]], Long) = {
    val data = df.select(Similarity.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val first = data.take(1)
      require(first.nonEmpty, s"meanAndCovGrid: no non-null $vecCol rows")
      val dim = first.head.length
      // layout: [n, mean grid (dim), upper-triangle moment grid]
      val nUT = dim * (dim + 1) / 2
      val acc0 = new Array[Long](1 + dim + nUT)
      val g = data.treeAggregate(acc0)(
        seqOp = (acc, x) => {
          require(x.length == dim,
            s"meanAndCovGrid: ragged vectors (${x.length} vs $dim)")
          acc(0) += 1L
          var i = 0
          var t = 1 + dim
          while (i < dim) {
            val xi = x(i)
            require(math.abs(xi) <= 1e3,
              s"meanAndCovGrid: |value| $xi exceeds the 1e3 grid bound")
            acc(1 + i) += math.floor(xi * 1e6).toLong
            var j = i
            while (j < dim) {
              acc(t) += math.floor(xi * x(j) * 1e6).toLong
              j += 1; t += 1
            }
            i += 1
          }
          acc
        },
        combOp = (a1, a2) => {
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          a1
        })
      val n = g(0)
      val mean = Array.tabulate(dim)(i => g(1 + i).toDouble / 1e6 / n)
      val cov = Array.ofDim[Double](dim, dim)
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        var j = i
        while (j < dim) {
          val m2 = g(t).toDouble / 1e6 / n
          val c = m2 - mean(i) * mean(j)
          cov(i)(j) = c; cov(j)(i) = c
          j += 1; t += 1
        }
        i += 1
      }
      (mean, cov, n)
    } finally { data.unpersist(false); () }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues desc, eigenvectors as ROWS aligned with them), fully
    * deterministic — fixed (p,q) sweep order, rotation skipped below
    * 1e-14, at most `maxSweeps` sweeps. Each eigenvector's sign is
    * canonicalized (first component with |·| > 1e-12 made positive) so
    * downstream literals never depend on rotation accumulation order.
    */
  def jacobiEigen(mat: Array[Array[Double]], maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = mat.length
    require(d >= 1 && mat.forall(_.length == d), "jacobiEigen: not square")
    val a = Array.tabulate(d, d)((i, j) => mat(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-20) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = Array.tabulate(d)(k => v(k)(i))
      val lead = row.indexWhere(x => math.abs(x) > 1e-12)
      if (lead >= 0 && row(lead) < 0) row.map(-_) else row
    }.toArray
    (vals, vecs)
  }

  /** Whitening transform as a literal-weight codegen column:
    * component k is (q_k·x − q_k·mean)/√(λ_k+eps). `topD` components
    * (PCA truncation when < d). Zero shuffle; streaming-legal.
    */
  def whitenColumn(vec: Column, mean: Array[Double],
      eigvals: Array[Double], eigvecs: Array[Array[Double]], topD: Int,
      eps: Double = 1e-9): Column = {
    require(topD >= 1 && topD <= eigvals.length,
      s"whitenColumn: topD $topD out of range 1..${eigvals.length}")
    val v = Similarity.asDouble(vec)
    val comps = (0 until topD).map { k =>
      val q = eigvecs(k)
      val shift = q.zip(mean).map { case (a, b) => a * b }.sum
      (ArrayOps.dot(v, typedLit(q.toSeq)) - lit(shift)) /
        lit(math.sqrt(math.max(eigvals(k), 0.0) + eps))
    }
    array(comps: _*)
  }
}
