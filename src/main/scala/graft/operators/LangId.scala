package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-linear language identification — the fastText-style langid
  * operator (Joulin et al. 2016's shape): documents map to a
  * fixed-width hashed byte-n-gram histogram (`HashedNgramHist`, one
  * kernel pass per row), a multinomial softmax classifier trains over
  * those features, and prediction is a literal-weight argmax — one
  * map-side codegen projection, zero shuffle, streaming-legal. This is
  * the REAL operator behind q27's marker-count stand-in: the marker
  * heuristic can only see its 20 hand-picked function words (and
  * defaults to "en" when none appear); the hashed classifier sees the
  * whole byte-n-gram distribution, so it handles scripts, code
  * switching remnants, and words no marker list mentions (the
  * beats-the-heuristic law pins in LangIdSpec).
  *
  * Scale design: training reuses `trainLogisticFull`'s machinery
  * generalized to softmax — each GD step is ONE map-side-combinable
  * aggregate over the lineage-cut feature relation producing the whole
  * L×(K+1) gradient, with every per-row contribution quantized to the
  * 1e-6 integer grid, so gradient sums are exact, order-independent,
  * and the trained weights bit-equal `trainSoftmaxFullReference`
  * regardless of partitioning. Between steps the only driver state is
  * the L×(K+1) weight matrix.
  */
object LangId {

  /** A trained softmax model: weights(c)(k) + bias(c) per class. */
  final case class SoftmaxModel(weights: Array[Array[Double]],
      biases: Array[Double]) {
    def numClasses: Int = weights.length

    /** Per-class linear scores as column expressions (argmax of z is
      * argmax of softmax p — the normalizer never changes the vote).
      */
    def scores(features: Seq[Column]): Seq[Column] =
      weights.indices.map { c =>
        require(features.length == weights(c).length,
          s"SoftmaxModel: ${features.length} features for " +
            s"${weights(c).length} weights")
        features.zip(weights(c).toSeq)
          .map { case (f, w) => f * lit(w) }
          .reduceLeft(_ + _) + lit(biases(c))
      }

    /** Predicted class index with the deterministic lowest-index
      * tie-break (a chain of >= comparisons, pure codegen).
      */
    def predict(features: Seq[Column]): Column = {
      val z = scores(features)
      val n = z.length
      (0 until n - 1).foldLeft(when(lit(false), lit(0L))) { case (acc, c) =>
        acc.when((c + 1 until n).map(d => z(c) >= z(d)).reduceLeft(_ && _),
          lit(c.toLong))
      }.otherwise(lit((n - 1).toLong))
    }
  }

  /** Add normalized hashed-n-gram feature columns: the K-bucket
    * histogram (ONE kernel pass per row) scaled to K·count/total — the
    * bucket's RELATIVE frequency times K, so features average ~1
    * regardless of K (raw 1/K-scale fractions make the 1e-6-quantized
    * gradients so small that GD crawls; at mean ~1 the fixture
    * converges in ~15 steps instead of ~100). Total floors at 1 so
    * empty docs give all-zero features, not NULLs. Returns the widened
    * frame and the feature column names to hand to `trainSoftmaxFull`.
    *
    * Lineage shape matters here for the DRIVER, not the executors:
    * Catalyst's constraint propagation substitutes alias definitions
    * into the inherited constraint set at every Project, keeping both
    * forms — across K+ CHAINED withColumn layers the variant count
    * grows combinatorially and `localCheckpoint`'s constraint rewrite
    * alone exhausts the driver heap (observed: q310's first cut at
    * K=32). So the histogram materializes behind its own lineage cut
    * first, and the K feature divisions expand as SIBLING aliases in
    * ONE projection over the cut relation — substitution depth 1,
    * linear constraint growth, same row-level work.
    */
  def withNgramFeatures(df: DataFrame, textCol: String, n: Int,
      buckets: Int, prefix: String = "x"): (DataFrame, Seq[String]) = {
    val base = Checkpoints.cutNoConstraints(df
      .withColumn("__hist",
        graft.expressions.TextOps.hashedNgramHist(col(textCol), n, buckets))
      .withColumn("__tot",
        greatest(aggregate(col("__hist"), lit(0L), (a, x) => a + x), lit(1L))
          .cast("double")))
    val names = (0 until buckets).map(k => s"$prefix$k")
    val keep = base.columns
      .filterNot(c => c == "__hist" || c == "__tot").map(col)
    val featCols = (0 until buckets).map(k =>
      (element_at(col("__hist"), k + 1).cast("double") * lit(buckets.toDouble)
        / col("__tot")).as(s"$prefix$k"))
    (base.select(keep ++ featCols: _*), names)
  }

  /** Driver-side mirror of `ngramFeatures` for the referee: identical
    * xxHash64(seed 42) over the same UTF-8 bytes, identical floorMod
    * bucketing, identical single divide.
    */
  def ngramFeaturesReference(text: String, n: Int,
      buckets: Int): Array[Double] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hist = new Array[Long](buckets)
    var i = 0
    while (i + n <= bytes.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, n, 42L)
      hist(java.lang.Math.floorMod(h, buckets.toLong).toInt) += 1L
      i += 1
    }
    val total = math.max(hist.sum, 1L).toDouble
    hist.map(_.toDouble * buckets / total)
  }

  /** Distributed full-corpus softmax training — `trainLogisticFull`'s
    * discipline for L classes: per GD step, ONE `treeAggregate` over
    * the persisted feature RDD computes the whole L×(K+1) gradient,
    * with every per-row contribution quantized to the 1e-6 integer
    * grid (exact Long partials → order-independent merge, so trained
    * weights bit-equal `trainSoftmaxFullReference` under any
    * partitioning). `labelCol` must hold class indices
    * 0..numClasses-1.
    *
    * Why an RDD loop and not a per-step DataFrame aggregate: each GD
    * step's plan carries the CURRENT weights, so Catalyst must
    * re-analyze, re-optimize, and re-codegen EVERY step (~0.6 s of
    * pure driver overhead per step measured on the q310 shape, vs
    * ~40 ms for the equivalent treeAggregate job) — iterative numeric
    * optimization over a materialized narrow relation is the
    * textbook per-partition-imperative case (spark.ml's own GD runs
    * exactly this treeAggregate shape). The per-row kernel mirrors
    * the reference operation-for-operation: left-to-right dot with
    * bias last, softmax denominator summed in class order,
    * math.floor(err·x·1e6) quantization.
    */
  def trainSoftmaxFull(df: DataFrame, featureCols: Seq[String],
      labelCol: String, numClasses: Int, iters: Int = 60,
      lr: Double = 100.0): SoftmaxModel = {
    require(featureCols.nonEmpty, "trainSoftmaxFull: no features")
    require(numClasses >= 2,
      s"trainSoftmaxFull: numClasses must be >= 2, got $numClasses")
    require(iters >= 1, s"trainSoftmaxFull: iters must be >= 1, got $iters")
    val dim = featureCols.length
    val nc = numClasses
    val data = df.select(
        featureCols.map(c => col(c).cast("double")) :+
          col(labelCol).cast("long"): _*)
      .na.drop()
      .rdd.map { r =>
        val x = new Array[Double](dim)
        var d = 0
        while (d < dim) { x(d) = r.getDouble(d); d += 1 }
        (x, r.getLong(dim).toInt)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    require(n > 0, "trainSoftmaxFull: empty feature relation")
    val w = Array.fill(nc)(new Array[Double](dim))
    val b = new Array[Double](nc)
    val gLen = nc * (dim + 1)
    var it = 0
    while (it < iters) {
      val wNow = w.map(_.clone())
      val bNow = b.clone()
      val g = data.treeAggregate(new Array[Long](gLen))(
        seqOp = (acc, row) => {
          val (x, y) = row
          val ez = new Array[Double](nc)
          var c = 0
          while (c < nc) {
            var z = wNow(c)(0) * x(0)
            var d = 1
            while (d < dim) { z += wNow(c)(d) * x(d); d += 1 }
            z += bNow(c)
            ez(c) = math.exp(z)
            c += 1
          }
          var den = ez(0)
          c = 1
          while (c < nc) { den += ez(c); c += 1 }
          c = 0
          while (c < nc) {
            val err = ez(c) / den - (if (y == c) 1.0 else 0.0)
            var d = 0
            while (d < dim) {
              acc(c * (dim + 1) + d) += math.floor(err * x(d) * 1e6).toLong
              d += 1
            }
            acc(c * (dim + 1) + dim) += math.floor(err * 1e6).toLong
            c += 1
          }
          acc
        },
        combOp = (a1, a2) => {
          var i = 0
          while (i < gLen) { a1(i) += a2(i); i += 1 }
          a1
        })
      var c = 0
      while (c < nc) {
        var d = 0
        while (d < dim) {
          w(c)(d) -= lr * (g(c * (dim + 1) + d).toDouble / 1e6) / n
          d += 1
        }
        b(c) -= lr * (g(c * (dim + 1) + dim).toDouble / 1e6) / n
        c += 1
      }
      it += 1
    }
    data.unpersist(blocking = false)
    SoftmaxModel(w, b)
  }

  /** Driver-side restatement of `trainSoftmaxFull` — the referee.
    * Mirrors every floating-point operation: per-class dot products
    * accumulate left-to-right starting from the first product with the
    * bias LAST, the softmax denominator sums exp(z_c) in class order,
    * gradient cells quantize with math.floor(err·x·1e6). Loud bound:
    * a gate tool, not the scale path.
    */
  def trainSoftmaxFullReference(rows: Array[(Array[Double], Int)],
      numClasses: Int, iters: Int = 60, lr: Double = 100.0): SoftmaxModel = {
    require(rows.length <= 1000000,
      "trainSoftmaxFullReference is the bounded referee - use " +
        "trainSoftmaxFull at scale")
    require(rows.nonEmpty, "trainSoftmaxFullReference: empty input")
    val dim = rows.head._1.length
    require(dim >= 1 && numClasses >= 2, "trainSoftmaxFullReference: shape")
    val n = rows.length
    val w = Array.fill(numClasses)(new Array[Double](dim))
    val b = new Array[Double](numClasses)
    var it = 0
    while (it < iters) {
      val gw = Array.fill(numClasses)(new Array[Long](dim))
      val gb = new Array[Long](numClasses)
      var i = 0
      while (i < n) {
        val (x, y) = rows(i)
        val ez = new Array[Double](numClasses)
        var c = 0
        while (c < numClasses) {
          var z = w(c)(0) * x(0)
          var d = 1
          while (d < dim) { z += w(c)(d) * x(d); d += 1 }
          z += b(c)
          ez(c) = math.exp(z)
          c += 1
        }
        var den = ez(0)
        c = 1
        while (c < numClasses) { den += ez(c); c += 1 }
        c = 0
        while (c < numClasses) {
          val err = ez(c) / den - (if (y == c) 1.0 else 0.0)
          var d = 0
          while (d < dim) {
            gw(c)(d) += math.floor(err * x(d) * 1e6).toLong
            d += 1
          }
          gb(c) += math.floor(err * 1e6).toLong
          c += 1
        }
        i += 1
      }
      var c = 0
      while (c < numClasses) {
        var d = 0
        while (d < dim) {
          w(c)(d) -= lr * (gw(c)(d).toDouble / 1e6) / n
          d += 1
        }
        b(c) -= lr * (gb(c).toDouble / 1e6) / n
        c += 1
      }
      it += 1
    }
    SoftmaxModel(w, b)
  }

  /** Driver-side argmax mirror (same >= lowest-index tie-break). */
  def predictReference(m: SoftmaxModel, x: Array[Double]): Int = {
    val z = m.weights.indices.map { c =>
      var acc = m.weights(c)(0) * x(0)
      var d = 1
      while (d < x.length) { acc += m.weights(c)(d) * x(d); d += 1 }
      acc + m.biases(c)
    }
    var best = m.numClasses - 1
    var c = m.numClasses - 2
    while (c >= 0) {
      if ((c + 1 until m.numClasses).forall(d => z(c) >= z(d))) best = c
      c -= 1
    }
    best
  }
}
