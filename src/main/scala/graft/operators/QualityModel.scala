package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality/domain filtering — the GPT-3/CCNet pattern: a
  * tiny linear classifier separates "wanted" from "unwanted" documents,
  * and the corpus keeps what the model scores above a threshold.
  *
  * Scale design (the train-small/apply-wide split every learned
  * component here uses, like the IVF/PQ trainers): training runs
  * DRIVER-SIDE on a bounded, deterministic, hash-ordered feature sample
  * (model-sized work — a few hundred rows of a few doubles); scoring is
  * a literal-weight column expression (one sigmoid of a dot product),
  * so applying the model to 100 TB is a single map-side codegen pass
  * with zero shuffle. Batch gradient descent with zero init and fixed
  * iterations keeps the fit fully deterministic — no RNG anywhere.
  */
object QualityModel {

  final case class Model(weights: Array[Double], bias: Double) {
    /** The classifier as a column expression: sigmoid(w·x + b) over
      * literal weights — codegen'd arithmetic, no UDF.
      */
    def score(features: Seq[Column]): Column = {
      require(features.length == weights.length,
        s"Model.score: ${features.length} features for ${weights.length} weights")
      val z = features.zip(weights.toSeq)
        .map { case (f, w) => f * lit(w) }
        .reduceLeft(_ + _) + lit(bias)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
  }

  /** Bounded deterministic (features, label) sample — hash-ordered by
    * the id like `Similarity.sampleVectors`, so the same corpus always
    * trains the same model.
    */
  def sampleFeatures(df: DataFrame, idCol: String, featureCols: Seq[String],
                     labelCol: String, sampleSize: Int = 512)
      : Array[(Array[Double], Double)] =
    df.select((col(idCol) +: featureCols.map(c => col(c).cast("double")))
        :+ col(labelCol).cast("double"): _*)
      .na.drop()
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleSize)
      .collect()
      .map(r => (featureCols.indices.map(i => r.getDouble(i + 1)).toArray,
        r.getDouble(featureCols.length + 1)))

  /** Plain batch gradient descent on log-loss, zero-initialized, fixed
    * iteration count — deterministic given the sample. Good enough for
    * the few-feature quality classifiers this pattern ships (the model
    * is a filter, not the product).
    */
  def trainLogistic(sample: Array[(Array[Double], Double)],
                    iters: Int = 500, lr: Double = 1.0): Model = {
    require(sample.nonEmpty, "trainLogistic: empty sample")
    val dim = sample.head._1.length
    val w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      var i = 0
      while (i < sample.length) {
        val (x, y) = sample(i)
        var z = b
        var d = 0
        while (d < dim) { z += w(d) * x(d); d += 1 }
        val err = 1.0 / (1.0 + math.exp(-z)) - y
        d = 0
        while (d < dim) { gw(d) += err * x(d); d += 1 }
        gb += err
        i += 1
      }
      var d = 0
      while (d < dim) { w(d) -= lr * gw(d) / sample.length; d += 1 }
      b -= lr * gb / sample.length
      it += 1
    }
    Model(w, b)
  }

  /** Distributed full-corpus logistic training — the scale path that
    * removes `sampleFeatures`' driver bound: each GD step is ONE
    * `treeAggregate` over the persisted feature RDD, so the training
    * set is the whole corpus and the only driver state is the
    * (dim+1)-double model between steps. Per-row gradient
    * contributions quantize to the 1e-6 integer grid
    * (`math.floor(err·x·1e6)` as Long — the Unigram E-step
    * discipline), so the partials are exact integers,
    * order-independent across partitions, and bit-reproducible
    * against the driver reference regardless of partitioning. The
    * per-row kernel mirrors `trainLogisticFullReference`
    * operation-for-operation (left-to-right dot starting from the
    * first product, bias added LAST, same grid divide), so engine and
    * referee weights are IDENTICAL doubles, not approximately equal.
    *
    * Why an RDD loop and not a per-step DataFrame aggregate: the
    * weights change every step, so a DataFrame formulation re-plans
    * and re-codegens each step (~0.1-0.6 s of driver overhead per
    * step measured) — iterative numeric optimization over a
    * materialized narrow relation is the textbook
    * per-partition-imperative case (spark.ml's GD runs this same
    * treeAggregate shape). Cost at 100 TB: `iters` passes over a
    * narrow persisted projection — the price of unbounded training
    * data; keep iters modest and features few (a filter, not the
    * product).
    */
  def trainLogisticFull(df: DataFrame, featureCols: Seq[String],
      labelCol: String, iters: Int = 60, lr: Double = 100.0): Model = {
    require(featureCols.nonEmpty, "trainLogisticFull: no features")
    require(iters >= 1, s"trainLogisticFull: iters must be >= 1, got $iters")
    val dim = featureCols.length
    val data = df.select(
        featureCols.map(c => col(c).cast("double")) :+
          col(labelCol).cast("double"): _*)
      .na.drop()
      .rdd.map { r =>
        val x = new Array[Double](dim)
        var d = 0
        while (d < dim) { x(d) = r.getDouble(d); d += 1 }
        (x, r.getDouble(dim))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    require(n > 0, "trainLogisticFull: empty feature relation")
    val w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val wNow = w.clone()
      val bNow = b
      val g = data.treeAggregate(new Array[Long](dim + 1))(
        seqOp = (acc, row) => {
          val (x, y) = row
          var z = wNow(0) * x(0)
          var d = 1
          while (d < dim) { z += wNow(d) * x(d); d += 1 }
          z += bNow
          val err = 1.0 / (1.0 + math.exp(-z)) - y
          d = 0
          while (d < dim) {
            acc(d) += math.floor(err * x(d) * 1e6).toLong
            d += 1
          }
          acc(dim) += math.floor(err * 1e6).toLong
          acc
        },
        combOp = (a1, a2) => {
          var i = 0
          while (i <= dim) { a1(i) += a2(i); i += 1 }
          a1
        })
      var d = 0
      while (d < dim) {
        w(d) -= lr * (g(d).toDouble / 1e6) / n
        d += 1
      }
      b -= lr * (g(dim).toDouble / 1e6) / n
      it += 1
    }
    data.unpersist(blocking = false)
    Model(w, b)
  }

  /** Driver-side restatement of `trainLogisticFull` — the q309 referee.
    * Every floating-point operation mirrors the engine exactly: the dot
    * product accumulates left-to-right starting from the first product,
    * the bias adds LAST, gradient cells quantize with
    * `math.floor(err·x·1e6)` (Spark's `floor` on DOUBLE is the same
    * `Math.floor` + long cast), and updates divide on the same grid —
    * so reference weights bit-equal the distributed trainer's. Loud
    * bound: a gate tool, not the scale path.
    */
  def trainLogisticFullReference(rows: Array[(Array[Double], Double)],
      iters: Int = 60, lr: Double = 100.0): Model = {
    require(rows.length <= 1000000,
      "trainLogisticFullReference is the bounded referee - use " +
        "trainLogisticFull at scale")
    require(rows.nonEmpty, "trainLogisticFullReference: empty input")
    val dim = rows.head._1.length
    require(dim >= 1, "trainLogisticFullReference: no features")
    val n = rows.length
    val w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Long](dim)
      var gb = 0L
      var i = 0
      while (i < n) {
        val (x, y) = rows(i)
        var z = w(0) * x(0)
        var d = 1
        while (d < dim) { z += w(d) * x(d); d += 1 }
        z += b
        val err = 1.0 / (1.0 + math.exp(-z)) - y
        d = 0
        while (d < dim) {
          gw(d) += math.floor(err * x(d) * 1e6).toLong
          d += 1
        }
        gb += math.floor(err * 1e6).toLong
        i += 1
      }
      var d = 0
      while (d < dim) { w(d) -= lr * (gw(d).toDouble / 1e6) / n; d += 1 }
      b -= lr * (gb.toDouble / 1e6) / n
      it += 1
    }
    Model(w, b)
  }
}
