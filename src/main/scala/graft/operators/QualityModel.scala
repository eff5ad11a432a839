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
}
