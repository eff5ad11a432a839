package graft.operators

import graft.expressions.ArrayOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CORESET selection — k-center greedy (farthest-point sampling), the
  * standard pick for "choose k maximally-diverse exemplars" over an
  * embedding corpus (active-learning seeds, eval-set construction,
  * prototype audits). Greedy k-center is a 2-approximation of the
  * optimal covering radius, and its radius sequence is provably
  * NON-INCREASING in k — the q327 gate checks that theorem plus a
  * strict win over a naive first-k baseline.
  *
  * Scale shape: k driver rounds, each ONE corpus pass — the candidate
  * scan computes min-distance-to-selected with the selected centers as
  * LITERAL arrays (`ArrayOps.dot` per center — model-sized, k·d
  * doubles in the plan) and reduces with one max-struct aggregate. The
  * corpus never shuffles; driver state is k vectors. Deterministic:
  * the seed center is the minimum id, every argmax tie breaks to the
  * smaller id.
  */
object Coreset {

  /** Cosine distance (1 − cos) from `vec` to the literal `center`. */
  private def distTo(vec: Column, center: Array[Double]): Column = {
    val c = typedLit(center.toSeq)
    lit(1.0) - ArrayOps.dot(vec, c) /
      (sqrt(ArrayOps.dot(vec, vec)) * lit(math.sqrt(
        center.map(x => x * x).sum)))
  }

  /** The k greedily-selected (id, vector) centers, in selection order. */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Long, Array[Double])] = {
    require(k >= 1, s"kCenterGreedy: k must be >= 1, got $k")
    val vecs = Checkpoints.cut(corpus
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull))
    val seedRow = vecs.orderBy("id").limit(1).collect()
    require(seedRow.nonEmpty, "kCenterGreedy: empty corpus")
    val centers = scala.collection.mutable.ArrayBuffer(
      (seedRow.head.getLong(0), seedRow.head.getSeq[Double](1).toArray))
    while (centers.length < k) {
      val minDist = centers.map(c => distTo(col("v"), c._2))
        .reduce((a, b) => least(a, b))
      // farthest point; ties to the SMALLER id (max of (dist, -id))
      val next = vecs
        .filter(!col("id").isInCollection(centers.map(_._1)))
        .select(max(struct(minDist.as("d"), (-col("id")).as("nid"),
          col("v").as("v"))).as("m"))
        .select(col("m.nid"), col("m.v"))
        .collect().head
      centers += ((-next.getLong(0), next.getSeq[Double](1).toArray))
    }
    centers.toSeq
  }

  /** Covering radius of each selection PREFIX in one corpus pass:
    * (j, radius_j 6dp) for j = 1..k, where radius_j = max over the
    * corpus of min-distance to the first j centers.
    */
  def prefixRadii(corpus: DataFrame, idCol: String, vecCol: String,
      centers: Seq[(Long, Array[Double])]): Seq[(Int, Double)] = {
    val vecs = corpus
      .select(Similarity.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
    val cols = centers.indices.map { j =>
      max(centers.take(j + 1).map(c => distTo(col("v"), c._2))
        .reduce((a, b) => least(a, b))).as(s"r$j")
    }
    val row = vecs.agg(cols.head, cols.tail: _*).collect().head
    centers.indices.map(j =>
      (j + 1, math.rint(row.getDouble(j) * 1e6) / 1e6))
  }
}
