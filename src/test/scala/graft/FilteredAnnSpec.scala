package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Laws for metadata-filtered ANN (q348 gates the recall floor and the
  * predicate contract at battery scale; the exactness boundaries pin
  * here).
  */
class FilteredAnnSpec extends SparkSpec {

  private lazy val e = Tables.load(spark, sfDir, "embeddings")
  private lazy val q = e.filter(col("vec_id") < 6)
  private lazy val filtered = e.filter(col("label").isin(0, 1, 2))
  private lazy val cents = Similarity.trainIvfCentroids(e, "vec_id",
    "embedding", nlist = 8, iters = 5)

  test("full-probe filtered IVF equals filtered brute force") {
    val exact = Similarity.bruteForceTopK(filtered, q, "vec_id",
        "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank").collect().toSeq
    val full = Similarity.ivfTopKWithCentroids(filtered, q, "vec_id",
        "embedding", k = 5, cents, nprobe = 8)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank").collect().toSeq
    assert(full === exact,
      "probing every bucket must reduce filtered IVF to exact search")
  }

  test("a single-survivor filter returns exactly that vector") {
    val soleId = filtered.orderBy("vec_id").limit(1)
      .collect().head.getLong(0)
    val sole = e.filter(col("vec_id") === soleId)
    val res = Similarity.ivfTopKWithCentroids(sole, q, "vec_id",
        "embedding", k = 5, cents, nprobe = 8, excludeSelf = false)
      .select("query_id", "neighbor_id").collect()
    assert(res.nonEmpty && res.forall(_.getLong(1) == soleId),
      "with one admissible vector every query must return it and only it")
  }

  test("q348 gate emits no violations on sf0.001") {
    val rows = SparkEntry.queries("q348_filtered_ann")(spark, sfDir)
    assert(rows.isEmpty, rows.collect().mkString("; "))
  }
}
