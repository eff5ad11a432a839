package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Brute-force top-k is the ground truth; the IVF approximate path is
  * graded by recall against it (the oracle can't check an approximate
  * operator, so its contract lives here).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK: hand-checkable 2-d example") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Double)].collect()
    // Nearest to (1,0): (0.9,0.1) then (0,1); the antipode is excluded by k.
    assert(out.map(r => (r._2, r._3)).toSeq === Seq((1L, 1L), (2L, 2L)))
  }

  test("ivfTopK recall >= 0.9 vs brute force on sf0.001 embeddings") {
    // The synthetic embeddings are ISOTROPIC (no cluster structure), the
    // adversarial case for IVF: recall here is pure trained-centroid +
    // multi-assignment quality, with zero help from the data.
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9 (|exact|=${exact.size})")
  }

  test("ivfTopK ranks are dense and unique per query") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val out = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "rank").as[(Long, Long)].collect()
    // Multi-assignment must not double-count a neighbor: ranks 1..5 once.
    out.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"query $qid ranks ${rs.toSeq}")
    }
  }

  test("RHP-LSH pairs: recall >= 0.9 vs exact pairs, precision 1.0 (verified)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.rhpCosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert((lsh -- exact).isEmpty, "verification must kill false positives")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"RHP recall $recall < 0.9 (|exact|=${exact.size})")
  }

  test("resizeStub subsamples payload bytes deterministically") {
    val docs = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val resized = graft.operators.Multimodal.resizeStub(
      graft.operators.Multimodal.toMedia(docs), factor = 2).collect()
    assert(resized.head.payload.map(_.toChar).mkString === "aceg")
  }

  test("cosinePairs symmetric-free output: id_a < id_b always") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val pairs = Similarity.cosinePairs(e.limit(200), "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2))
  }
}
