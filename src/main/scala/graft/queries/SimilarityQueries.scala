package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search battery over the `embeddings` table (array<float>).
  * Arithmetic is promoted to double on both sides (Spark `transform` cast,
  * DuckDB CAST(... AS DOUBLE[])) and results rounded to 6dp so the two
  * engines' accumulation orders can't flip the hash compare.
  */
object SimilarityQueries {
  import RelationalQueries.Q

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: broadcast query set, one corpus scan.
    "q31_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // Embedding near-dup END-TO-END: cosine pairs → connected components
    // → the representative a dedup pass keeps (the full embedding-based
    // dedup flow, composing the pair machinery with min-label
    // propagation). At scale the pair stage is rhpCosinePairs; the
    // component/representative stages are identical.
    "q62_embed_neardup_reps" -> ((s, dir) => {
      val pairs = Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding",
        threshold = 0.4)
      graft.operators.Dedup.nearDupComponents(pairs)
        .select(col("doc_id").as("vec_id"), col("rep_id"))
        .orderBy("vec_id")
    }),

    // Embedding near-dup pairs above a cosine threshold — the EXACT
    // all-pairs operator (quadratic by contract; its guard names
    // rhpCosinePairs as the scale path). BENCH_r02's 11 s for this
    // query was machine-load drift, not operator cost: re-measured at
    // 1.6 s with the identical plan (see BASELINE.md bench-methodology
    // note) — so it stays benched unbounded, deliberately.
    "q32_cosine_pairs" -> ((s, dir) => {
      Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // IVF-bucketed approximate top-k (the 100 TB scale path) — recall vs
    // brute force is pinned in SimilaritySpec; no SQL oracle (approximate).
    "q33_ivf_ann" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // Same top-k semantics as q31 but via the bounded TopKAggregator
    // (map-side partial heaps, k rows shuffled per group-partition
    // instead of the full score matrix) — shares q31's oracle shape.
    "q50_topk_aggregator" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopKAgg(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // Random-hyperplane LSH near-dup pairs (the bucketed scale path for
    // q32's exact all-pairs) — approximate recall, so rows-only check;
    // the recall floor vs q32 is pinned in SimilaritySpec and the
    // precision direction is hash-gated by q67.
    "q49_rhp_pairs" -> ((s, dir) => {
      Similarity.rhpCosinePairs(emb(s, dir), "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // Precision gate for q49: every RHP-emitted pair must appear in the
    // exact all-pairs result with the SAME rounded similarity (LSH only
    // prunes candidates; it must never invent or mis-score a pair).
    // The oracle is the EMPTY relation, so a precision bug becomes a
    // driver-gate row mismatch. Recall stays approximate — that
    // direction is the SimilaritySpec floor, not a deterministic
    // property. Bounded to vec_id < 1000: the gate re-runs BOTH pair
    // paths, and the property is scale-free.
    "q67_rhp_subset" -> ((s, dir) => {
      val sliced = emb(s, dir).filter(col("vec_id") < 1000)
      val rhp = Similarity.rhpCosinePairs(sliced, "vec_id", "embedding",
        threshold = 0.4)
      val exact = Similarity.cosinePairs(sliced, "vec_id", "embedding",
        threshold = 0.4)
      rhp.exceptAll(exact).orderBy("id_a", "id_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "q31_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        | c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        | s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |       FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        | r AS (SELECT query_id, neighbor_id, sim,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        |       FROM s)
        |SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q32_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        list_cosine_similarity(a.v, b.v) AS sim
        |       FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, ROUND(sim, 6) AS sim
        |FROM p WHERE sim >= 0.4 ORDER BY 1,2""".stripMargin,
    // q33_ivf_ann, q49_rhp_pairs: intentionally no oracle (approximate);
    // q67 gates q49's precision direction to the empty diff.
    "q67_rhp_subset" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |  CAST(NULL AS DOUBLE) AS sim
        |WHERE FALSE""".stripMargin,
    "q62_embed_neardup_reps" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e0 a CROSS JOIN e0 b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.v, b.v) >= 0.4),
        | e AS (SELECT id_a AS src, id_b AS dst FROM p
        |       UNION SELECT id_b, id_a FROM p),
        | reach AS (
        |  SELECT src AS node, dst AS peer FROM e
        |  UNION
        |  SELECT node, e.dst FROM reach JOIN e ON reach.peer = e.src
        |  WHERE e.dst <> reach.node)
        |SELECT node AS vec_id,
        |  LEAST(node, MIN(peer)) AS rep_id
        |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin,
    "q50_topk_aggregator" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        | c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        | s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |       FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        | r AS (SELECT query_id, neighbor_id, sim,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        |       FROM s)
        |SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  )
}
