package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAXSCORE upper-bound pruning for additive term-at-a-time retrieval
  * (Turtle & Flood 1995) — the posting-skipping trick behind every
  * production lexical search engine: a document that contains ONLY
  * low-impact query terms cannot reach the current top-k threshold, so
  * its postings are never scored. Distributed restatement:
  *
  *   1. term upper bounds — ub(q, t) = max per-doc contribution, a
  *      model-sized census (|queries| × |terms| rows);
  *   2. threshold θ₀(q) — the k-th best contribution of the query's
  *      single highest-ub "champion" term (a bounded top-k heap over one
  *      term's postings). θ₀ lower-bounds the true k-th best total
  *      score, because each champion posting's total ≥ its champion
  *      contribution;
  *   3. essential terms — sort the query's terms by ub ascending; the
  *      maximal prefix with Σub < θ₀ is non-essential: a doc holding
  *      only those terms scores ≤ Σub < θ₀ ≤ s_k, STRICTLY below the
  *      k-th result, so it can be skipped without a tie hazard;
  *   4. candidates — docs holding ≥ 1 essential term (a semi-join of
  *      the postings against the broadcast essential set); only these
  *      are fully scored, through the same bounded top-k heaps as the
  *      exhaustive path.
  *
  * The theorem (pruned top-k ≡ exhaustive top-k) is exact in integer
  * micro-scores — q347 gates it against a DuckDB oracle that scores
  * EXHAUSTIVELY, and MaxScoreSpec pins non-vacuity (a planted
  * common-term corpus where pruning must actually drop postings).
  *
  * Scale shape: ub and the essential set are model-sized broadcasts;
  * θ₀ is one bounded heap per query over a single term's postings; the
  * candidate semi-join keys on (query, term) before any scoring
  * arithmetic; nothing corpus-scale crosses the driver.
  */
object MaxScore {

  /** Essential terms (query_id, w) for additive contributions `contribs`
    * (query_id, w, doc_id, c_micro): the terms whose ub-ascending
    * cumulative sum reaches the champion-term θ₀. Model-sized result.
    */
  def essentialTerms(contribs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"essentialTerms: k must be >= 1, got $k")
    val ub = contribs.groupBy("query_id", "w")
      .agg(max("c_micro").as("ub"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("ub").desc, col("w").asc)
    val champion = ub.withColumn("__r", row_number().over(wq))
      .filter(col("__r") === 1)
      .select("query_id", "w")
    // θ₀ = k-th best champion contribution (0 when < k postings exist:
    // then no doc can be excluded and every term stays essential).
    val topk = udaf(new graft.functions.TopKAggregator(k))
    val theta = contribs
      .join(broadcast(champion), Seq("query_id", "w"))
      .groupBy("query_id")
      .agg(topk(col("doc_id"), col("c_micro").cast("double")).as("top"))
      .select(col("query_id"),
        when(size(col("top")) >= k,
          element_at(col("top"), k).getField("_2"))
          .otherwise(lit(0.0)).cast("bigint").as("theta"))
    val wub = Window.partitionBy("query_id")
      .orderBy(col("ub").asc, col("w").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ub.join(broadcast(theta), Seq("query_id"))
      .withColumn("__cum", sum("ub").over(wub))
      .filter(col("__cum") >= col("theta"))
      .select("query_id", "w")
  }

  /** Candidate (query_id, doc_id) pairs — docs holding at least one
    * essential term. Distinct of a broadcast-semi-joined postings scan.
    */
  def candidates(contribs: DataFrame, essential: DataFrame): DataFrame =
    contribs.join(broadcast(essential), Seq("query_id", "w"), "left_semi")
      .select("query_id", "doc_id").distinct()

  /** MaxScore-pruned top-k (query_id, rnk, doc_id, score_micro) over
    * additive integer contributions — PROVABLY equal to the exhaustive
    * ranking under (score desc, doc_id asc).
    */
  def prunedTopK(contribs: DataFrame, k: Int): DataFrame = {
    val cand = candidates(contribs, essentialTerms(contribs, k))
    val topk = udaf(new graft.functions.TopKAggregator(k))
    contribs.join(cand, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))
      .groupBy("query_id")
      .agg(topk(col("doc_id"), col("score_micro").cast("double")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"),
        (col("pos") + 1).cast("bigint").as("rnk"),
        col("e._1").as("doc_id"),
        col("e._2").cast("bigint").as("score_micro"))
  }
}
