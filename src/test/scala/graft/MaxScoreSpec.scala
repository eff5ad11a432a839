package graft

import graft.operators.MaxScore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for MaxScore upper-bound pruning (q347 gates pruned ≡ exhaustive
  * cross-engine; the pruning MECHANICS — essential-set selection,
  * non-vacuity, tie safety — pin here).
  */
class MaxScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive top-k over additive contribs, the window way. */
  private def exhaustive(contribs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    contribs.groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "doc_id", "score_micro")
  }

  /** Planted common-term corpus: 'the' appears in every doc with a tiny
    * contribution; 'zebra' only in docs 0-14 with a large one. With
    * k = 10 the champion θ₀ comes from zebra's postings and exceeds
    * the ub of 'the', so 'the' must fall non-essential and the
    * the-only docs (15-499) must never be scored.
    */
  private lazy val planted: DataFrame = {
    val rows =
      (0L until 500L).map(d => (1L, "the", d, 3L + (d % 3))) ++
        (0L until 15L).map(d => (1L, "zebra", d, 5000L + d))
    rows.toDF("query_id", "w", "doc_id", "c_micro")
  }

  test("planted common term goes non-essential and pruning fires") {
    val ess = MaxScore.essentialTerms(planted, k = 10).collect()
    assert(ess.map(_.getString(1)).toSet === Set("zebra"),
      "the low-ub common term must be pruned from the essential set")
    val cand = MaxScore.candidates(planted,
      MaxScore.essentialTerms(planted, k = 10))
    assert(cand.count() === 15,
      "only zebra's postings may become candidates")
  }

  test("pruned top-k equals exhaustive top-k on the planted corpus") {
    val p = MaxScore.prunedTopK(planted, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    val e = exhaustive(planted, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(p === e)
  }

  test("theta=0 path (fewer than k champion postings) keeps every term") {
    // 3 docs only — θ₀ = 0, nothing prunable, equality must still hold
    val tiny = Seq(
      (1L, "a", 1L, 100L), (1L, "a", 2L, 90L),
      (1L, "b", 2L, 50L), (1L, "b", 3L, 40L))
      .toDF("query_id", "w", "doc_id", "c_micro")
    val ess = MaxScore.essentialTerms(tiny, k = 10).collect()
    assert(ess.length === 2, "theta=0 must keep all terms essential")
    val p = MaxScore.prunedTopK(tiny, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    val e = exhaustive(tiny, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(p === e)
  }

  test("boundary ties are safe: skipped docs sit STRICTLY below theta") {
    // doc 100 holds only 'low' with total exactly equal to the 2nd-best
    // champion contribution MINUS 1 — prunable; a doc tied AT theta
    // keeps 'low' essential (cum >= theta) and must survive
    val atTheta = Seq(
      (1L, "hi", 1L, 100L), (1L, "hi", 2L, 80L), (1L, "hi", 3L, 60L),
      (1L, "low", 4L, 80L)) // ub(low)=80 = θ₀(k=2)=80 → essential
      .toDF("query_id", "w", "doc_id", "c_micro")
    val ess = MaxScore.essentialTerms(atTheta, k = 2).collect()
    assert(ess.map(_.getString(1)).toSet === Set("hi", "low"),
      "a term whose ub ties theta exactly must stay essential")
    val p = MaxScore.prunedTopK(atTheta, k = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    val e = exhaustive(atTheta, k = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(p === e)
  }

  test("q347 pruning is non-vacuous on real testdata") {
    val contribs = queries.TextQueries.bm25ContribsMicro(spark, sfDir)
      .localCheckpoint(true)
    val ess = MaxScore.essentialTerms(contribs, k = 10)
    val nTerms = contribs.select("query_id", "w").distinct().count()
    val nEss = ess.count()
    assert(nEss < nTerms,
      s"expected at least one non-essential term on sf0.001 " +
        s"(got $nEss essential of $nTerms)")
    val cand = MaxScore.candidates(contribs, ess)
    val allDocs = contribs.select("query_id", "doc_id").distinct().count()
    assert(cand.count() < allDocs,
      "pruning must skip at least one posting doc on sf0.001")
  }
}
