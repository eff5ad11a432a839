package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut helper shared by the iterative / multi-consumer
  * operators (PageRank rounds, near-dup component pointer-jumping, the
  * checkpointed band/postings relations).
  *
  * `localCheckpoint` stores blocks on executor-LOCAL, non-replicated
  * storage: correct and cheap on local[n], but on a real cluster an
  * executor loss mid-iteration kills the job instead of recomputing the
  * lost partitions. Deployments that care configure a RELIABLE
  * checkpoint directory (`SparkContext.setCheckpointDir`, pointing at
  * the fault-tolerant FS a production cluster already has) — `cut` then
  * uses replicated `checkpoint()`, which survives executor loss; with
  * no directory configured it keeps the fast `localCheckpoint` path.
  * Results are identical either way (pinned in GraphsSpec/DedupSpec);
  * only storage durability and write cost differ.
  */
object Checkpoints {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Postfix form, so call sites read like the `localCheckpoint` they
    * replace: `relation.cutLineage`.
    */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = cut(df)
  }
}
