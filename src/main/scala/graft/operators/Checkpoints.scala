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

  /** `cut` with Catalyst constraint propagation scoped OFF for the
    * eager checkpoint. Constraint derivation keeps every
    * alias-substituted variant of every inherited constraint, so a
    * lineage with many aliased derived columns (e.g. K hashed-feature
    * divisions over a kernel histogram — q310) can exhaust the DRIVER
    * heap inside `localCheckpoint`'s constraint rewrite before a
    * single task runs. `constraints` is consulted (and cached) under
    * the flag at checkpoint time, so the returned relation carries an
    * EMPTY constraint set; the flag restores immediately — plans over
    * other relations are untouched. The trade (no inferred IsNotNull
    * pushdown downstream of this cut) is irrelevant for the
    * wide-feature training relations this exists for.
    */
  def cutNoConstraints(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.constraintPropagation.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try cut(df) finally conf.set(key, prev)
  }

  /** Postfix form, so call sites read like the `localCheckpoint` they
    * replace: `relation.cutLineage`.
    */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = cut(df)
  }
}
