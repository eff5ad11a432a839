package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: concatenate
  * documents into fixed-token-budget training sequences (greedy
  * first-overflow-starts-a-new-bin, the standard pre-tokenized packing
  * pass), assigning each document a sequence number within its group.
  *
  * Distribution contract: groups (e.g. language, shard) are independent
  * — rows are hash-partitioned by group and each partition is walked
  * ONCE in (group, id) order with O(1) state (current fill + sequence
  * counter), so a 100 TB corpus packs with one keyed exchange and a
  * streaming pass; nothing is materialized per group. The sequential
  * walk is genuinely imperative (each bin decision depends on the
  * previous fill — no window function expresses a reset-on-overflow
  * running sum), which is the documented last-resort case for a typed
  * partition map. Known skew bound: one giant group serializes through
  * one task; the scale-out is sharding the group key (pack per shard,
  * then offset sequence numbers by shard — the packing itself is
  * shard-local so the merge is pure arithmetic).
  */
object Packing {

  /** Pack docs into ≤ `budget`-token sequences per group, greedily in
    * ascending `idCol` order (deterministic). A document larger than the
    * budget gets a sequence of its own — packing never splits documents.
    * Output: (groupCol, idCol, tokenCol, seq_no), seq_no 1-based per
    * group.
    */
  def packGreedy(docs: DataFrame, groupCol: String, idCol: String,
                 tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"packGreedy: budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n"))
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // several groups can share a hash partition; the walk resets its
        // O(1) state at every group boundary
        var curG: String = null
        var fill = 0L
        var seq = 0L
        it.map { case (g, id, n) =>
          if (g != curG) { curG = g; seq = 1L; fill = n }
          else if (fill + n > budget) { seq += 1; fill = n }
          else fill += n
          (g, id, n, seq)
        }
      }
      .toDF(groupCol, idCol, tokenCol, "seq_no")
  }

  /** Token-budget cap per group: keep rows, in ascending `orderCol`
    * order, while the group's running token total stays ≤ `budget` —
    * the mixture-design pass that caps each language/source's
    * contribution to a training corpus. Emits the input columns plus
    * `cum_tokens` (the running total INCLUDING the row).
    *
    * This is a distributed PREFIX SUM, not a window: a plain
    * `sum().over(partitionBy(group).orderBy(id))` funnels each group
    * through ONE task — with 5 languages over 100 TB that is 5 sorting
    * reducers and a dead cluster. Instead the classic two-phase scan:
    * (1) rows bucket into `binSize`-wide orderCol bins and each
    * (group, bin)'s token total aggregates map-side into a TINY table
    * (groups × bins rows); (2) the exclusive bin-prefix runs as a window
    * over that tiny table only, and broadcasts back; (3) each row's
    * running total is its bin offset + a cumsum LOCAL to its
    * (group, bin) partition. Parallelism is groups × bins, the
    * full-detail exchange happens once, and no task ever sorts more
    * than a bin. Contract: `orderCol` must be non-null (a NULL order
    * key has no position in a prefix sum; such rows are dropped by the
    * bin join and the caller should filter them explicitly).
    */
  def tokenBudgetCap(docs: DataFrame, groupCol: String, orderCol: String,
                     tokenCol: String, budget: Long,
                     binSize: Long = 1L << 20): DataFrame = {
    require(budget >= 1, s"tokenBudgetCap: budget must be >= 1, got $budget")
    require(binSize >= 1, s"tokenBudgetCap: binSize must be >= 1, got $binSize")
    import org.apache.spark.sql.expressions.Window
    val binned = docs.withColumn("__bin",
      floor(col(orderCol).cast("long") / binSize))
    val binTotals = binned.groupBy(groupCol, "__bin")
      .agg(sum(tokenCol).as("__bin_sum"))
    val wBins = Window.partitionBy(groupCol).orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = binTotals
      .withColumn("__offset", coalesce(sum("__bin_sum").over(wBins), lit(0L)))
      .drop("__bin_sum")
    val wLocal = Window.partitionBy(groupCol, "__bin").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.join(broadcast(offsets), Seq(groupCol, "__bin"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(wLocal) + col("__offset"))
      .filter(col("cum_tokens") <= budget)
      .drop("__bin", "__offset")
  }
}
