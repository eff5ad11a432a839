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
}
