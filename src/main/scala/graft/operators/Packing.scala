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
    * than a bin.
    *
    * Contracts and guards:
    *  - `orderCol` must be non-null (a NULL order key has no position in
    *    a prefix sum; such rows are dropped by the bin join and the
    *    caller should filter them explicitly).
    *  - A NULL GROUP is kept as its own partition with its own budget —
    *    the single-window formulation this operator must be
    *    indistinguishable from (`PARTITION BY group`) treats NULLs as
    *    one partition, so the bin join is null-safe on the group key.
    *  - Bins are EXACT integer arithmetic: `o - pmod(o, binSize)` (the
    *    floor-aligned bin start — monotonic, distinct per bin, and no
    *    division at all), not double division, which loses whole bins
    *    past 2^53 where a long-to-double cast collapses 256-wide ulps.
    *    The only domain edge is `orderCol` ≤ Long.MinValue + binSize,
    *    where the alignment itself would wrap — documented, not checked
    *    (checking would cost a scan).
    *  - The bin stats collect is BOUNDED (`maxBins`, loud) — the offset
    *    table broadcasts anyway, so it must be driver-sized by
    *    construction; the bound makes a binSize misconfiguration throw
    *    instead of OOMing the driver.
    *  - A (group, bin) cell bigger than `maxBinRows` (duplicate-heavy
    *    orderCol — bins bound distinct VALUES, not rows) serializes
    *    through one local-window task: logged loudly, like the dedup
    *    salt census, so at 100 TB the skew is in the logs before the
    *    stage runs, not discovered from a straggler.
    */
  def tokenBudgetCap(docs: DataFrame, groupCol: String, orderCol: String,
                     tokenCol: String, budget: Long,
                     binSize: Long = 1L << 20,
                     maxBinRows: Long = 1L << 22,
                     maxBins: Int = 1 << 20): DataFrame = {
    require(budget >= 1, s"tokenBudgetCap: budget must be >= 1, got $budget")
    val (cum, _) = binnedRunningTotals(docs, groupCol, orderCol, tokenCol,
      binSize, maxBinRows, maxBins)
    cum.filter(col("cum_tokens") <= budget)
  }

  /** Concat-and-chunk context-window assignment — the standard
    * pretraining tokenization layout (GPT-2/3, Llama: every document
    * concatenated into ONE token stream in a fixed order, the stream
    * cut into `windowTokens`-sized training windows, no padding). The
    * output is the BOUNDARY MAP that layout needs downstream: each
    * document's absolute token offset and the window range it lands in
    * — what document-boundary attention masking, window→doc provenance,
    * and loss-masking at boundaries all consume.
    *
    * Per doc (ascending `orderCol`, the training order): `start_tok`
    * (0-based absolute offset of its first token), `first_window` /
    * `last_window` (0-based window ids of its first/last token), and
    * `n_windows` (windows it touches — >1 means the doc straddles a
    * boundary and is split across training sequences). All exact
    * integer arithmetic.
    *
    * Scale shape: the global running offset is the SAME two-phase
    * binned prefix sum as `tokenBudgetCap` (one map-side (bin → sum)
    * census, exclusive bin prefix over the tiny census only, per-row
    * cumsum local to a bin) under a single constant group — a naive
    * `sum().over(orderBy(id))` would funnel 100 TB through ONE task;
    * here parallelism is the bin count and no task sorts more than a
    * bin. The census/maxBins/maxBinRows guards are inherited.
    *
    * Rows with `tokenCol` ≤ 0 occupy no stream positions: they emit
    * with NULL window ids and `n_windows` 0 rather than silently
    * claiming a window (an empty doc has no tokens to train on).
    */
  def contextWindows(docs: DataFrame, orderCol: String, tokenCol: String,
                     windowTokens: Long,
                     binSize: Long = 1L << 20,
                     maxBinRows: Long = 1L << 22,
                     maxBins: Int = 1 << 20): DataFrame = {
    require(windowTokens >= 1,
      s"contextWindows: windowTokens must be >= 1, got $windowTokens")
    val all = "__cw_all"
    val (cum, _) = binnedRunningTotals(docs.withColumn(all, lit(0)),
      all, orderCol, tokenCol, binSize, maxBinRows, maxBins)
    val n = col(tokenCol).cast("long")
    cum.drop(all)
      .withColumn("start_tok", col("cum_tokens") - n)
      .withColumn("first_window",
        when(n <= 0, lit(null).cast("long"))
          .otherwise(expr(s"start_tok div $windowTokens")))
      .withColumn("last_window",
        when(n <= 0, lit(null).cast("long"))
          .otherwise(expr(s"(cum_tokens - 1L) div $windowTokens")))
      .withColumn("n_windows",
        when(n <= 0, lit(0L))
          .otherwise(col("last_window") - col("first_window") + 1))
  }

  /** Temperature-scaled source mixing (the standard multilingual /
    * multi-source sampling design: Devlin et al.'s mBERT exponent,
    * Conneau & Lample's XLM sampling, T5's mixture rates): each group's
    * share of a `totalBudget`-token corpus is proportional to
    * `sqrt(group_total_tokens)` (temperature alpha = 0.5), flattening
    * the head — a group with 4x the tokens gets only 2x the budget — so
    * low-resource sources are over-sampled relative to their natural
    * rate. Docs are then kept per group, ascending `orderCol`, while the
    * group's running total stays within its derived budget (the q100
    * cap applied per group with a computed, not supplied, budget).
    *
    * Determinism contract (the reason alpha is FIXED at 0.5 rather than
    * a parameter): `sqrt` is IEEE-correctly-rounded in every engine, so
    * `floor(sqrt(total))` is bit-reproducible driver-, executor-, and
    * oracle-side, and every other step is integer arithmetic
    * (`budget_g = totalBudget * w_g / sum(w)` in exact BigInt, truncated
    * — all values non-negative so truncation == floor == SQL `//`). A
    * general `pow(total, alpha)` is NOT correctly rounded and may differ
    * across libm builds by an ulp, which at a budget boundary flips a
    * whole document in or out.
    *
    * Scale shape: identical to `tokenBudgetCap` — the (group, bin)
    * census this operator collects anyway yields the per-group totals
    * as a driver-side fold of the already-bounded census rows, so the
    * weight/budget arithmetic costs ZERO extra scans; budgets broadcast
    * back joined null-safely on the group key. The full-detail exchange
    * happens once; parallelism is groups x bins.
    *
    * Output: input columns + `cum_tokens` (running total within group,
    * including the row) + `grp_budget` (the group's derived budget).
    */
  def temperatureMix(docs: DataFrame, groupCol: String, orderCol: String,
                     tokenCol: String, totalBudget: Long,
                     binSize: Long = 1L << 20,
                     maxBinRows: Long = 1L << 22,
                     maxBins: Int = 1 << 20): DataFrame = {
    require(totalBudget >= 1,
      s"temperatureMix: totalBudget must be >= 1, got $totalBudget")
    val (cum, census) = binnedRunningTotals(docs, groupCol, orderCol, tokenCol,
      binSize, maxBinRows, maxBins)
    // Per-group token totals are a driver fold of the collected census
    // (group, __bin, __bin_sum, __bin_rows) — no extra corpus scan. A
    // group whose rows all carry NULL tokens sums to null → weight 0.
    val totals: Map[Any, Long] = census.toSeq.groupBy(_.get(0))
      .map { case (g, rs) =>
        g -> rs.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
      }
    val weights = totals.map { case (g, t) =>
      g -> math.floor(math.sqrt(math.max(t, 0L).toDouble)).toLong
    }
    val wSum = weights.values.foldLeft(BigInt(0))(_ + _)
    require(wSum > 0,
      "temperatureMix: all groups have zero tokens - no budget to apportion")
    val budgets: Seq[(Any, Long)] = weights.toSeq.map { case (g, w) =>
      // Exact rational apportionment: BigInt keeps totalBudget * w from
      // overflowing Long at corpus scale (w ~ sqrt(total tokens)).
      g -> (BigInt(totalBudget) * w / wSum).toLong
    }
    val groupField = cum.schema(groupCol)
    val budgetRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(budgets.map { case (g, b) =>
        org.apache.spark.sql.Row(g, b)
      }: _*)
    val budgetSchema = org.apache.spark.sql.types.StructType(Seq(
      // nullable: a NULL group is a legal partition (the tokenBudgetCap
      // null-safe-join contract), whatever the source schema claims
      groupField.copy(name = "__bg", nullable = true),
      org.apache.spark.sql.types.StructField("grp_budget",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val budgetDf = docs.sparkSession.createDataFrame(budgetRows, budgetSchema)
    cum.join(broadcast(budgetDf), col(groupCol) <=> col("__bg"))
      .filter(col("cum_tokens") <= col("grp_budget"))
      .drop("__bg")
  }

  /** Deterministic proportional interleave (stride scheduling, Waldspurger
    * & Weihl '95 — the lottery/stride work multiplexed schedulers use,
    * here multiplexing corpus SOURCES into one training order): group g
    * holding w_g of the corpus's W rows occupies every prefix of the
    * merged order at ~w_g/W of the slots, with bounded drift — the
    * "interleave shards at mixture rates" pass that turns per-source
    * shards into a single mixed curriculum without a global shuffle.
    * Item k (1-based, ascending `orderCol` within its group) gets stride
    * key (2k−1)/w_g — the midpoint rule, so a group's items sit at the
    * centers of its w_g equal slices of [0, 2] — and the merged order is
    * (key asc, group asc); within a group keys strictly increase, across
    * groups ties break lexicographically, so the order is total and
    * reproducible from (corpus, groupCol, orderCol) alone.
    *
    * Determinism: the key is ONE IEEE division of two exact integers
    * (both < 2^53 by the id-space contract) — correctly rounded,
    * bit-identical in any engine; everything else is integer.
    *
    * Scale shape: per-group positions k come from the shared two-phase
    * binned machinery (one narrow census + one broadcast-joined local
    * window — never a per-group window over the corpus); group weights
    * are a driver fold of the SAME census (zero extra scans, the
    * `temperatureMix` move); the schedule head is a bounded
    * TakeOrderedAndProject (map-side heaps) and the `ord` window runs
    * over the `take` survivors only (the q130 discipline). Emitting the
    * FULL schedule order instead is a sort-merge write, not a window —
    * at 100 TB you'd range-partition by key and write shards in
    * partition order.
    *
    * With `sqrtWeights = true` the stride weight is floor(sqrt(w_g))
    * instead of w_g — the q179 temperature exponent applied to the
    * ORDER rather than the budget, so low-resource groups surface
    * earlier and more often than their natural rate (the curriculum
    * twin of temperature sampling; same IEEE-exact floor(sqrt)
    * determinism argument). Note the group then exhausts its items
    * before the schedule ends — the natural-rate tail — which is
    * exactly the behavior of epoch-limited oversampling.
    *
    * Output: first `take` slots as (ord 1.., groupCol, orderCol, k, w).
    */
  def proportionalInterleave(docs: DataFrame, groupCol: String,
                             orderCol: String, take: Int,
                             sqrtWeights: Boolean = false,
                             binSize: Long = 1L << 20,
                             maxBinRows: Long = 1L << 22,
                             maxBins: Int = 1 << 20): DataFrame = {
    require(take >= 1, s"proportionalInterleave: take must be >= 1, got $take")
    import org.apache.spark.sql.expressions.Window
    val withOne = docs.select(col(groupCol), col(orderCol))
      .withColumn("__one", lit(1L))
    val (cum, census) = binnedRunningTotals(withOne, groupCol, orderCol,
      "__one", binSize, maxBinRows, maxBins)
    val weights: Seq[(Any, Long)] = census.toSeq.groupBy(_.get(0))
      .map { case (g, rs) =>
        val w = rs.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
        g -> (if (sqrtWeights) math.floor(math.sqrt(w.toDouble)).toLong else w)
      }.toSeq
    val groupField = cum.schema(groupCol)
    val wRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(weights.map { case (g, w) =>
        org.apache.spark.sql.Row(g, w)
      }: _*)
    val wSchema = org.apache.spark.sql.types.StructType(Seq(
      groupField.copy(name = "__wg", nullable = true),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val wDf = docs.sparkSession.createDataFrame(wRows, wSchema)
    val keyed = cum.withColumnRenamed("cum_tokens", "k")
      .join(broadcast(wDf), col(groupCol) <=> col("__wg"))
      .withColumn("__key", (lit(2L) * col("k") - 1L).cast("double") / col("w"))
    val wOrd = Window.orderBy(col("__key"), col(groupCol))
    keyed.orderBy(col("__key"), col(groupCol)).limit(take)
      .withColumn("ord", row_number().over(wOrd).cast("long"))
      .select(col("ord"), col(groupCol), col(orderCol), col("k"), col("w"))
      .orderBy("ord")
  }

  /** The q100 two-phase binned prefix sum, shared by `tokenBudgetCap`,
    * `temperatureMix`, and `proportionalInterleave`: returns (rows + `cum_tokens`, the collected
    * (group, __bin, __bin_sum, __bin_rows) census the offsets were built
    * from). See `tokenBudgetCap`'s Scaladoc for the full contract — this
    * helper is that operator minus the budget filter.
    */
  private def binnedRunningTotals(docs: DataFrame, groupCol: String,
      orderCol: String, tokenCol: String, binSize: Long, maxBinRows: Long,
      maxBins: Int): (DataFrame, Array[org.apache.spark.sql.Row]) = {
    require(binSize >= 1, s"tokenBudgetCap: binSize must be >= 1, got $binSize")
    import org.apache.spark.sql.expressions.Window
    val o = col(orderCol).cast("long")
    val binned = docs.withColumn("__bin", o - pmod(o, lit(binSize)))
    // Collect-and-replay (the salt-census pattern): the stats are
    // broadcast downstream anyway, so collecting them here bounds the
    // driver cost by construction AND means the detail side is the only
    // other scan of `docs` — the census is free beyond the one
    // aggregation pass the offset table always needed.
    val binStats = binned.groupBy(col(groupCol), col("__bin"))
      .agg(sum(tokenCol).as("__bin_sum"), count(lit(1)).as("__bin_rows"))
    val rows = binStats.limit(maxBins + 1).collect()
    require(rows.length <= maxBins,
      s"tokenBudgetCap: more than $maxBins (group, bin) cells - the offset " +
        "table would not be broadcastable. Raise binSize (fewer, larger " +
        "bins) or raise maxBins deliberately.")
    val over = oversizedBins(rows, maxBinRows)
    if (over.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"tokenBudgetCap: (group, bin) cell(s) exceed $maxBinRows rows and will " +
          s"serialize through one window task each: ${over.take(20).mkString("; ")}. " +
          "orderCol is duplicate-heavy there - use a finer orderCol if this skews.")
    val local = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), binStats.schema)
    val wBins = Window.partitionBy(groupCol).orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .withColumn("__offset", coalesce(sum("__bin_sum").over(wBins), lit(0L)))
      .select(col(groupCol).as("__og"), col("__bin").as("__ob"), col("__offset"))
    val wLocal = Window.partitionBy(groupCol, "__bin").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = binned.join(broadcast(offsets),
        col(groupCol) <=> col("__og") && col("__bin") === col("__ob"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(wLocal) + col("__offset"))
      .drop("__bin", "__og", "__ob", "__offset")
    (withCum, rows)
  }

  /** Deterministic training-order shuffle: every row gets a
    * multiplicative-hash position (`(id + seed) * 2654435761 mod 2^32`,
    * Knuth's constant — odd, so id-injective below 2^32) and lands in
    * `shard = hash mod nShards` at within-shard rank `pos`. This is the
    * epoch-reshuffle pass of a training pipeline: reproducible from
    * (corpus, seed) alone, a new seed is a new permutation, and shard
    * assignment depends only on the id — appending documents never
    * moves existing ones across shards, so shard files stay stable
    * across corpus increments.
    *
    * Scale shape: one keyed exchange on `shard`, then each shard sorts
    * its ~n/nShards rows independently — no global sort, no single
    * reducer; size nShards to the downstream trainer's file count.
    * Contract: non-negative ids below 2^32 (the `docHash` arithmetic
    * contract — pmod and `%` agree and the product stays inside Long).
    *
    * Output: input columns + (shard, pos), pos 1-based per shard.
    */
  def shardShuffle(docs: DataFrame, idCol: String, nShards: Int,
                   seed: Long = 0L): DataFrame = {
    require(nShards >= 1, s"shardShuffle: nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = pmod((col(idCol) + lit(seed)) * lit(2654435761L), lit(4294967296L))
    docs.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol)))
        .cast("bigint"))
      .drop("__h")
  }

  /** Deterministic EPOCH-RESUME slice — the data-loader bookkeeping a
    * crashed training run needs: the epoch order is the `shardShuffle`
    * multiplicative-hash permutation (reproducible from (corpus, seed)
    * alone), docs pack greedily into `batchTokens`-sized global steps
    * (a doc belongs to the step where it STARTS — `cum_before div
    * batchTokens`), and resume-from-step-k is a FILTER on the step
    * column, not a replay of the consumed prefix. Restarting at step k
    * therefore reads exactly the unconsumed suffix, bit-identical to
    * what an uninterrupted run would have fed from step k on (the q324
    * full-hash gate; PackingSpec pins prefix+suffix = whole epoch).
    *
    * Scale shape: the global running total uses the same binned
    * two-phase prefix sum as `tokenBudgetCap` — a broadcast offset
    * table over ~2^8 hash-range bins, per-bin windows, never a
    * single-reducer global window. Contract: non-negative ids below
    * 2^32 (hash injectivity), non-null non-negative `tokenCol`.
    *
    * Output: input columns + (pos, cum_before, step), filtered to
    * step ≥ fromStep.
    */
  def resumeSlice(docs: DataFrame, idCol: String, tokenCol: String,
      batchTokens: Long, fromStep: Long, seed: Long = 0L): DataFrame = {
    require(batchTokens >= 1,
      s"resumeSlice: batchTokens must be >= 1, got $batchTokens")
    require(fromStep >= 0, s"resumeSlice: fromStep must be >= 0, got $fromStep")
    val h = pmod((col(idCol) + lit(seed)) * lit(2654435761L),
      lit(4294967296L))
    val ordered = docs.withColumn("__pos", h).withColumn("__grp", lit(0))
    // 2^24-wide bins over the 2^32 hash range → ≤ 256 offset cells
    val (withCum, _) = binnedRunningTotals(ordered, "__grp", "__pos",
      tokenCol, binSize = 1L << 24, maxBinRows = 1L << 22, maxBins = 1 << 12)
    withCum
      .withColumn("cum_before", col("cum_tokens") - col(tokenCol))
      // exact Long division (FP floor drifts past 2^53 — the 100 T-token
      // cum is within reach of that)
      .withColumn("step", expr(s"cum_before div ${batchTokens}L"))
      .filter(col("step") >= fromStep)
      .withColumnRenamed("__pos", "pos")
      .drop("__grp", "cum_tokens")
  }

  /** The skew predicate behind the oversized-cell warn, extracted so the
    * spec can pin exactly when the bound fires. Row shape is binStats:
    * (group, __bin, __bin_sum, __bin_rows).
    */
  private[graft] def oversizedBins(rows: Array[org.apache.spark.sql.Row],
                                   maxBinRows: Long): Seq[String] =
    rows.toSeq.filter(_.getLong(3) > maxBinRows)
      .map(r => s"group=${r.get(0)} bin=${r.get(1)} rows=${r.getLong(3)}")
}
