package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-statistics profiling for a cost-based planner / data-quality
  * dashboard: the ANALYZE-style passes a warehouse runs over every
  * ingested table. The flagship operator is the equi-height histogram,
  * which needs an EXACT global rank — the classic "order statistics at
  * scale" problem.
  *
  * Scale design: a global `row_number() OVER (ORDER BY v)` funnels the
  * entire table through ONE sorting reducer — the single worst plan a
  * 100 TB profiler can pick. Instead the rank is a distributed two-phase
  * scan (the `Packing.tokenBudgetCap` shape, counting rows instead of
  * summing tokens): rows bucket into order-aligned bins, per-bin counts
  * aggregate map-side into a TINY table, the exclusive bin-prefix runs
  * over that table only and broadcasts back, and each row's global rank
  * is its bin offset + a row_number LOCAL to its bin. Parallelism is the
  * bin count; no task ever sorts more than one bin. The same core serves
  * two bin shapes: value-aligned long bins (`equiHeightBuckets`, for
  * high-cardinality numeric domains) and composite (value, tie-prefix)
  * bins (`exactRank`, for duplicate-heavy values like document
  * frequencies, where value bins alone would collapse into one giant
  * bin and quietly rebuild the single-partition sort).
  */
object Profile {

  /** Equi-height histogram of `valueCol` (ties broken by `idCol`, so the
    * rank — and therefore the histogram — is fully deterministic):
    * `buckets` buckets of sizes differing by at most one row, assigned
    * by exact integer arithmetic `((rank-1)·buckets) div n + 1` —
    * identical to what a single-window `row_number` formulation would
    * produce (pinned in ProfileSpec), without ever building one.
    *
    * Output: (bucket, n_rows, min_v, max_v, avg_v) — min/max are exact
    * doubles; avg is 6dp-rounded (the only accumulation-order-sensitive
    * field).
    *
    * Bins are value-aligned on the long-truncated value
    * (`t - pmod(t, binSize)`): truncation toward zero is non-strictly
    * monotone in v (every value in a lower bin ≤ every value in a higher
    * bin, negatives included since pmod keeps bin starts on the floor
    * side), which is all the two-phase rank needs — within-bin order is
    * re-established by the local (v, id) sort. Guards mirror
    * `tokenBudgetCap`: the bin table collect is bounded (`maxBins`,
    * loud — it broadcasts, so it must be driver-sized by construction)
    * and an oversized bin (duplicate-heavy values) warns before the
    * stage runs instead of surfacing as a straggler.
    */
  def equiHeightHistogram(df: DataFrame, valueCol: String, idCol: String,
                          buckets: Int, binSize: Long = 1L << 20,
                          binScale: Double = 1.0,
                          maxBins: Int = 1 << 20,
                          maxBinRows: Long = 1L << 22): DataFrame =
    equiHeightBuckets(df.select(col(idCol), col(valueCol)), valueCol, idCol,
        buckets, binSize, binScale, maxBins, maxBinRows)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"),
        round(avg(col(valueCol).cast("double")), 6).as("avg_v"))

  /** The row-level half of the histogram, reusable by any
    * equal-count-bucket consumer (lift/calibration curves, decile
    * reports): every input row comes back with its 1-based `bucket`
    * under the exact (value, id) global rank. `binScale` pre-multiplies
    * the value before long-truncation for domains narrower than 1.0
    * (e.g. scores in [0, 1] — multiplication by a positive constant and
    * truncation are both non-strictly monotone, so bin order still
    * agrees with value order; the scale only affects bin GRANULARITY,
    * never the result).
    */
  def equiHeightBuckets(df: DataFrame, valueCol: String, idCol: String,
                        buckets: Int, binSize: Long = 1L << 20,
                        binScale: Double = 1.0,
                        maxBins: Int = 1 << 20,
                        maxBinRows: Long = 1L << 22): DataFrame = {
    require(buckets >= 1, s"equiHeightBuckets: buckets must be >= 1, got $buckets")
    require(binSize >= 1, s"equiHeightBuckets: binSize must be >= 1, got $binSize")
    require(binScale > 0, s"equiHeightBuckets: binScale must be > 0, got $binScale")
    // binScale == 1 keeps integral values on the exact long path (a
    // double detour would collapse 256-wide ulp ranges past 2^53 — the
    // tokenBudgetCap bin lesson); a scaled bin basis is only for
    // sub-integer domains, where the input is already a double.
    val t =
      if (binScale == 1.0) col(valueCol).cast("long")
      else (col(valueCol).cast("double") * lit(binScale)).cast("long")
    val binned = df.withColumn("__bin", t - pmod(t, lit(binSize)))
    // Within-bin order compares the RAW column (native type), so the
    // rank agrees exactly with a single-window formulation over the
    // same column — no double detour for integral values.
    val (ranked, n) = twoPhaseRank(binned, Seq(col(valueCol), col(idCol)),
      maxBins, maxBinRows, "equiHeightBuckets")
    ranked
      .withColumn("bucket",
        expr(s"(__rank - 1) * ${buckets.toLong} div ${n}") + lit(1L))
      .drop("__bin", "__rank")
  }

  /** Distributed EXACT global rank by (`valueCol` asc, `tieCol` asc) —
    * the drop-in replacement for `row_number() OVER (ORDER BY value,
    * tie)` when the value column is integral and DUPLICATE-HEAVY, the
    * document-frequency shape: under Zipf most of a corpus vocabulary
    * shares tiny df values, so `equiHeightBuckets`-style value-aligned
    * bins would collapse into one giant df=2 bin whose local window IS
    * the single-partition sort this machinery exists to avoid. Bins are
    * instead the COMPOSITE (long value, substring(tie, 1,
    * `tiePrefixLen`)): long truncation keeps bin order aligned with
    * value order, and lexicographic prefix truncation is non-strictly
    * monotone in the tie string, so the composite bin is non-strictly
    * monotone in the (value, tie) sort key — all the two-phase rank
    * needs. Parallelism is (#distinct values × #tie prefixes); a
    * residual oversized bin (one value × one prefix still huge) warns
    * before the stage runs — raise `tiePrefixLen` to split it further.
    *
    * Output: the input columns + `rankName` (1-based long), row-for-row
    * equal to the single-window formulation (pinned in ProfileSpec and
    * SimilaritySpec) without ever building one. Contract: `valueCol`
    * must be exactly representable as long (integral); `tieCol` is a
    * string.
    */
  def exactRank(df: DataFrame, valueCol: String, tieCol: String,
                rankName: String, tiePrefixLen: Int = 2,
                maxBins: Int = 1 << 20,
                maxBinRows: Long = 1L << 22): DataFrame = {
    require(tiePrefixLen >= 1,
      s"exactRank: tiePrefixLen must be >= 1, got $tiePrefixLen")
    val binned = df.withColumn("__bin",
      struct(col(valueCol).cast("long").as("bv"),
        substring(col(tieCol), 1, tiePrefixLen).as("bt")))
    val (ranked, _) = twoPhaseRank(binned, Seq(col(valueCol), col(tieCol)),
      maxBins, maxBinRows, "exactRank")
    ranked.withColumn(rankName, col("__rank")).drop("__bin", "__rank")
  }

  /** Shared two-phase core. Input: a frame carrying a `__bin` column
    * that is non-strictly monotone in `orderCols` (every row of a lower
    * bin sorts ≤ every row of a higher bin — the caller proves this for
    * its bin shape). Output: the frame + exact 1-based `__rank` under
    * `orderCols`, plus the total row count. The bin census collect is
    * bounded (`maxBins`, loud — the offset table broadcasts, so it must
    * be driver-sized by construction); the offset window runs over the
    * COLLECTED census (one task by design, never the detail relation);
    * each row's rank is its broadcast bin offset + a row_number LOCAL to
    * its bin.
    */
  private def twoPhaseRank(binned: DataFrame, orderCols: Seq[Column],
                           maxBins: Int, maxBinRows: Long,
                           what: String): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val binStats = binned.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__bin_rows"))
    val rows = binStats.limit(maxBins + 1).collect()
    require(rows.length <= maxBins,
      s"$what: more than $maxBins bins - the offset table " +
        "would not be broadcastable. Use fewer, larger bins " +
        "or raise maxBins deliberately.")
    require(rows.nonEmpty, s"$what: empty input")
    val over = rows.toSeq.filter(_.getLong(1) > maxBinRows)
      .map(r => s"bin=${r.get(0)} rows=${r.getLong(1)}")
    if (over.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$what: bin(s) exceed $maxBinRows rows and will " +
          s"serialize through one window task each: ${over.take(20).mkString("; ")}. " +
          "The bin key is duplicate-heavy there - use finer bins if this skews.")
    val n = rows.map(_.getLong(1)).sum
    val local = binned.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), binStats.schema)
    val wBins = Window.orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .withColumn("__offset", coalesce(sum("__bin_rows").over(wBins), lit(0L)))
      .select(col("__bin").as("__ob"), col("__offset"))
    val wLocal = Window.partitionBy("__bin").orderBy(orderCols: _*)
    val ranked = binned.join(broadcast(offsets), col("__bin") === col("__ob"))
      .withColumn("__rank", row_number().over(wLocal).cast("long") + col("__offset"))
      .drop("__ob", "__offset")
    (ranked, n)
  }
}
