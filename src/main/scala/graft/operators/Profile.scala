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

  /** Join-key skew profile: the diagnostic run BEFORE choosing a skew
    * remedy (salt fan-out, AQE skew-join thresholds, broadcast side).
    * One map-side-combinable key census, a bounded
    * TakeOrderedAndProject for the top-k, and two broadcast scalars;
    * the rank window runs over the k survivors only (the q130
    * discipline — never over the key domain). Output per hot key:
    * (rank, key, n_rows, share_ppm of all rows, vs_mean_ppm =
    * n·keys·1e6/total — the straggler multiplier a shuffle partition
    * holding this key alone would suffer; both exact-BIGINT ppm so the
    * gate carries no floating fraction).
    */
  def keySkewProfile(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"keySkewProfile: k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val tot = broadcast(counts.agg(sum("n_rows").as("__total"),
      count(lit(1)).as("__n_keys")))
    counts.orderBy(col("n_rows").desc, col(keyCol)).limit(k)
      .crossJoin(tot)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_rows").desc, col(keyCol))).cast("long"))
      .select(col("rank"), col(keyCol), col("n_rows"),
        // Exact BIGINT ppm — gate outputs never carry floating
        // fractions (engine/oracle DECIMAL-vs-DOUBLE typing hazard).
        expr("n_rows * 1000000 div __total").as("share_ppm"),
        expr("n_rows * __n_keys * 1000000 div __total").as("vs_mean_ppm"))
      .orderBy("rank")
  }

  /** k-anonymity release plan over a quasi-identifier CENSUS — the
    * privacy gate shared by batch q246 and its streaming twin: cells
    * with n ≥ k release exactly; smaller cells generalize the second
    * key to '*'; if even the generalized rollup stays under k it
    * suppresses into the global ('*','*') cell — and that cell is
    * itself released only when it reaches k, so NO released row ever
    * describes fewer than k members (an under-k residue is withheld
    * entirely, the standard suppression semantics). The input is already the
    * (keyA, keyB, n) census (group-sized, NOT row-level), so every
    * pass here is over a frame bounded by QI cardinality — the one
    * corpus-scale aggregation happens upstream, once.
    */
  def kAnonymityRelease(census: DataFrame, keyA: String, keyB: String,
      k: Long): DataFrame = {
    val g = census.select(col(keyA).as("__a"),
      col(keyB).cast("string").as("__b"), col("n"))
    val exact = g.filter(col("n") >= k)
      .select(lit("exact").as("anon_level"), col("__a"), col("__b"),
        col("n"))
    val gen = g.filter(col("n") < k)
      .groupBy("__a").agg(sum("n").as("n"))
    val genOk = gen.filter(col("n") >= k)
      .select(lit("generalized").as("anon_level"), col("__a"),
        lit("*").as("__b"), col("n"))
    val supp = gen.filter(col("n") < k)
      .agg(coalesce(sum("n"), lit(0L)).as("n"))
      .select(lit("suppressed").as("anon_level"), lit("*").as("__a"),
        lit("*").as("__b"), col("n"))
      .filter(col("n") >= k)
    exact.unionByName(genOk).unionByName(supp)
      .withColumnRenamed("__a", keyA).withColumnRenamed("__b", keyB)
  }

  /** l-diversity audit over a (keyA, keyB, sens, n) extended census —
    * the second privacy bar on top of [[kAnonymityRelease]]: replay the
    * k-anonymity release plan at sensitive-value granularity and count
    * DISTINCT sensitive values per released cell (across everything a
    * generalized/suppressed cell merges — what the published table
    * exposes). Shared by batch q291 and its streaming twin q293; every
    * pass after the upstream corpus aggregation is census-sized.
    */
  def lDiversityAudit(ext: DataFrame, keyA: String, keyB: String,
      sensCol: String, k: Long, l: Long): DataFrame = {
    val e = ext.select(col(keyA).as("__a"),
      col(keyB).cast("string").as("__b"), col(sensCol).as("__s"), col("n"))
    val cell = e.groupBy("__a", "__b").agg(sum("n").as("cn"))
    val gen = cell.filter(col("cn") < k).groupBy("__a")
      .agg(sum("cn").as("gn"))
    val cls = cell.join(gen, Seq("__a"), "left")
      .withColumn("level", when(col("cn") >= k, "exact")
        .when(coalesce(col("gn"), lit(0L)) >= k, "generalized")
        .otherwise("suppressed"))
      .select("__a", "__b", "level")
    val suppTotal = broadcast(cls.join(cell, Seq("__a", "__b"))
      .filter(col("level") === "suppressed")
      .agg(coalesce(sum("cn"), lit(0L)).as("st")))
    e.join(cls, Seq("__a", "__b"))
      .crossJoin(suppTotal)
      .filter(col("level") =!= "suppressed" || col("st") >= k)
      .withColumn("rel_a", when(col("level") === "suppressed", lit("*"))
        .otherwise(col("__a")))
      .withColumn("rel_b", when(col("level") === "exact", col("__b"))
        .otherwise(lit("*")))
      .groupBy(col("level").as("anon_level"), col("rel_a"), col("rel_b"))
      .agg(sum("n").as("n"), count_distinct(col("__s")).as("n_sens"))
      .withColumn("l_ok", col("n_sens") >= l)
      .select(col("anon_level"), col("rel_a").as(keyA),
        col("rel_b").as(keyB), col("n"), col("n_sens"), col("l_ok"))
      .orderBy("anon_level", keyA, keyB)
  }

  /** Exact type-7 (linear-interpolation) quantiles per group from a
    * VALUE CENSUS — the scale replacement for `percentile()` /
    * `quantile_cont`, whose aggregation buffer holds EVERY value of
    * every group: corpus-sized state serialized through one reducer per
    * group, the order-statistics twin of the single-window rank this
    * file opens with. The census `groupBy(group, value)` is map-side
    * combinable and sized by DISTINCT values, not rows — the right
    * shape for discrete or quantized measures (counts, lengths, 2-dp
    * amounts). For an unbounded continuous domain, quantize first (the
    * `binScale` idea) or the census degenerates toward the row count;
    * the cumulative window below is partitioned by group over census
    * rows only, so census size per group IS the straggler bound.
    *
    * Each requested p needs exactly the two order statistics at
    * floor/ceil((n−1)·p), picked out of the same census pass with
    * conditional aggregation — no per-p rescan. Output:
    * (group, p, q) with q = v_lo + frac·(v_hi − v_lo), the same
    * arithmetic `percentile()` publishes (pinned in ProfileSpec).
    */
  /** Deterministic POISSON-BOOTSTRAP confidence interval for the
    * per-group mean of `valueCol` — the uncertainty bars a data-quality
    * monitor needs before it alarms on a mean shift. The classic
    * bootstrap resamples with replacement, which is both random and a
    * shuffle; the Poisson(1) approximation instead gives every row an
    * independent weight w ~ Poisson(1) per replicate — and here the
    * draw is DERANDOMIZED: u = ((id·B + b + 1)·2654435761) mod 2^32
    * (the q106 multiplicative hash, oracle-restatable) thresholded
    * against the EXACT integer Poisson(1) CDF cut points
    * floor(P(≤k)·2^32), capped at 5. Replicate means are exact-integer
    * milli values ((1000·Σw·v) div Σw), so engine and oracle agree bit
    * for bit; the CI is the (lo+1)-th / (B−lo)-th order statistic of
    * the B replicate means.
    *
    * Scale shape: ONE pass over docs × B weight terms — all map-side
    * arithmetic — into a (group, b) census (groups × B rows), then a
    * bounded window over the census. Contract: non-negative ids with
    * id·B + B below 2^32, non-null values.
    */
  def bootstrapMeanCiMilli(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, b: Int = 64, loRank: Int = 2): DataFrame = {
    require(b >= 4, s"bootstrapMeanCiMilli: need B >= 4 replicates, got $b")
    require(loRank >= 1 && 2 * loRank <= b,
      s"bootstrapMeanCiMilli: loRank $loRank out of range for B=$b")
    // floor(P(X<=k) * 2^32) for X ~ Poisson(1), k = 0..4; w caps at 5
    val cuts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L)
    val u = pmod((col("__id") * b + col("b") + 1) * lit(2654435761L),
      lit(4294967296L))
    val w = cuts.map(c => when(u >= c, 1L).otherwise(0L)).reduce(_ + _)
    val means = df
      .select(col(groupCol).as("g"), col(idCol).cast("long").as("__id"),
        col(valueCol).cast("long").as("v"))
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("w", w)
      .groupBy("g", "b")
      .agg(sum(col("w") * col("v")).as("sv"), sum("w").as("sw"))
      .filter(col("sw") > 0)
      .withColumn("mean_milli", expr("(1000 * sv) div sw"))
    // the census is groups × B rows — both windows are bounded
    val grp = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val win = grp.orderBy(col("mean_milli").asc, col("b").asc)
    means
      .withColumn("rnk", row_number().over(win))
      .withColumn("n_b", count(lit(1)).over(grp))
      .groupBy(col("g").as(groupCol))
      .agg(max("n_b").cast("bigint").as("n_reps"),
        max(when(col("rnk") === loRank, col("mean_milli"))).as("lo_milli"),
        max(when(col("rnk") === col("n_b") - (loRank - 1),
          col("mean_milli"))).as("hi_milli"))
  }

  /** Digest modulus: the Mersenne prime 2^61 − 1 (modular addition keeps
    * the additive-union law exact while the pre-mod sum rides a
    * decimal(38,0), good to ~2e20 rows).
    */
  val DigestModulus: Long = 2305843009213693951L

  /** Content-addressed DATASET DIGEST — the "which bytes trained this
    * model" identity card: per group, (row count, additive content
    * digest). Each row hashes to a 60-bit integer (md5 of its canonical
    * key string, first 15 hex digits — the cross-engine-safe cut) and
    * the digest is the modular SUM, so it is ORDER- and
    * PARTITIONING-INVARIANT by construction and INCREMENTAL: digest of
    * a union is the pointwise modular sum of the parts' digests (no
    * re-scan of history when a delta lands — the q166 census-merge
    * move, applied to dataset identity). One map-side pass, one
    * group-sized aggregate; at 100 TB the digest costs exactly one
    * scan and merges across days/shards for free.
    *
    * Caveat (documented, not hidden): an additive digest is not
    * collision-resistant against an ADVERSARY who can insert chosen
    * rows; it is an integrity/identity check against drift, loss, and
    * duplication, not a cryptographic commitment.
    */
  def datasetDigest(df: DataFrame, groupCol: String,
      rowKey: Column): DataFrame = {
    val h = conv(substring(md5(rowKey), 1, 15), 16, 10).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(h.cast("decimal(38,0)")),
          lit(DigestModulus).cast("decimal(38,0)"))
          .cast("long").as("digest"))
  }

  /** The incremental half: pointwise merge of two digest relations —
    * counts add, digests add modulo `DigestModulus`. Groups absent on
    * one side pass through.
    */
  def mergeDigests(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("n_rows").as("na"), col("digest").as("da"))
      .join(b.select(col(groupCol), col("n_rows").as("nb"),
        col("digest").as("db")), Seq(groupCol), "full")
      .select(col(groupCol),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)))
          .as("n_rows"),
        pmod(coalesce(col("da"), lit(0L)) + coalesce(col("db"), lit(0L)),
          lit(DigestModulus)).as("digest"))

  def censusQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"censusQuantiles: every p must be in [0,1], got $ps")
    import org.apache.spark.sql.expressions.Window
    val census = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(groupCol).orderBy("__v")
    val wAll = Window.partitionBy(groupCol)
    census
      .withColumn("__cum", sum("__cnt").over(wCum))
      .withColumn("__total", sum("__cnt").over(wAll))
      .withColumn("__prev", col("__cum") - col("__cnt"))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("__h", (col("__total") - 1).cast("double") * col("p"))
      .groupBy(col(groupCol), col("p"))
      .agg(
        max(when(col("__prev") <= floor(col("__h")) &&
          floor(col("__h")) < col("__cum"), col("__v"))).as("__vlo"),
        max(when(col("__prev") <= ceil(col("__h")) &&
          ceil(col("__h")) < col("__cum"), col("__v"))).as("__vhi"),
        first(col("__h")).as("__hh"))
      .withColumn("q",
        col("__vlo") + (col("__hh") - floor(col("__hh"))) *
          (col("__vhi") - col("__vlo")))
      .select(col(groupCol), col("p"), col("q"))
  }

  /** The ppm CDF ladder of a TRUNCATED discrete Laplace (two-sided
    * geometric) with scale ε = epsMilli/1000 and sensitivity 1 —
    * P(k) ∝ α^|k| with α = e^(−ε), support clamped to [−kMax, kMax]
    * (the tail mass folds into the renormalized cumulative, and the
    * last threshold is pinned to exactly 1e6). The LADDER defines the
    * mechanism: both the engine plan and the DuckDB oracle consume the
    * same literal thresholds, so the release is bit-deterministic
    * cross-engine. Model-sized (2·kMax+1 entries).
    */
  private[graft] def dpNoiseLadderPpm(epsMilli: Long,
      kMax: Int = 15): Seq[(Long, Int)] = {
    require(epsMilli >= 1L, s"dpNoiseLadderPpm: eps must be >= 1 milli")
    val alpha = math.exp(-epsMilli / 1000.0)
    val pmf = (-kMax to kMax).map(k => math.pow(alpha, math.abs(k)))
    val total = pmf.sum
    val cums = pmf.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (-kMax to kMax).zip(cums).map { case (k, c) =>
      (if (k == kMax) 1000000L else math.round(c * 1e6), k)
    }
  }

  /** Differentially-private count release with SEEDED noise (the
    * reproducible-release practice): per-group counts plus truncated
    * discrete-Laplace noise drawn from the group key's q202-discipline
    * integer hash — exact ppm uniforms, a literal CDF ladder, a
    * GREATEST(0, ·) clamp. One map-side census aggregate; the noise is
    * a codegen column over the census. `groupCol` must be numeric (the
    * hash seed). Output: (groupCol, n_true is NOT emitted, released).
    */
  def dpCountRelease(df: DataFrame, groupCol: String,
      epsMilli: Long): DataFrame = {
    val ladder = dpNoiseLadderPpm(epsMilli)
    val u = pmod(pmod(col(groupCol).cast("bigint") * lit(1000003L)
      + lit(7L), lit(3000000000L)) * lit(2654435761L), lit(1000000L))
    val noise = ladder.tail.foldLeft(
      when(u < ladder.head._1, lit(ladder.head._2.toLong))) {
      case (acc, (thr, k)) => acc.when(u < thr, lit(k.toLong))
    }.otherwise(lit(ladder.last._2.toLong))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        greatest(lit(0L), col("__n") + noise).as("released"))
  }

  /** The ε accounting gate: given a ledger of prior releases
    * (eps_milli rows), admit a new request iff spent + request ≤
    * budget. One census-sized aggregate; returns (spent_milli,
    * admitted).
    */
  def epsilonLedger(ledger: DataFrame, requestMilli: Long,
      budgetMilli: Long): DataFrame =
    ledger.agg(coalesce(sum("eps_milli"), lit(0L)).as("spent_milli"))
      .select(col("spent_milli"),
        (col("spent_milli") + lit(requestMilli) <= lit(budgetMilli))
          .as("admitted"))

  /** WEIGHTED exact quantiles over a (group, value, weight) census —
    * the curation statistic the unweighted form misreads: "half the
    * TOKEN MASS sits in docs shorter than X" needs each value weighted
    * by its token count, or a million tiny docs drag the median to
    * nothing. Semantics are the weighted type-1 (lower) quantile —
    * q(p) = min{ v : cumWeight(v) ≥ p·W } — because it is EXACT in
    * integers: probabilities arrive as ppm longs and the threshold
    * compare runs in decimal(38,0) (the q303 overflow discipline;
    * cum·1e6 at corpus scale does not fit a Long). State is
    * distinct-value-sized, the q46/q125 census discipline: one
    * aggregate, windows over census rows only.
    */
  def weightedCensusQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, psPpm: Seq[Long]): DataFrame = {
    require(psPpm.nonEmpty && psPpm.forall(p => p >= 0L && p <= 1000000L),
      s"weightedCensusQuantiles: every p must be in [0, 1e6] ppm, got $psPpm")
    import org.apache.spark.sql.expressions.Window
    val census = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("bigint").as("__v"))
      .agg(sum(col(weightCol).cast("bigint")).as("__w"))
    val wCum = Window.partitionBy(groupCol).orderBy("__v")
    val wAll = Window.partitionBy(groupCol)
    census
      .withColumn("__cum", sum("__w").over(wCum))
      .withColumn("__total", sum("__w").over(wAll))
      .withColumn("p_ppm", explode(array(psPpm.map(lit): _*)))
      .filter(expr("CAST(__cum AS DECIMAL(38,0)) * 1000000" +
        " >= CAST(p_ppm AS DECIMAL(38,0)) * __total"))
      .groupBy(col(groupCol), col("p_ppm"))
      .agg(min("__v").as("q"))
      .select(col(groupCol), col("p_ppm"), col("q"))
  }

  /** Tukey-fence outlier rows per group: every row whose value falls
    * outside [q1 − k·IQR, q3 + k·IQR] — the robust measurement filter a
    * training pipeline runs before trusting a numeric signal. Quartiles
    * come from `censusQuantiles` (domain-sized state, no per-group
    * value buffering); the one-row-per-group fence table broadcasts
    * back, so the detail table is scanned once and never shuffles.
    * Output: the input columns + `lo`/`hi` (the unrounded fences the
    * filter compared against).
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 1.5): DataFrame = {
    val fences = censusQuantiles(df, groupCol, valueCol, Seq(0.25, 0.75))
      .groupBy(col(groupCol))
      .agg(max(when(col("p") === 0.25, col("q"))).as("__q1"),
        max(when(col("p") === 0.75, col("q"))).as("__q3"))
      .withColumn("lo", col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("hi", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .select(col(groupCol), col("lo"), col("hi"))
    df.join(broadcast(fences), Seq(groupCol))
      .filter(col(valueCol) < col("lo") || col(valueCol) > col("hi"))
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
