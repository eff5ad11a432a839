package graft.streaming

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table.
  *
  * Local smoke pattern: file-source readStream over the parquet →
  * transforms → memory sink → `processAllAvailable()`, which drains the
  * bounded input synchronously and leaves the result queryable as a
  * batch table. On a real cluster the same plans run against Kafka/file
  * streams unchanged — watermarks bound state, and stateful operators
  * use event-time timeouts.
  */
object EventStreams {

  /** Streaming read of events with the ts normalization applied (see
    * `Tables.normalizeEventsTs` — adapts whichever encoding the
    * generator used to session-zoned µs TimestampType).
    */
  def readEventsStream(spark: SparkSession, sfDir: String): DataFrame =
    // layout-aware (single-file testdata or a part-file directory) with
    // the ts normalization applied inside Tables.readTableStream
    graft.Tables.readTableStream(spark, sfDir, "events")

  // Concurrent drains (a gate overlapping independent streams) must not
  // race the shuffle-partition set/restore below: a naive prev/restore
  // pair can capture the OTHER drain's temporary value and leak it into
  // the session. Depth-counted: the first drain in saves the value, the
  // last one out restores it; the conf stays at the drain setting while
  // any drain is active.
  private val drainDepth = new java.util.concurrent.atomic.AtomicInteger(0)
  private var drainPrev: String = _
  private val drainLock = new Object

  private[graft] def runToMemory(df: DataFrame, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    // Stateful streaming ops allocate one state store per shuffle
    // partition at query start; for this drain-a-bounded-input pattern 8
    // is plenty and start-up cost scales with the store count. (A real
    // deployment sizes this to key cardinality / cluster width instead.)
    drainLock.synchronized {
      if (drainDepth.getAndIncrement() == 0) {
        drainPrev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
      }
    }
    try {
      val name = s"graft_stream_${System.nanoTime()}" +
        s"_t${Thread.currentThread().getId}"
      val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name)
    } finally drainLock.synchronized {
      if (drainDepth.decrementAndGet() == 0)
        spark.conf.set("spark.sql.shuffle.partitions", drainPrev)
    }
  }

  /** Tumbling 1-hour event-time window aggregation (complete mode —
    * equals the batch answer on bounded input, which the oracle checks).
    */
  /** Streaming k-anonymity monitor — q246's release at the door: the
    * quasi-identifier census runs as a streaming aggregation (Complete
    * mode; state is QI-sized, ≤ types×24 rows, NOT corpus-sized) and
    * the generalize/suppress plan applies to the drained snapshot —
    * the deployed form republishes the release per micro-batch through
    * foreachBatch. Bounded drain ≡ batch q246 (shared release plan via
    * `Profile.kAnonymityRelease`, shared oracle).
    */
  def streamingKAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val census = readEventsStream(spark, sfDir)
      .select(col("event_type"), hour(col("ts")).cast("bigint").as("hour_key"))
      .groupBy("event_type", "hour_key").agg(count(lit(1)).as("n"))
    val drained = runToMemory(census, OutputMode.Complete())
    graft.operators.Profile
      .kAnonymityRelease(drained, "event_type", "hour_key", k = 5L)
  }

  def hourlyWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    runToMemory(agg, OutputMode.Complete())
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Sliding 2-hour/1-hour event-time window aggregation — each event
    * lands in two windows; complete mode equals the shifted-buckets
    * batch answer on bounded input.
    */
  def slidingWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    runToMemory(agg, OutputMode.Complete())
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Watermark-scoped streaming dedup (`dropDuplicatesWithinWatermark`):
    * state for a key expires once the watermark passes it — the
    * bounded-state form of streaming dedup. On bounded input drained in
    * one batch it equals exact distinct, which the oracle checks.
    */
  def dedupWithinWatermarkCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = readEventsStream(spark, sfDir)
      .select("user_id", "event_type", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
    runToMemory(deduped, OutputMode.Complete())
      .orderBy("event_type")
  }

  /** Streaming dedup on (user_id, event_type) then count per type —
    * equals COUNT(DISTINCT user_id) per type on bounded input.
    */
  def streamingDedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = readEventsStream(spark, sfDir)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
    runToMemory(deduped, OutputMode.Complete())
      .orderBy("event_type")
  }

  /** Streaming cardinality monitor: per-hour/per-type distinct-user
    * ESTIMATES from the mergeable HLL behind `approx_count_distinct` —
    * the sketch a 100 TB stream aggregates with bounded state (exact
    * streaming COUNT(DISTINCT) would hold every user id per open
    * window; the sketch holds KBs and merges map-side across
    * partitions). Drained on the bounded feed, the estimates are
    * refereed against the exact batch distinct counts; rows emit only
    * when the relative error leaves the sketch's contract band (or a
    * window/type disagrees between the two sides — the FULL join makes
    * a missing window a violation, not a silent drop), so the driver
    * oracle is the empty relation.
    */
  def streamingDistinctMonitor(spark: SparkSession, sfDir: String,
                               bound: Double = 0.15,
                               absSlack: Long = 5L): DataFrame = {
    val est = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est_users"))
    val drained = runToMemory(est, OutputMode.Complete())
      .select(col("w.start").as("window_start"), col("event_type"),
        col("est_users"))
    val exact = graft.Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("exact_users"))
    distinctMonitorReferee(drained, exact, bound, absSlack)
  }

  /** The referee half, factored out so the spec can feed it corrupted
    * estimates: violations = est/exact mismatch beyond BOTH the
    * relative band and the absolute slack, OR a (window, type) present
    * on only one side. The two-sided band is the honest statement of
    * the HLL contract — relative error is the asymptotic guarantee
    * (rsd·n scaling), while at the tiny per-window cardinalities of
    * this feed a ±few-users register wobble is in-contract even though
    * it is a large FRACTION of a 4-user window.
    */
  private[graft] def distinctMonitorReferee(est: DataFrame, exact: DataFrame,
                                            bound: Double,
                                            absSlack: Long): DataFrame =
    est.join(exact, Seq("window_start", "event_type"), "full")
      .withColumn("rel_err",
        abs(col("est_users") - col("exact_users")).cast("double")
          / col("exact_users"))
      .filter((col("rel_err") > bound &&
          abs(col("est_users") - col("exact_users")) > absSlack) ||
        col("est_users").isNull || col("exact_users").isNull)
      .select(col("window_start"), col("event_type"), col("est_users"),
        col("exact_users"), round(col("rel_err"), 6).as("rel_err"))
      .orderBy("window_start", "event_type")

  /** Streaming PSI drift monitor — the streaming twin of the q159
    * batch profile: per-day population-stability index of the event
    * `value` distribution against a STATIC whole-corpus baseline. The
    * streaming side computes only the per-(day-window, bucket) census —
    * a watermarked windowed aggregate whose state is bounded by
    * buckets × open windows, never the feed — and the PSI arithmetic
    * runs batch-side on the drained day × bucket relation joined to the
    * broadcast baseline (model-sized: the baseline census is one
    * bucket-count table). In production the baseline is a persisted
    * profile refreshed per corpus release; a day whose PSI crosses the
    * action band is the "feed changed under us" alarm that fires before
    * any content-level signal moves. Fixed-width value buckets with the
    * q159 1e-6 clamp; Complete mode equals the batch answer on the
    * bounded drain, which is exactly what the driver oracle checks.
    */
  def streamingPsiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = floor(col("value") / lit(10.0)).cast("long").as("bucket")
    val daily = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), bucket)
      .agg(count(lit(1)).as("nc"))
    val obs = runToMemory(daily, OutputMode.Complete())
      .select(col("w.start").cast("date").as("dt"), col("bucket"), col("nc"))
    val batch = graft.Tables.load(spark, sfDir, "events")
    val base = batch.select(bucket).groupBy("bucket")
      .agg(count(lit(1)).as("nb"))
    val nBase = broadcast(batch.agg(count(lit(1)).as("n_base")))
    val nDay = obs.groupBy("dt").agg(sum("nc").as("n_day"))
    val sh = nDay.select("dt").crossJoin(broadcast(base.select("bucket")))
      .join(broadcast(base), Seq("bucket"), "left").crossJoin(nBase)
      .join(obs, Seq("dt", "bucket"), "left")
      .join(nDay, Seq("dt"))
      .select(col("dt"),
        greatest(coalesce(col("nb"), lit(0L)) / col("n_base"), lit(1e-6))
          .as("p"),
        greatest(coalesce(col("nc"), lit(0L)) / col("n_day"), lit(1e-6))
          .as("q"))
    sh.groupBy("dt")
      .agg(round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6)
        .as("psi"))
      .withColumn("band",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate").otherwise("action"))
      .orderBy("dt")
  }

  /** Streaming twin of the q158 ingest-volume anomaly detector: the
    * stream maintains only the watermarked per-(day, type) count —
    * state bounded by types × open windows — and the trailing-7-day
    * z-score runs batch-side on the drained calendar-bounded relation,
    * with identical semantics (ROWS frame excluding the current day,
    * warm-up rows dropped, zero-variance weeks NULL). Complete mode ≡
    * batch on the bounded drain, so the query SHARES q158's oracle —
    * the q153/q113 shared-oracle pattern.
    */
  def streamingVolumeAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val drained = runToMemory(daily, OutputMode.Complete())
      .select(col("event_type"), col("w.start").cast("date").as("dt"),
        col("n"))
    val w = Window.partitionBy("event_type").orderBy("dt")
      .rowsBetween(-7, -1)
    drained
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .withColumn("n_hist", count(col("n")).over(w))
      .filter(col("n_hist") >= 7)
      .withColumn("z",
        when(col("sd") > 0, round((col("n") - col("mu")) / col("sd"), 6)))
      .select(col("event_type"), col("dt"), col("n"),
        round(col("mu"), 6).as("mu"), round(col("sd"), 6).as("sd"),
        col("z"), coalesce(abs(col("z")) > 3, lit(false)).as("is_anomaly"))
      .orderBy("event_type", "dt")
  }

  /** Streaming heavy-hitters monitor: per-day Misra–Gries summaries of
    * user activity — the bounded-state streaming form of "who are the
    * heavy users this window". Exact per-window top contributors would
    * hold EVERY key of every open window in the state store; the MG
    * summary holds `m` counters per window, partials merge map-side
    * within a micro-batch and across micro-batches through the state
    * store's merge path, and the final summary carries its exact
    * accumulated decrement `err`. Drained on the bounded feed, each
    * window is refereed against the exact batch counts on the
    * DETERMINISTIC MG contract (est ≤ true; undercount ≤ err; any key
    * with true count > err is present) — the contract holds under any
    * micro-batch arrival/merge order even though the counter values do
    * not, so the driver oracle is the empty relation. `m` defaults low
    * on purpose: at the testdata's per-window cardinalities a roomy
    * summary would be exact and the decrement path would never run.
    */
  def streamingHeavyHittersMonitor(spark: SparkSession, sfDir: String,
                                   m: Int = 8): DataFrame = {
    val mg = udaf(new graft.functions.HeavyHittersAggregator(m),
      org.apache.spark.sql.Encoders.STRING)
    val est = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(mg(col("user_id").cast("string")).as("hh"))
    val drained = runToMemory(est, OutputMode.Complete())
      .select(col("w.start").as("window_start"),
        explode_outer(col("hh._1")).as("item"), col("hh._2").as("err"))
      .select(col("window_start"), col("item._1").as("user_key"),
        col("item._2").as("est_cnt"), col("err"))
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"),
        col("user_id").cast("string").as("user_key"))
      .agg(count(lit(1)).as("exact_cnt"))
      .select(col("w.start").as("window_start"), col("user_key"),
        col("exact_cnt"))
    heavyHittersReferee(drained, exact)
  }

  /** The referee half, factored out so the spec can feed it corrupted
    * summaries: violations = a summary counter above the true count
    * (including a key the data never produced), an undercount beyond
    * the window's exact `err`, a guaranteed-heavy key (true > err)
    * absent from the summary, or a window present on only one side.
    * The exact side plays referee only — at 100 TB the summary pass
    * REPLACES it.
    */
  private[graft] def heavyHittersReferee(est: DataFrame,
                                         exact: DataFrame): DataFrame = {
    val errs = est.groupBy("window_start").agg(max("err").as("err"))
    val items = est.filter(col("user_key").isNotNull)
      .select("window_start", "user_key", "est_cnt")
    exact.join(items, Seq("window_start", "user_key"), "full")
      .join(errs, Seq("window_start"), "left")
      .withColumn("kind",
        when(col("err").isNull, lit("window_missing"))
          .when(col("exact_cnt").isNull, lit("overcount"))
          .when(col("est_cnt") > col("exact_cnt"), lit("overcount"))
          .when(col("est_cnt").isNotNull &&
            col("est_cnt") < col("exact_cnt") - col("err"), lit("undercount"))
          .when(col("est_cnt").isNull && col("exact_cnt") > col("err"),
            lit("missing_heavy")))
      .filter(col("kind").isNotNull)
      .select(col("kind"), col("window_start"), col("user_key"),
        col("exact_cnt"), col("est_cnt"), col("err"))
      .orderBy("kind", "window_start", "user_key")
  }

  /** Streaming incremental dedup against a static history — the
    * streaming-ingestion twin of `Dedup.newAgainstHistory`: events after
    * the cutoff anti-join a STATIC frame of already-seen
    * (user_id, event_type) pairs, then an in-stream dropDuplicates keeps
    * the first occurrence of each surviving pair. The stream-static
    * LEFT ANTI join is STATELESS — the static side re-plans per
    * micro-batch (broadcast hash), so no join state accumulates; the
    * only state is one dedup entry per emitted pair (the q37 trade-off:
    * pair identity is global, so the state is keyed-bounded, not
    * time-bounded — a TTL'd deployment adds a watermark). On the
    * bounded drain the result equals the batch anti-join, which the
    * q99 oracle checks.
    */
  def streamingNewAgainstHistory(spark: SparkSession, sfDir: String,
                                 cutoff: String = "2024-01-03"): DataFrame = {
    val history = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < to_timestamp(lit(cutoff)))
      .select("user_id", "event_type").distinct()
    val fresh = readEventsStream(spark, sfDir)
      .filter(col("ts") >= to_timestamp(lit(cutoff)))
      .select("user_id", "event_type")
      .join(history, Seq("user_id", "event_type"), "left_anti")
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_new_pairs"))
    runToMemory(fresh, OutputMode.Complete())
      .orderBy("event_type")
  }

  /** Stream-static enrichment join: the event stream joins a STATIC dim
    * (customer → market segment) before the windowed aggregation. A
    * stream-static join is stateless — the static side is re-planned
    * per micro-batch as a broadcast hash join, so the stream never
    * shuffles for the join and no join state accumulates (unlike
    * stream-stream joins, which buffer both sides in the state store).
    * At 100 TB/day the dim refreshes by replacing the static frame
    * between restarts; the streaming plan is unchanged. On the bounded
    * drain the result equals the batch join+agg, which the oracle checks.
    */
  /** Streaming UPSERT VIEW — the CDC stack's streaming leg (batch diff
    * q83 / batch merge q84 / SCD2 q85 get their ingestion twin, the
    * same completion move q118 made for LSH dedup): the event stream is
    * a change feed keyed by `user_id`, and the view materializes each
    * key's LAST-WRITE-WINS row, ordered by (ts, event_id) — event_id
    * is unique, so the winner is deterministic.
    *
    * Declarative on purpose: `max(struct(ts, event_id, …))` is a
    * streaming AGGREGATION, so Catalyst gives it a map-side partial
    * merge — each micro-batch reduces to ≤ one candidate row per key
    * per input partition BEFORE the state-store shuffle, which a
    * `mapGroupsWithState` formulation would forfeit (every event would
    * cross the exchange). State is exactly one struct per key in
    * RocksDB — the upsert-view contract — and grows with key
    * cardinality, not event volume. Complete mode materializes the
    * bounded drain for the oracle; a real deployment emits UPDATE mode
    * into a KV/Delta sink and the state itself IS the view.
    */
  def streamingUpsertView(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventsStream(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
    runToMemory(agg, OutputMode.Complete())
      .select(col("user_id"), col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_event_type"),
        col("m.value").as("last_value"))
      .orderBy("user_id")
  }

  def streamStaticSegmentCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val segments = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val agg = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .join(broadcast(segments), Seq("user_id"), "left")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    runToMemory(agg, OutputMode.Complete())
      .select(col("w.start").as("window_start"), col("segment"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "segment", "event_type")
  }

  /** Watermarked stream-stream interval join: each click paired with the
    * same user's purchases in the hour before it. The two-sided
    * event-time bound in the join condition is what lets the engine
    * expire buffered rows: a purchase can be dropped from state once the
    * click watermark passes purchase_ts + 1h, and vice versa — without
    * it a stream-stream join buffers both streams forever. On the
    * bounded single-batch drain the inner join equals the batch
    * inequality join, which is the oracle.
    */
  def streamIntervalJoinPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val clicks = readEventsStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = readEventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
    runToMemory(joined.select(col("click_id"), col("purchase_id"), col("user_id")),
        OutputMode.Append())
      .orderBy("click_id", "purchase_id")
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long,
                            max_session_events: Long)

  /** O(1)-per-key sessionization state: five longs, whatever the event
    * volume — the all-timestamps buffer this replaces OOMed the state
    * store on hot keys by construction.
    */
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long,
                       curEvents: Long, maxEvents: Long)

  private[graft] val sessionGapMicros = 30L * 60 * 1000000

  /** Advance an O(1) session state by one batch of timestamps.
    * The batch is sorted (a per-batch working set, NOT carried state).
    * An event joins an existing session when it is within the gap of ANY
    * known neighbor: its sorted in-batch predecessor, or the carried
    * lastTs (in either direction). In-order batches therefore follow the
    * exact 30-min-gap rule (the predecessor dominates lastTs), and a
    * late burst sessionizes among itself instead of each late event
    * counting separately against the newer lastTs. What the O(1) state
    * cannot reconstruct is an earlier-batch event bridging a late
    * cluster to history, so such a cluster counts as at most ONE extra
    * (conservative) session. The watermark bounds how late that can
    * happen, exactly like the built-in session_window.
    *
    * Per-session event counts: the carried curEvents tracks the CURRENT
    * (in-order) session; late events (t < lastTs, a sorted-batch prefix)
    * are counted with a batch-local cursor so a late burst's own session
    * size reaches maxEvents without contaminating the current session's
    * counter. An event attached to the current session only backwards
    * through lastTs updates the totals alone. maxEvents is exact on
    * in-order input (and therefore on the sorted single-batch drain the
    * oracle checks) and a lower bound under cross-batch lateness.
    */
  private[graft] def foldSession(prev: Option[SessState], batchTs: Array[Long]): SessState = {
    java.util.Arrays.sort(batchTs)
    var st = prev.getOrElse(SessState(Long.MinValue, 0L, 0L, 0L, 0L))
    var prevInBatch = Long.MinValue
    var burstCur = 0L // local cursor for the late (t < lastTs) prefix
    var i = 0
    while (i < batchTs.length) {
      val t = batchTs(i)
      // Sentinel checks, NOT `t - x` on the seed: subtracting
      // Long.MinValue overflows and would miss the first session.
      val nearPrev = prevInBatch != Long.MinValue &&
        t - prevInBatch <= sessionGapMicros
      val nearLast = st.lastTs != Long.MinValue &&
        math.abs(t - st.lastTs) <= sessionGapMicros
      val newSession = !(nearPrev || nearLast)
      val late = st.lastTs != Long.MinValue && t < st.lastTs
      var cur = st.curEvents
      var counted = 0L
      if (late) {
        // late prefix: size its sessions locally; a late event attached
        // to the current session via lastTs alone is totals-only.
        if (newSession) { burstCur = 1L; counted = burstCur }
        else if (nearPrev) { burstCur += 1L; counted = burstCur }
      } else {
        if (newSession) cur = 1L else cur += 1L
        counted = cur
      }
      st = SessState(
        lastTs = math.max(st.lastTs, t),
        nSessions = st.nSessions + (if (newSession) 1 else 0),
        nEvents = st.nEvents + 1,
        curEvents = cur,
        maxEvents = math.max(st.maxEvents, counted))
      prevInBatch = t
      i += 1
    }
    st
  }

  /** Stateful sessionization via flatMapGroupsWithState: counts
    * 30-minute-gap sessions per user with O(1) state per key (five
    * longs) and an EVENT-TIME timeout — once the watermark passes a
    * key's lastTs + gap its state is freed, so the store holds only
    * currently-active users, not the all-time key set. Each batch a key
    * receives data it emits its running summary (changelog semantics:
    * the latest row per key is the answer, and it already holds the
    * final counts when the key later expires, so expiry itself emits
    * nothing and can't duplicate). On the bounded single-batch drain the
    * changelog equals the batch answer (q34_sessionize, the
    * oracle-verified twin). The timeout/expiry path is pinned in
    * EventStreamsSpec with a multi-batch MemoryStream.
    */
  def statefulSessionCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = readEventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"))
      .as[Ev]
    runToMemory(sessionSummaries(ds).toDF(), OutputMode.Append())
      .orderBy("user_id")
  }

  /** The stateful sessionization transform alone, source/sink-agnostic —
    * `statefulSessionCounts` drives it from the events file stream;
    * EventStreamsSpec drives it through a checkpointed stop/restart
    * cycle (the recovery path a long-lived deployment exercises daily).
    */
  def sessionSummaries(ds: org.apache.spark.sql.Dataset[Ev]): org.apache.spark.sql.Dataset[SessionSummary] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, events, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // Quiet past watermark+gap. The last changelog row already
            // carried these counts — just free the state.
            state.remove()
            Iterator.empty
          } else {
            val batch = events.map { e => // full µs precision (getTime is ms-truncated)
              val i = e.ts.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }.toArray
            val st = foldSession(state.getOption, batch)
            state.update(st)
            // must stay ahead of the watermark or the set call throws
            state.setTimeoutTimestamp(math.max(
              (st.lastTs + sessionGapMicros) / 1000L,
              state.getCurrentWatermarkMs() + 1))
            Iterator(SessionSummary(uid, st.nSessions, st.nEvents, st.maxEvents))
          }
      }
  }
}
