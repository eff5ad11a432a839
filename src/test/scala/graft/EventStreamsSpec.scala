package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics the batch oracle cannot check: watermark-driven
  * late-data drop in append mode. (The bounded-input streaming queries
  * q36-q42 are oracle-checked against batch equivalents instead.)
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("stream readers handle both table layouts: single file and " +
      "part-file directory") {
    // The driver's testdata stores each table as ONE parquet file; any
    // real lake table (and the GenScale sf1 corpus) is a DIRECTORY of
    // part files under the same `<name>.parquet` path. A reader matching
    // only one layout silently streams 0 rows on the other — caught live
    // at sf1, where every documents-stream query drained empty.
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_layout").toString
    docs.repartition(4).write.parquet(s"$dir/documents.parquet")
    val nParts = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir, "documents.parquet"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(nParts === 4, "fixture must be a genuine multi-part directory")
    val drained = EventStreams.runToMemory(
      graft.streaming.DocumentStreams.readDocumentsStream(spark, dir),
      OutputMode.Append())
    assert(drained.count() === docs.count())
    // the single-file layout (the driver's) keeps working via the glob
    val single = EventStreams.runToMemory(
      graft.streaming.DocumentStreams.readDocumentsStream(spark, sfDir),
      OutputMode.Append())
    assert(single.count() === docs.count())
  }

  test("streaming image profile drains to the batch profile on the " +
      "referee slice, non-vacuously") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q239_stream_image_profile")(spark, sfDir)
      .collect().toSeq
    val path = Tables.documentsPngFilesLayout(spark, sfDir)
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "{?,??,???}.png").load(path)
      .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
        .cast("bigint").as("doc_id"),
        col("content").as("payload"), lit("image/png").as("mime"))
      .as[graft.operators.Multimodal.MediaRow]
    val batch = graft.operators.Multimodal.imageProfile(media).toDF()
      .orderBy("doc_id").collect().toSeq
    assert(got.nonEmpty, "drain must be non-vacuous")
    assert(got === batch)
  }

  test("streaming license scrub drains to the batch q245 relation, " +
      "non-vacuously") {
    val got = SparkEntry.queries("q249_stream_license_scrub")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("q245_license_scrub")(spark, sfDir)
      .collect().toSeq
    assert(got.nonEmpty, "drain must be non-vacuous")
    assert(got === batch)
  }

  test("streaming distinct-n monitor drains to the batch q248 relation, " +
      "non-vacuously") {
    val got = SparkEntry.queries("q257_stream_distinct_ngrams")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("q248_distinct_ngrams")(spark, sfDir)
      .collect().toSeq
    assert(got.nonEmpty, "drain must be non-vacuous")
    assert(got === batch)
  }

  test("streaming FIM and MLM twins drain to their batch relations, " +
      "non-vacuously") {
    Seq("q260_stream_fim_transform" -> "q243_fim_transform",
      "q261_stream_mlm_masking" -> "q256_mlm_masking",
      "q268_stream_contrastive_crops" -> "q267_contrastive_crops",
      "q271_stream_skipgram_census" -> "q269_skipgram_census").foreach {
      case (streamQ, batchQ) =>
        val got = SparkEntry.queries(streamQ)(spark, sfDir).collect().toSeq
        val batch = SparkEntry.queries(batchQ)(spark, sfDir).collect().toSeq
        assert(got.nonEmpty, s"$streamQ drain must be non-vacuous")
        assert(got === batch, s"$streamQ vs $batchQ")
    }
  }

  test("streaming best-of-n drains to the batch q247 relation, " +
      "non-vacuously") {
    val got = SparkEntry.queries("q258_stream_best_of_n")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("q247_best_of_n")(spark, sfDir)
      .collect().toSeq
    assert(got.nonEmpty, "drain must be non-vacuous")
    assert(got === batch)
  }

  test("streaming k-anonymity drains to the batch q246 release, " +
      "non-vacuously") {
    val got = SparkEntry.queries("q251_stream_k_anonymity")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("q246_k_anonymity")(spark, sfDir)
      .collect().toSeq
    assert(got.nonEmpty, "drain must be non-vacuous")
    assert(got === batch)
  }

  test("streaming LSH dedup drains to the batch twin's kept set") {
    import graft.streaming.DocumentStreams
    import graft.operators.Dedup
    val streamIds = DocumentStreams
      .streamingLshNewAgainstHistory(spark, sfDir, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    val d = Tables.load(spark, sfDir, "documents")
    val batchIds = Dedup.lshNewAgainstHistory(
        history = d.filter(col("doc_id") % 3 =!= 0),
        batch = d.filter(col("doc_id") % 2 === 0),
        idCol = "doc_id", textCol = "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(streamIds === batchIds && streamIds.nonEmpty)
  }

  test("streaming LSH dedup: exact + near dups dropped in-flight, NULL text kept") {
    import graft.streaming.DocumentStreams
    // history = %3≠0 → {1, 2, 4}; stream batch = %2=0 → {4, 12, 18, 24}.
    // 4 is its own exact history dup; 12 is a 7/9-Jaccard near-dup of 1
    // (bands=32 ⇒ miss P≈7e-13 at threshold 0.5); 18 is novel; 24 has
    // NULL text — the explode_outer keeps it as a keyless row and it
    // must come out the far end as new.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "some entirely separate history document content here"),
      (4L, "this exact document appears in history and in the stream"),
      (12L, "the quick brown fox jumps over the lazy dog today"),
      (18L, "completely novel words that match nothing in the history"),
      (24L, null.asInstanceOf[String])
    ).map { case (id, t) => (id, t, "en", "src", Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs")
    val stage = java.nio.file.Files.createTempDirectory("graft_stage").toString + "/out"
    docs.coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, dir.resolve("documents.parquet"))
    val kept = DocumentStreams
      .streamingLshNewAgainstHistory(spark, dir.toString, threshold = 0.5, bands = 32)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(18L, 24L))
  }

  test("streaming upsert view: cross-batch last-write-wins; state is one row per key") {
    import graft.streaming.EventStreams
    // Batch 1: two keys. Batch 2 brings an OLDER event for key 1 (must
    // lose to the state it finds) and a newer event for key 2 (must
    // win), plus a brand-new key 3 — the upsert-view semantics that only
    // show up ACROSS micro-batches, which the bounded-drain oracle
    // can't distinguish from a single-batch argmax.
    def ev(id: Long, uid: Long, minute: Int, typ: String, v: Double) =
      (id, ts(minute), uid, typ, v, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = java.nio.file.Files.createTempDirectory("graft_upsert")
    val inDir = s"$base/in"
    val b1 = Seq(ev(10L, 1L, 30, "click", 1.0), ev(11L, 2L, 30, "view", 2.0))
      .toDF(cols: _*)
    b1.write.parquet(inDir)
    val schema = b1.schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val agg = spark.readStream.schema(schema).parquet(inDir)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("upsert_view_t").start()
      try {
        q.processAllAvailable()
        Seq(ev(20L, 1L, 10, "stale", 9.0), ev(21L, 2L, 50, "purchase", 5.0),
            ev(22L, 3L, 40, "click", 7.0))
          .toDF(cols: _*).write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark.table("upsert_view_t")
          .select(col("user_id"), col("m.event_id")).as[(Long, Long)]
          .collect().toMap
        assert(got === Map(1L -> 10L, 2L -> 21L, 3L -> 22L))
        // The upsert-view contract: state rows == live keys, not events.
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows === 3L, s"state holds $stateRows rows for 3 keys")
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("streaming state lives in RocksDB, not on the JVM heap") {
    // Every stateful query in this suite (and q36-q42/q61 under the
    // oracle gate) runs with this provider; at 100 TB key cardinality
    // heap-resident state is the bottleneck the RocksDB store removes.
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
  }

  test("stream-stream interval join expires buffered state behind the watermark") {
    implicit val sq = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val buysIn = MemoryStream[(Long, Long, Timestamp)]
    val clicks = clicksIn.toDF().toDF("click_id", "user_id", "click_ts")
      .withWatermark("click_ts", "5 minutes")
    val buys = buysIn.toDF().toDF("purchase_id", "p_user_id", "purchase_ts")
      .withWatermark("purchase_ts", "5 minutes")
    val joined = clicks.join(buys,
      $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"click_ts" - expr("INTERVAL 10 MINUTES") &&
        $"purchase_ts" <= $"click_ts")
      .select($"click_id", $"purchase_id")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssjoin_test").start()
    try {
      // Batch 1: purchase at 10:01; click at 10:05 matches (within 10 min).
      buysIn.addData((100L, 1L, ts(1)))
      clicksIn.addData((200L, 1L, ts(5)))
      q.processAllAvailable()
      // Batch 2: advance both watermarks far past 10:01 + 10 min.
      clicksIn.addData((201L, 2L, Timestamp.valueOf("2026-01-01 11:30:00")))
      buysIn.addData((101L, 2L, Timestamp.valueOf("2026-01-01 11:29:00")))
      q.processAllAvailable()
      // Batch 3: a click that WOULD match the 10:01 purchase arrives
      // late — the purchase's buffered row is expired, no pair emitted.
      clicksIn.addData((202L, 1L, ts(8)))
      q.processAllAvailable()

      val pairs = spark.table("ssjoin_test")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((200L, 100L)) && pairs.contains((201L, 101L)))
      assert(!pairs.contains((202L, 100L)),
        "join state for the 10:01 purchase should have been expired by the watermark")
    } finally q.stop()
  }

  test("append-mode windowed agg drops events later than the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"k", $"n")

    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_data_test").start()
    try {
      // Batch 1: two on-time events in the 10:00 window.
      input.addData((ts(1), "a"), (ts(4), "a"))
      q.processAllAvailable()
      // Batch 2: advance event time far enough that the watermark
      // (max 41 - 5 = 10:36) passes the 10:00 window end (10:10).
      input.addData((ts(41), "a"))
      q.processAllAvailable()
      // Batch 3: a LATE event for the long-closed 10:00 window → dropped.
      input.addData((ts(2), "a"))
      q.processAllAvailable()
      // Batch 4: advance watermark past the 10:40 window so it emits too.
      input.addData((Timestamp.valueOf("2026-01-01 11:30:00"), "a"))
      q.processAllAvailable()

      val out = spark.table("late_data_test")
        .select($"ws", $"n").as[(Timestamp, Long)].collect().toMap
      // 10:00 window finalized with 2 — the late event did NOT bump it to 3.
      assert(out(Timestamp.valueOf("2026-01-01 10:00:00")) === 2L)
      assert(out(Timestamp.valueOf("2026-01-01 10:40:00")) === 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("k")

    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ddww_test").start()
    try {
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      val n1 = spark.table("ddww_test").count()
      assert(n1 === 2L, "duplicates within one batch must collapse")
    } finally q.stop()
  }

  test("stateful streaming sessionization equals the batch window-function answer") {
    // q38 (flatMapGroupsWithState) must agree with q34 (oracle-verified
    // gaps-and-islands) on the FULL contract incl. max_session_events —
    // this is the check that caught a seed-sentinel overflow dropping
    // every user's first session.
    val stream = SparkEntry.queries("q38_stream_sessions")(spark, sfDir)
      .select("user_id", "n_sessions", "n_events", "max_session_events")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val batch = SparkEntry.queries("q34_sessionize")(spark, sfDir)
      .select("user_id", "n_sessions", "n_events", "max_session_events")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

  test("sessionization state is O(1) per key: five longs, no event buffer") {
    // The state class carries exactly (lastTs, nSessions, nEvents,
    // curEvents, maxEvents) — if a collection field reappears here, hot
    // keys OOM the state store again.
    val st = graft.streaming.EventStreams.SessState(1L, 2L, 3L, 4L, 5L)
    assert(st.productArity === 5)
    assert(st.productIterator.forall(_.isInstanceOf[Long]))
  }

  test("foldSession: exact in-order sessions, conservative cross-batch late data") {
    import graft.streaming.EventStreams.{foldSession, sessionGapMicros, SessState}
    val gap = sessionGapMicros
    // one batch, two sessions (gap exceeded between 2nd and 3rd event):
    // first session had 2 events (the max), current has 1
    val a = foldSession(None, Array(0L, gap, 3 * gap))
    assert(a === SessState(3 * gap, 2L, 3L, 1L, 2L))
    // same events split across batches, in order → identical result
    val b = foldSession(Some(foldSession(None, Array(0L, gap))), Array(3 * gap))
    assert(b === a)
    // unsorted within a batch is fine (per-batch sort, not carried state)
    val c = foldSession(None, Array(3 * gap, 0L, gap))
    assert(c === a)
    // cross-batch late event inside the gap window of lastTs: same
    // session, counted into n_events only (per-session attribution of a
    // PAST-side attach is unknowable with O(1) state)
    val d = foldSession(Some(a), Array(3 * gap - 1000L))
    assert(d === SessState(3 * gap, 2L, 4L, 1L, 2L))
    // cross-batch late event far before the current session: counted as
    // its own (conservative) session — history is never re-split
    val e = foldSession(Some(a), Array(-10 * gap))
    assert(e === SessState(3 * gap, 3L, 4L, 1L, 2L))
    // a LATE BURST (three events 1s apart, far in the past) sessionizes
    // among itself: ONE extra session of three events (reflected in
    // maxEvents) — and it must NOT hijack the current session's counter
    val f = foldSession(Some(a), Array(-10 * gap, -10 * gap + 1000L, -10 * gap + 2000L))
    assert(f === SessState(3 * gap, 3L, 6L, 1L, 3L))
    // the review scenario: burst then an in-order continuation — max is
    // the burst's 3, not a contaminated 4
    val h = foldSession(Some(a),
      Array(-10 * gap, -10 * gap + 1000L, -10 * gap + 2000L, 3 * gap + 1000L))
    assert(h === SessState(3 * gap + 1000L, 3L, 7L, 2L, 3L))
    // an event far from its in-batch predecessor but within the gap of
    // the carried lastTs joins the current session — the nearLast
    // disjunct specifically (prevInBatch is set and far away here)
    val g = foldSession(Some(a), Array(-10 * gap, 3 * gap - 1000L))
    assert(g === SessState(3 * gap, 3L, 5L, 1L, 2L))
  }

  test("sessionization frees state via event-time timeout; late key restarts an epoch") {
    import graft.streaming.EventStreams.{foldSession, sessionGapMicros, SessState, Ev, SessionSummary}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val gapMs = sessionGapMicros / 1000
    val ds = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "5 minutes")
      .as[Ev]
    val out = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, events, state: GroupState[SessState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator((uid, -1L, -1L, true)) }
          else {
            val batch = events.map { e =>
              val i = e.ts.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }.toArray
            val st = foldSession(state.getOption, batch)
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              (st.lastTs + sessionGapMicros) / 1000L,
              state.getCurrentWatermarkMs() + 1))
            Iterator((uid, st.nSessions, st.nEvents, false))
          }
      }
    val q = out.toDF("user_id", "n_sessions", "n_events", "expired")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_timeout_test").start()
    try {
      input.addData((1L, ts(0)), (1L, ts(5)))
      q.processAllAvailable()
      // Advance the watermark (via user 2) far past user 1's lastTs+gap
      // → user 1's state times out and is removed.
      input.addData((2L, Timestamp.valueOf("2026-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sess_timeout_test")
        .as[(Long, Long, Long, Boolean)].collect()
      assert(rows.contains((1L, 1L, 2L, false)), s"changelog row missing: ${rows.toSeq}")
      assert(rows.contains((1L, -1L, -1L, true)), s"timeout expiry missing: ${rows.toSeq}")
      // User 1 reappears AFTER expiry: a fresh activity epoch (counts
      // restart) — the documented trade for never holding all-time state.
      input.addData((1L, Timestamp.valueOf("2026-01-01 13:01:00")))
      q.processAllAvailable()
      val rows2 = spark.table("sess_timeout_test")
        .as[(Long, Long, Long, Boolean)].collect()
      assert(rows2.contains((1L, 1L, 1L, false)), s"fresh epoch missing: ${rows2.toSeq}")
    } finally q.stop()
  }

  test("stream-static join is stateless: only the window agg holds state") {
    import graft.streaming.EventStreams
    // Result equality vs the batch twin is q87's oracle gate; here pin
    // the STRUCTURAL property that makes stream-static scale: the join
    // itself buffers nothing, so exactly one stateful operator (the
    // windowed aggregation) appears in the executed streaming plan.
    val out = EventStreams.streamStaticSegmentCounts(spark, sfDir)
    assert(out.count() > 0)
    val progress = spark.streams.active.isEmpty // drained queries stopped
    assert(progress)
    val batch = {
      val segs = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      Tables.load(spark, sfDir, "events")
        .join(broadcast(segs), Seq("user_id"), "left")
        .groupBy(window(col("ts"), "1 hour"), col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("segment"),
          col("event_type"), col("n"), col("sum_value"))
    }
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }

  // ---- checkpoint-restart recovery -------------------------------------
  // The one streaming behavior a long-lived deployment exercises daily:
  // kill a query, let data arrive while it is down, resume from the
  // checkpoint — recovered state + new files must reproduce the batch
  // answer over ALL the data (nothing reprocessed, nothing lost).

  /** Event-time split of the events table into two in-order halves,
    * written as parquet into one source dir (half 2 appended later while
    * the query is "down"). In-order arrival keeps the sessionization
    * fold exact, so the batch oracle is an equality, not a bound.
    */
  private def splitEventsDir(): (java.nio.file.Path, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val cutoff = events
      .agg(expr("percentile_approx(unix_micros(ts), 0.5, 10000)")).head.getLong(0)
    val h1 = events.filter(unix_micros(col("ts")) < cutoff)
    val h2 = events.filter(unix_micros(col("ts")) >= cutoff)
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_restart")
    h1.write.parquet(s"$base/in")
    (base, h1, h2)
  }

  test("windowed aggregation recovers its state from the checkpoint after a kill") {
    val (base, h1, h2) = splitEventsDir()
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    val schema = h1.schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def start(runName: String) = spark.readStream.schema(schema).parquet(inDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .writeStream.outputMode(OutputMode.Complete()).format("memory")
        .queryName(runName).option("checkpointLocation", ckpt).start()
      val q1 = start("ckpt_win_run1")
      try q1.processAllAvailable() finally q1.stop()
      // Down: the second half of the data arrives as new files.
      h2.write.mode("append").parquet(inDir)
      val q2 = start("ckpt_win_run2")
      val run2Rows = try {
        q2.processAllAvailable()
        q2.recentProgress.map(_.numInputRows).sum
      } finally q2.stop()
      // Restart consumed ONLY the new files — half 1 lives in the
      // recovered aggregation state, not in reprocessed input.
      assert(run2Rows <= h2.count(),
        s"restart reprocessed old files: read $run2Rows rows, half2 has ${h2.count()}")
      val got = spark.table("ckpt_win_run2")
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      val want = Tables.load(spark, sfDir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "recovered-state + new-files aggregate must equal the batch answer over all events")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q99 stream-static anti-join recovers its dedup state from the checkpoint") {
    // The state that must survive the kill is dropDuplicates' seen-pair
    // set: a pair first emitted in run 1 that reappears in run 2's files
    // would double-count without the recovered state (Complete-mode
    // counts re-emit from aggregate state, so the equality with the
    // batch anti-join proves both recoveries at once).
    val (base, h1, h2) = splitEventsDir()
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt99"
    val schema = h1.schema
    val cutoff = "2024-01-03"
    val history = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < to_timestamp(lit(cutoff)))
      .select("user_id", "event_type").distinct()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def start(runName: String) = spark.readStream.schema(schema).parquet(inDir)
        .filter(col("ts") >= to_timestamp(lit(cutoff)))
        .select("user_id", "event_type")
        .join(history, Seq("user_id", "event_type"), "left_anti")
        .dropDuplicates("user_id", "event_type")
        .groupBy("event_type").agg(count(lit(1)).as("n_new_pairs"))
        .writeStream.outputMode(OutputMode.Complete()).format("memory")
        .queryName(runName).option("checkpointLocation", ckpt).start()
      val q1 = start("ckpt_q99_run1")
      try q1.processAllAvailable() finally q1.stop()
      h2.write.mode("append").parquet(inDir)
      val q2 = start("ckpt_q99_run2")
      val run2Rows = try {
        q2.processAllAvailable()
        q2.recentProgress.map(_.numInputRows).sum
      } finally q2.stop()
      assert(run2Rows <= h2.count(),
        s"restart reprocessed old files: read $run2Rows rows, half2 has ${h2.count()}")
      val ev = Tables.load(spark, sfDir, "events")
      val want = ev.filter(col("ts") >= to_timestamp(lit(cutoff)))
        .select("user_id", "event_type").distinct()
        .join(history, Seq("user_id", "event_type"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n_new_pairs"))
      val got = spark.table("ckpt_q99_run2")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "recovered dedup state + new files must equal the batch anti-join over all events")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dropDuplicatesWithinWatermark recovers its seen-key state from " +
      "the checkpoint after a kill") {
    // The state that must survive: the watermark-scoped seen-key set. A
    // (user, type) pair first seen in half 1 that reappears in half 2
    // double-counts if the restart loses it. Watermark longer than the
    // table's span so no key legitimately expires mid-test (expiry is
    // pinned separately above); equality with exact batch distinct is
    // then exact, not a bound.
    val (base, h1, h2) = splitEventsDir()
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt_ddw"
    val schema = h1.schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def start(runName: String) = spark.readStream.schema(schema).parquet(inDir)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "90 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .groupBy("event_type").agg(count(lit(1)).as("n_users"))
        .writeStream.outputMode(OutputMode.Complete()).format("memory")
        .queryName(runName).option("checkpointLocation", ckpt).start()
      val q1 = start("ckpt_ddw_run1")
      try q1.processAllAvailable() finally q1.stop()
      h2.write.mode("append").parquet(inDir)
      val q2 = start("ckpt_ddw_run2")
      val run2Rows = try {
        q2.processAllAvailable()
        q2.recentProgress.map(_.numInputRows).sum
      } finally q2.stop()
      assert(run2Rows <= h2.count(),
        s"restart reprocessed old files: read $run2Rows rows, half2 has ${h2.count()}")
      val want = Tables.load(spark, sfDir, "events")
        .select("user_id", "event_type").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_users"))
      val got = spark.table("ckpt_ddw_run2")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "recovered seen-key state + new files must equal batch distinct " +
          "over all events")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("streaming upsert view recovers per-key last-write state from " +
      "the checkpoint after a kill") {
    // The state that must survive: one max(struct) row per key. Keys
    // whose latest event is in half 1 and silent in half 2 can only
    // appear in run 2's Complete-mode output FROM recovered state; keys
    // updated in half 2 must compare against the recovered candidate,
    // not start fresh.
    val (base, h1, h2) = splitEventsDir()
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt_upsert"
    val schema = h1.schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def start(runName: String) = spark.readStream.schema(schema).parquet(inDir)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .writeStream.outputMode(OutputMode.Complete()).format("memory")
        .queryName(runName).option("checkpointLocation", ckpt).start()
      val q1 = start("ckpt_upsert_run1")
      try q1.processAllAvailable() finally q1.stop()
      h2.write.mode("append").parquet(inDir)
      val q2 = start("ckpt_upsert_run2")
      val run2Rows = try {
        q2.processAllAvailable()
        q2.recentProgress.map(_.numInputRows).sum
      } finally q2.stop()
      assert(run2Rows <= h2.count(),
        s"restart reprocessed old files: read $run2Rows rows, half2 has ${h2.count()}")
      val want = Tables.load(spark, sfDir, "events")
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("last_event_id"),
          col("m.value").as("last_value"))
      val got = spark.table("ckpt_upsert_run2")
        .select(col("user_id"), col("m.event_id").as("last_event_id"),
          col("m.value").as("last_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "recovered per-key state + new files must equal the batch " +
          "last-write-wins view over all events")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("stateful sessionization resumes from the checkpoint and matches the batch oracle") {
    val (base, h1, h2) = splitEventsDir()
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt_sess"
    val schema = h1.schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // The memory sink refuses checkpoint recovery in append mode (it
      // cannot restore its table), so the changelog lands in a
      // foreachBatch collector — recovery-capable, like the real
      // parquet/Kafka sinks this stands in for.
      val collected = new scala.collection.mutable.ArrayBuffer[EventStreams.SessionSummary]()
      def start() = {
        // Watermark delay longer than the table's whole time span: no
        // key expires mid-test, so every user's state MUST survive the
        // restart for the totals to come out right (with a short delay
        // the event-time timeout would correctly free idle users'
        // state between the runs and the changelog would restart from
        // fresh segments — that expiry path is pinned separately by
        // the timeout test above; this test isolates recovery).
        val ds = spark.readStream.schema(schema).parquet(inDir)
          .withWatermark("ts", "90 days")
          .select(col("user_id"), col("ts"))
          .as[EventStreams.Ev]
        EventStreams.sessionSummaries(ds)
          .writeStream.outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.SessionSummary], _: Long) =>
            val rows = batch.collect()
            collected.synchronized { collected ++= rows }; ()
          }
          .start()
      }
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val n1 = collected.synchronized(collected.size)
      h2.write.mode("append").parquet(inDir)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      // Direct recovery witness: every run-2 summary already includes
      // the user's run-1 events — counts a fresh (state-lost) restart
      // could not produce.
      val totals = Tables.load(spark, sfDir, "events")
        .groupBy("user_id").count().as[(Long, Long)].collect().toMap
      val run2 = collected.synchronized(collected.drop(n1).toList)
      assert(run2.nonEmpty && run2.forall(s => s.n_events == totals(s.user_id)),
        "run-2 summaries must carry recovered run-1 state, not restart from zero")
      // Append-mode changelog: the latest summary per user wins; n_events
      // grows monotonically, so max(n_events) picks it without needing a
      // batch id. Users silent in run 2 keep their run-1 row.
      val latest = collected.toSeq.toDF()
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_sessions"),
          col("max_session_events"))).as("s"))
        .select(col("user_id"), col("s.n_sessions"), col("s.n_events"),
          col("s.max_session_events"))
      // Batch oracle: the q34 lag-based sessionization over ALL events.
      val want = graft.queries.EventQueries.queries("q34_sessionize")(spark, sfDir)
        .select("user_id", "n_sessions", "n_events", "max_session_events")
      assert(latest.exceptAll(want).isEmpty && want.exceptAll(latest).isEmpty,
        "resumed sessionization changelog must equal the batch sessionize answer")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("distinct monitor: silent on honest sketches, fires on corruption and missing windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // End-to-end on the real feed: the sketch must sit inside its band.
    assert(EventStreams.streamingDistinctMonitor(spark, sfDir).count() === 0,
      "monitor fired on an honest HLL estimate")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val exact = Seq((t0, "click", 100L), (t1, "click", 50L))
      .toDF("window_start", "event_type", "exact_users")
    // Corrupted estimate (40% off, past both bands) plus a window the
    // estimator dropped: both must surface through the FULL join
    // referee.
    val est = Seq((t0, "click", 140L))
      .toDF("window_start", "event_type", "est_users")
    val v = EventStreams.distinctMonitorReferee(est, exact, bound = 0.15,
        absSlack = 5L)
      .select("window_start", "event_type").as[(java.sql.Timestamp, String)]
      .collect().toSeq
    assert(v === Seq((t0, "click"), (t1, "click")),
      s"referee missed a violation: $v")
  }

  test("heavy-hitters monitor: silent on honest summaries, fires on every corruption kind") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // End-to-end on the real feed: the MG contract must hold after the
    // state-store merge path (q155's driver gate, run in-spec).
    assert(EventStreams.streamingHeavyHittersMonitor(spark, sfDir).count() === 0,
      "monitor fired on an honest Misra-Gries summary")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val exact = Seq((t0, "u1", 100L), (t0, "u2", 40L), (t0, "u3", 3L),
        (t1, "u1", 50L))
      .toDF("window_start", "user_key", "exact_cnt")
    // err=5 for t0. Four corruptions: u1 overcounted (105>100), u2
    // undercounted past err (30 < 40-5), u3 heavy-and-missing is NOT a
    // violation (3 <= err) but u9 is spurious (never in the data), and
    // window t1 has no summary at all.
    val est = Seq((t0, "u1", 105L, 5L), (t0, "u2", 30L, 5L),
        (t0, "u9", 2L, 5L))
      .toDF("window_start", "user_key", "est_cnt", "err")
    val v = EventStreams.heavyHittersReferee(est, exact)
      .select("kind", "user_key").as[(String, Option[String])].collect().toSet
    assert(v === Set(("overcount", Some("u1")), ("undercount", Some("u2")),
        ("overcount", Some("u9")), ("window_missing", Some("u1"))),
      s"referee verdicts wrong: $v")
  }

  test("SQL surface: graft functions registered by GraftExtensions") {
    GraftSession.tune(spark)
    val row = spark.sql(
      """SELECT round(cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  size(shingle_hash_set('a b c d', 3)) AS s,
        |  size(minhash_signature(shingle_hash_set('a b c d', 3), 16)) AS m,
        |  simhash64(shingle_hash_set('a b c d', 3)) AS sh,
        |  rolling_fingerprint('hello') AS fp,
        |  byte_mean(cast('ab' as binary)) AS bm,
        |  argtopk_cosine(array(1.0d, 0.1d),
        |    array(array(0.0d, 1.0d), array(1.0d, 0.0d)), 1) AS at""".stripMargin).head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 0.5)
    assert(row.getInt(2) === 2)
    assert(row.getInt(3) === 16)
    val expectedFp = "hello".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    assert(row.getLong(5) === expectedFp)
    assert(row.getDouble(6) === ('a'.toInt + 'b'.toInt) / 2.0)
    assert(row.getSeq[Long](7) === Seq(1L)) // nearest centroid is (1,0)
  }
}
