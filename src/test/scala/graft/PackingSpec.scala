package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Greedy sequence-packing semantics: deterministic bin assignment,
  * budget respected except for single-oversize-document bins, state
  * reset at group boundaries sharing a partition.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked greedy packing with overflow, oversize doc, and group reset") {
    val d = Seq(
      ("g", 1L, 4L), ("g", 2L, 5L), ("g", 3L, 2L), ("g", 4L, 10L), ("g", 5L, 11L),
      ("h", 6L, 3L)
    ).toDF("grp", "id", "n")
    val out = Packing.packGreedy(d, "grp", "id", "n", budget = 10L)
      .orderBy("grp", "id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("g", 1L, 4L, 1L),  // fill 4
      ("g", 2L, 5L, 1L),  // fill 9
      ("g", 3L, 2L, 2L),  // 9+2 > 10 → new bin
      ("g", 4L, 10L, 3L), // 2+10 > 10 → new bin, exactly at budget
      ("g", 5L, 11L, 4L), // oversize doc gets its own bin
      ("h", 6L, 3L, 1L))) // group boundary resets the counter
  }

  test("contextWindows: hand-checked offsets, boundary straddle, exact fit, " +
      "zero-token rows, bin-size invariance") {
    val d = Seq((1L, 3L), (2L, 5L), (3L, 0L), (4L, 8L), (5L, 4L))
      .toDF("id", "n")
    // stream: [0,3) [3,8) — [8,16) [16,20); windows of 8
    val out = Packing.contextWindows(d, "id", "n", windowTokens = 8,
        binSize = 2)
      .select("id", "start_tok", "first_window", "last_window", "n_windows")
      .orderBy("id")
      .as[(Long, Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, Some(0L), Some(0L), 1L),   // [0,3) in window 0
      (2L, 3L, Some(0L), Some(0L), 1L),   // [3,8) ends AT the boundary
      (3L, 8L, None, None, 0L),           // zero tokens: no window
      (4L, 8L, Some(1L), Some(1L), 1L),   // [8,16) fills window 1 exactly
      (5L, 16L, Some(2L), Some(2L), 1L))) // [16,20) partial last window
    // a doc straddling a boundary spans both windows
    val straddle = Packing.contextWindows(
        Seq((1L, 6L), (2L, 6L)).toDF("id", "n"), "id", "n",
        windowTokens = 8, binSize = 1)
      .select("id", "n_windows").orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(straddle === Seq((1L, 1L), (2L, 2L))) // [6,12) crosses 8
    // bin size must not change the answer (pure parallelism knob)
    val a = Packing.contextWindows(d, "id", "n", 8, binSize = 1)
    val b = Packing.contextWindows(d, "id", "n", 8, binSize = 1000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("packing invariants on real documents: budget respected, seq_nos contiguous") {
    val budget = 256L
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
    val packed = Packing.packGreedy(d, "lang", "doc_id", "n_tokens", budget)
    val bins = packed.groupBy("lang", "seq_no")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val fill = r.getAs[Long]("fill"); val n = r.getAs[Long]("n_docs")
      assert(fill <= budget || n == 1L,
        s"bin over budget with multiple docs: $r")
    }
    // seq_no is 1..max with no gaps per language
    packed.groupBy("lang")
      .agg(min("seq_no").as("lo"), max("seq_no").as("hi"),
        countDistinct("seq_no").as("d"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") === 1L)
        assert(r.getAs[Long]("d") === r.getAs[Long]("hi"))
      }
    // every doc appears exactly once
    assert(packed.count() === d.count())
  }

  test("tokenBudgetCap: boundary semantics and bin-size invariance") {
    val d = Seq(
      ("g", 1L, 900L), ("g", 2L, 1100L), // cum 2000 == budget: kept
      ("g", 3L, 1L),                     // cum 2001: dropped, forever
      ("g", 4L, 5L),                     // still over: dropped
      ("h", 5L, 2000L), ("h", 6L, 1L)    // exact-budget first row; next drops
    ).toDF("grp", "id", "n")
    val exp = Set(("g", 1L, 900L, 900L), ("g", 2L, 1100L, 2000L),
      ("h", 5L, 2000L, 2000L))
    // binSize 2 splits groups across bins (exercising the offset path);
    // a huge binSize degenerates to one bin per group — results identical.
    Seq(2L, 1L << 20).foreach { bs =>
      val got = Packing.tokenBudgetCap(d, "grp", "id", "n",
          budget = 2000, binSize = bs)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === exp, s"binSize $bs")
    }
  }

  test("tokenBudgetCap keeps NULL groups as their own partition (window parity)") {
    // The single-window formulation (PARTITION BY group) treats NULLs as
    // one partition with its own budget — the bin join must not silently
    // drop them (SQL equi-join semantics would), so it is null-safe.
    val d = Seq(
      (Option("g"), 1L, 600L), (Option("g"), 2L, 600L),
      (Option.empty[String], 3L, 700L), (Option.empty[String], 4L, 200L),
      (Option.empty[String], 5L, 300L) // NULL-group cum 1200 > 1000: dropped
    ).toDF("grp", "id", "n")
    val got = Packing.tokenBudgetCap(d, "grp", "id", "n",
        budget = 1000, binSize = 2)
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got === Set(
      (Some("g"), 1L, 600L, 600L),
      (None, 3L, 700L, 700L), (None, 4L, 200L, 900L)))
  }

  test("tokenBudgetCap bins exactly past 2^53 (no double-division collapse)") {
    // Longs past 2^53 collapse 256-wide under a long→double cast: the
    // old floor(o / binSize) binning degraded there. Integer alignment
    // must keep bins exact — verify against a Scala reference cumsum.
    val base = 1L << 60
    val d = (0 until 40).map(i => ("g", base + i, (i % 7 + 1).toLong))
      .toDF("grp", "id", "n")
    var cum = 0L
    val exp = (0 until 40).flatMap { i =>
      cum += i % 7 + 1
      if (cum <= 60) Some(("g", base + i, (i % 7 + 1).toLong, cum)) else None
    }.toSet
    val got = Packing.tokenBudgetCap(d, "grp", "id", "n",
        budget = 60, binSize = 4)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === exp)
  }

  test("tokenBudgetCap skew census: a dominant (group, bin) cell fires the bound") {
    // Duplicate-heavy orderCol: bins bound distinct VALUES, not rows, so
    // one hot cell serializes through one window task — the census
    // predicate behind the warn must flag exactly that cell, and the
    // result must still be correct (the bound logs, never drops).
    val d = ((1 to 100).map(i => ("g", 5L, 1L)) :+ (("g", 6L, 1L)) :+ (("h", 5L, 1L)))
      .toDF("grp", "id", "n")
    val binStats = d.withColumn("__bin", col("id") - pmod(col("id"), lit(4L)))
      .groupBy(col("grp"), col("__bin"))
      .agg(sum("n").as("__bin_sum"), count(lit(1)).as("__bin_rows"))
    val over = Packing.oversizedBins(binStats.collect(), maxBinRows = 50)
    assert(over.size === 1 && over.head.contains("group=g")
      && over.head.contains("rows=101"), over.mkString("; "))
    // under the bound: nothing flagged
    assert(Packing.oversizedBins(binStats.collect(), maxBinRows = 200).isEmpty)
    // and the capped output is unaffected by the skew
    val got = Packing.tokenBudgetCap(d, "grp", "id", "n",
      budget = 50, binSize = 4, maxBinRows = 50)
    assert(got.count() === 51) // 50 of the g-dups + the single h row
  }

  test("shardShuffle: exact permutation, dense per-shard positions, seed-sensitive") {
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val out = Packing.shardShuffle(d, "doc_id", nShards = 8, seed = 7L)
      .as[(Long, Long, Long)].collect().toSeq
    // permutation: every doc exactly once
    assert(out.map(_._1).sorted === d.as[Long].collect().sorted.toSeq)
    // dense 1..|shard| positions within each shard
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size), s"shard $shard")
    }
    // deterministic: a re-run is identical
    val again = Packing.shardShuffle(d, "doc_id", nShards = 8, seed = 7L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet === again.toSet)
    // a different seed is a different permutation (shard or pos moves)
    val reseeded = Packing.shardShuffle(d, "doc_id", nShards = 8, seed = 8L)
      .as[(Long, Long, Long)].collect().toSet
    assert(reseeded !== out.toSet)
    // shard assignment depends only on (id, seed): appending documents
    // never moves existing ones across shards
    val appended = Packing.shardShuffle(
        d.unionAll(Seq(1000001L, 1000002L).toDF("doc_id")),
        "doc_id", nShards = 8, seed = 7L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    out.foreach { case (id, shard, _) => assert(appended(id) === shard) }
  }

  test("tokenBudgetCap equals the single-window formulation on real documents") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= 2000)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    val got = Packing.tokenBudgetCap(d, "lang", "doc_id", "n_tokens",
        budget = 2000, binSize = 37)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === ref && got.nonEmpty)
  }

  test("temperatureMix: exact sqrt-apportioned budgets and per-group cap") {
    // totals: a=400, b=100, c=1 → w = 20, 10, 1; W = 31.
    // budgets at totalBudget=310: a=200, b=100, c=10 (exact division).
    val d = Seq(
      ("a", 1L, 150L), ("a", 2L, 50L), ("a", 3L, 100L), ("a", 4L, 100L),
      ("b", 5L, 60L), ("b", 6L, 40L), ("b", 7L, 1L),
      ("c", 8L, 1L)
    ).toDF("grp", "id", "n")
    val out = Packing.temperatureMix(d, "grp", "id", "n",
        totalBudget = 310, binSize = 2)
      .select("grp", "id", "n", "cum_tokens", "grp_budget")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("a", 1L, 150L, 150L, 200L), ("a", 2L, 50L, 200L, 200L),
      // a's cum 300 > 200 → ids 3,4 dropped
      ("b", 5L, 60L, 60L, 100L), ("b", 6L, 40L, 100L, 100L),
      // b's cum 101 > 100 → id 7 dropped
      ("c", 8L, 1L, 1L, 10L)))
  }

  test("temperatureMix flattens the head: 4x the tokens gets only 2x the budget") {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
    val totals = d.groupBy("lang").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val budgets = Packing.temperatureMix(d, "lang", "doc_id", "n_tokens",
        totalBudget = 8000, binSize = 100)
      .select("lang", "grp_budget").distinct()
      .as[(String, Long)].collect().toMap
    // law: budget_g == totalBudget * floor(sqrt(t_g)) / sum(floor(sqrt))
    val w = totals.view.mapValues(t => math.floor(math.sqrt(t.toDouble)).toLong).toMap
    val wSum = w.values.sum
    budgets.foreach { case (g, b) =>
      assert(b === BigInt(8000) * w(g) / wSum, s"lang $g")
    }
    // en holds ~3x the others' tokens; its budget share must sit strictly
    // between its sqrt share (flattened) and its natural share
    val en = totals("en").toDouble / totals.values.sum
    val enB = budgets("en").toDouble / budgets.values.sum
    assert(enB < en, s"en budget share $enB should be flattened below natural $en")
    // binSize invariance (the offset path exercised vs degenerate bins)
    val big = Packing.temperatureMix(d, "lang", "doc_id", "n_tokens",
        totalBudget = 8000, binSize = 1L << 20)
      .select("doc_id", "cum_tokens", "grp_budget")
      .as[(Long, Long, Long)].collect().toSet
    val fine = Packing.temperatureMix(d, "lang", "doc_id", "n_tokens",
        totalBudget = 8000, binSize = 7)
      .select("doc_id", "cum_tokens", "grp_budget")
      .as[(Long, Long, Long)].collect().toSet
    assert(big === fine && big.nonEmpty)
  }

  test("proportionalInterleave equals a Scala reference merge and bounds prefix drift") {
    val d = Tables.load(spark, sfDir, "documents").select($"lang", $"doc_id")
    val all = d.as[(String, Long)].collect()
    val n = all.length
    val got = Packing.proportionalInterleave(d, "lang", "doc_id",
        take = n, binSize = 100)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // reference: stride keys (2k-1)/w, merged by (key, lang)
    val byLang = all.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ref = byLang.toSeq.flatMap { case (g, ids) =>
      val w = ids.length.toLong
      ids.zipWithIndex.map { case (id, i) =>
        ((2L * (i + 1) - 1).toDouble / w, g, id, (i + 1).toLong, w)
      }
    }.sortBy(r => (r._1, r._2))
      .zipWithIndex.map { case ((_, g, id, k, w), i) => (i + 1L, g, id, k, w) }
    assert(got === ref)
    // stride law: every prefix holds each group within ~1 slot of its share
    val counts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    got.foreach { case (ord, g, _, _, w) =>
      counts(g) += 1
      val expect = ord.toDouble * w / n
      assert(math.abs(counts(g) - expect) <= 1.0 + 1e-9,
        s"prefix $ord: group $g has ${counts(g)}, expected ~$expect")
    }
  }

  test("resumeSlice: prefix + suffix partition the epoch; hand-checked step rule") {
    val d = Tables.load(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("n_chars").isNotNull)
      .select("doc_id", "n_chars")
    val full = Packing.resumeSlice(d, "doc_id", "n_chars",
      batchTokens = 2000L, fromStep = 0L)
    assert(full.count() === d.count(),
      "resume from step 0 must be the whole epoch")
    // a resume slice is EXACTLY the full run filtered to step >= k —
    // same rows, same cum_before, same step (bit-identical suffix)
    val k = 5L
    val sliced = Packing.resumeSlice(d, "doc_id", "n_chars",
      batchTokens = 2000L, fromStep = k)
    val expect = full.filter(org.apache.spark.sql.functions.col("step") >= k)
    assert(sliced.exceptAll(expect).count() === 0L &&
      expect.exceptAll(sliced).count() === 0L,
      "resume slice diverged from the uninterrupted run's suffix")
    assert(sliced.count() > 0 && sliced.count() < full.count(),
      "fixture bug: the resume point fell outside the epoch")
    // hand rule: steps are cum_before div batchTokens (a straddling doc
    // belongs to the step where it STARTS), monotone in the epoch order
    val rows = full.select("pos", "cum_before", "step")
      .orderBy("pos").collect()
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) / 2000L, s"step rule broken at $r")
    }
    assert(rows.sliding(2).forall {
      case Array(a, b) => a.getLong(2) <= b.getLong(2); case _ => true },
      "steps must be non-decreasing in epoch order")
  }
}
