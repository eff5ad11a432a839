package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** The equi-height histogram's contract is "indistinguishable from the
  * single-window row_number formulation" — pinned here against a literal
  * single-window reference, across bin sizes (including the degenerate
  * one-bin case) and on a negative-value fixture where the truncation
  * binning is easiest to get wrong.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def reference(buckets: Int) = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.orderBy(col("v"), col("id"))
    val n = o.count()
    o.select(col("o_totalprice").cast("double").as("v"),
        col("o_orderkey").as("id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("bucket", expr(s"(rk - 1) * ${buckets.toLong} div $n") + lit(1L))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("min_v"),
        max("v").as("max_v"), round(avg("v"), 6).as("avg_v"))
      .orderBy("bucket")
      .collect().toSeq
  }

  test("equiHeightHistogram ≡ the single-window formulation on sf0.001 orders") {
    val o = Tables.load(spark, sfDir, "orders")
    val ref = reference(16)
    for (binSize <- Seq(1000L, 10000L, 10000000L)) {
      val got = Profile.equiHeightHistogram(o, "o_totalprice", "o_orderkey",
          buckets = 16, binSize = binSize)
        .orderBy("bucket").collect().toSeq
      assert(got === ref, s"binSize=$binSize diverges from the single window")
    }
  }

  test("negative values: truncation bins stay monotone, rank matches a local sort") {
    val df = Seq((-12.5, 1L), (-12.5, 2L), (-0.4, 3L), (-1.0, 4L),
      (0.3, 5L), (7.9, 6L), (120.0, 7L), (-130.7, 8L))
      .toDF("v", "id")
    val got = Profile.equiHeightHistogram(df, "v", "id", buckets = 4, binSize = 10)
      .orderBy("bucket")
      .select("bucket", "n_rows", "min_v", "max_v")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // 8 rows into 4 buckets of 2, in (v, id) order:
    // (-130.7) (-12.5,id1) | (-12.5,id2) (-1.0) | (-0.4) (0.3) | (7.9) (120.0)
    assert(got === Seq(
      (1L, 2L, -130.7, -12.5), (2L, 2L, -12.5, -1.0),
      (3L, 2L, -0.4, 0.3), (4L, 2L, 7.9, 120.0)))
  }

  test("equiHeightBuckets with binScale ≡ single-window deciles on a [0,1] domain") {
    import org.apache.spark.sql.expressions.Window
    // Sub-integer scores: without binScale everything lands in bin 0;
    // the scale must spread them WITHOUT changing the bucketing.
    val df = (1 to 500).map(i => (i.toLong, (i % 97) / 97.0)).toDF("id", "score")
    val got = Profile.equiHeightBuckets(df, "score", "id", buckets = 10,
        binSize = 1, binScale = 1000.0)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("score"), col("id"))
    val ref = df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("bucket", expr("(rk - 1) * 10 div 500") + lit(1L))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === ref)
    // And the scale genuinely spread the bins (no one-task funnel).
    val bins = df.select(((col("score") * 1000).cast("long") -
      pmod((col("score") * 1000).cast("long"), lit(1L))).as("b"))
      .distinct().count()
    assert(bins > 10, s"binScale produced only $bins bins")
  }

  test("maxBins guard throws loudly instead of collecting an unbounded bin table") {
    val o = Tables.load(spark, sfDir, "orders")
    val e = intercept[IllegalArgumentException] {
      Profile.equiHeightHistogram(o, "o_totalprice", "o_orderkey",
        buckets = 4, binSize = 1, maxBins = 10)
    }
    assert(e.getMessage.contains("maxBins") || e.getMessage.contains("10"))
  }

  test("exactRank ≡ the single-window rank on a duplicate-heavy (df, term) domain") {
    import org.apache.spark.sql.expressions.Window
    // The document-frequency shape: a long Zipf tail where hundreds of
    // terms share the same tiny value, so the rank is decided by the
    // string tie-break — the regime where value-aligned bins alone
    // would collapse and the composite (value, prefix) bin must not.
    val df = ((1 to 500).map(i => (f"term_$i%03d", (500 / i).toLong)) :+
      ("" -> 3L) :+ ("zz" -> 3L)).toDF("term", "df")
    val ref = df.withColumn("rank",
        row_number().over(Window.orderBy(col("df").asc, col("term").asc))
          .cast("long"))
      .orderBy("rank").collect().toSeq
    for (prefixLen <- Seq(1, 2, 8)) {
      val got = Profile.exactRank(df, "df", "term", "rank",
          tiePrefixLen = prefixLen)
        .orderBy("rank").collect().toSeq
      assert(got === ref, s"tiePrefixLen=$prefixLen diverges from the single window")
    }
  }

  test("censusQuantiles ≡ percentile() across ps, incl. endpoints and a 1-row group") {
    import org.apache.spark.sql.Row
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_type", $"value")
      // a singleton group: every quantile must be its lone value
      .union(Seq(("solo", 42.5)).toDF("event_type", "value"))
    val want = ev.groupBy("event_type")
      .agg(percentile($"value", typedLit(ps)).as("qs"))
      .select($"event_type", posexplode($"qs"))
      .select($"event_type", lit(1), $"pos", $"col")
      .collect().map(r => (r.getString(0), ps(r.getInt(2))) -> r.getDouble(3))
      .toMap
    val got = Profile.censusQuantiles(ev, "event_type", "value", ps)
      .collect().map { case Row(g: String, p: Double, q: Double) => (g, p) -> q }
      .toMap
    assert(got.keySet === want.keySet)
    // Same type-7 order statistics; censusQuantiles interpolates as
    // lo + frac·(hi−lo) — DuckDB's quantile_cont form, which the q156
    // oracle needs bit-for-bit — while Spark's percentile uses the
    // symmetric (hi−t)·lo + (t−lo)·hi, so the two agree only to the
    // last ulp. Relative 1e-12 pins everything but that ulp.
    got.foreach { case (k, v) =>
      val w = want(k)
      assert(math.abs(v - w) <= 1e-12 * math.max(1.0, math.abs(w)),
        s"$k: census $v vs percentile $w")
    }
  }

  test("iqrOutliers: every returned row is outside its group fences, none missed") {
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_type", $"event_id", $"value")
    val out = Profile.iqrOutliers(ev, "event_type", "value")
    assert(out.count() > 0, "fixture should contain Tukey outliers")
    // Fences joined back: flagged ⟺ outside, checked row-by-row.
    val fences = out.select($"event_type", $"lo", $"hi").distinct()
    assert(out.filter($"value" >= $"lo" && $"value" <= $"hi").count() === 0)
    val missed = ev.join(fences, Seq("event_type"))
      .filter($"value" < $"lo" || $"value" > $"hi")
      .join(out.select("event_type", "event_id"),
        Seq("event_type", "event_id"), "left_anti")
    assert(missed.count() === 0, "rows outside the fences were not flagged")
  }

  test("bootstrapMeanCiMilli: brackets the point mean, deterministic, exact on a hand group") {
    val d = Tables.load(spark, sfDir, "documents")
      .filter(col("n_chars").isNotNull)
    val ci = Profile.bootstrapMeanCiMilli(d, "doc_id", "source", "n_chars")
    val point = d.groupBy(col("source"))
      .agg(expr("(1000 * sum(n_chars)) div count(1)").as("pm"))
    val joined = ci.join(point, "source").collect()
    assert(joined.length === 20)
    // a 93.75% CI (rank 2 / 63 of 64) should bracket the point mean on
    // every source at this corpus size — a few slips would mean the
    // weights aren't Poisson-like at all
    val inside = joined.count { r =>
      val (lo, hi, pm) = (r.getAs[Long]("lo_milli"),
        r.getAs[Long]("hi_milli"), r.getAs[Long]("pm"))
      lo <= pm && pm <= hi && lo <= hi
    }
    assert(inside >= 18, s"only $inside/20 CIs bracket the point mean")
    // derandomized: a second run is bit-identical
    val again = Profile.bootstrapMeanCiMilli(d, "doc_id", "source",
      "n_chars").collect().map(_.toString).sorted.toSeq
    assert(again === ci.collect().map(_.toString).sorted.toSeq)
    // hand law: a constant-valued group has every replicate mean equal
    // to the constant (weights cancel), so lo = hi = 1000 * c
    val const = Seq((1L, "g", 7L), (2L, "g", 7L), (3L, "g", 7L),
      (4L, "g", 7L)).toDF("doc_id", "source", "n_chars")
    val cc = Profile.bootstrapMeanCiMilli(const, "doc_id", "source",
      "n_chars").collect().head
    assert(cc.getAs[Long]("lo_milli") === 7000L &&
      cc.getAs[Long]("hi_milli") === 7000L)
  }

  test("datasetDigest: partition-invariant, row-sensitive, additive merge law") {
    val key = concat_ws("|", col("doc_id"), coalesce(col("text"), lit("?")))
    val d = Tables.load(spark, sfDir, "documents")
    val one = Profile.datasetDigest(d, "source", key)
      .collect().map(_.toString).sorted.toSeq
    assert(Profile.datasetDigest(d.repartition(13), "source", key)
      .collect().map(_.toString).sorted.toSeq === one,
      "digest must not depend on partitioning or row order")
    // flipping ONE row's content must change its source's digest
    val tweaked = Profile.datasetDigest(
      d.withColumn("text",
        when(col("doc_id") === 3L, lit("DRIFTED")).otherwise(col("text"))),
      "source", key).collect().map(_.toString).sorted.toSeq
    assert(tweaked !== one, "a single-row flip left every digest unchanged")
    // additive law: disjoint halves merge to the whole, counts and all
    val a = Profile.datasetDigest(d.filter(col("doc_id") % 2 === 0),
      "source", key)
    val b = Profile.datasetDigest(d.filter(col("doc_id") % 2 =!= 0),
      "source", key)
    assert(Profile.mergeDigests(a, b, "source")
      .collect().map(_.toString).sorted.toSeq === one,
      "merge of disjoint halves diverged from the from-scratch digest")
  }

  test("weightedCensusQuantiles: hand fixture, unit-weight reduction, p=0 edge") {
    import spark.implicits._
    // one heavy value: W = 10, half the mass sits AT v=4
    val d = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 7L))
      .toDF("grp", "v", "w")
    val q = graft.operators.Profile
      .weightedCensusQuantiles(d, "grp", "v", "w",
        Seq(0L, 100000L, 500000L, 1000000L))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(q(0L) === 1L, "p=0 must be the minimum value")
    assert(q(100000L) === 1L, "cum(1)=1 >= 0.1*10")
    assert(q(500000L) === 4L, "the weighted median must jump to the heavy value")
    assert(q(1000000L) === 4L, "p=1 must be the maximum value")
    // unit weights reduce to the classic lower (type-1) quantile
    val u = (10L to 19L).map(v => ("g", v, 1L)).toDF("grp", "v", "w")
    val med = graft.operators.Profile
      .weightedCensusQuantiles(u, "grp", "v", "w", Seq(500000L))
      .collect().head.getLong(2)
    assert(med === 14L, "unit-weight p=.5 over 10..19 is the 5th value")
  }

  test("dpCountRelease: ladder well-formed, release deterministic and " +
      "clamped; epsilonLedger admits exactly to the budget line") {
    import spark.implicits._
    val ladder = graft.operators.Profile.dpNoiseLadderPpm(500L)
    assert(ladder.map(_._1) === ladder.map(_._1).sorted,
      "CDF thresholds must be non-decreasing")
    assert(ladder.last._1 === 1000000L && ladder.last._2 === 15)
    assert(ladder.map(_._2) === (-15 to 15))
    // symmetric mechanism: P(k<=−1) ≈ P(k>=1) on the ppm grid
    val pNeg = ladder(14)._1 // cum through k=-1
    val p0 = ladder(15)._1 // cum through k=0
    assert(math.abs(pNeg - (1000000L - p0)) <= 1,
      s"asymmetric ladder: $pNeg vs ${1000000L - p0}")
    val d = (1L to 100L).map(i => i % 7).toDF("cohort")
    val r1 = graft.operators.Profile.dpCountRelease(d, "cohort", 500L)
      .orderBy("cohort").collect().toSeq
    val r2 = graft.operators.Profile.dpCountRelease(d, "cohort", 500L)
      .orderBy("cohort").collect().toSeq
    assert(r1 === r2, "seeded release must be deterministic")
    assert(r1.forall(_.getLong(1) >= 0L), "released counts must clamp at 0")
    val led = Seq(200L, 300L, 400L).toDF("eps_milli")
    assert(graft.operators.Profile.epsilonLedger(led, 500L, 1400L)
      .collect().head.getBoolean(1), "900+500 <= 1400 must admit")
    assert(!graft.operators.Profile.epsilonLedger(led, 500L, 1399L)
      .collect().head.getBoolean(1), "900+500 > 1399 must refuse")
  }
}
