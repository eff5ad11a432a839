package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Hand-computable contracts for the temporal joins: as-of match
  * selection (latest at-or-before, strict mode, deterministic
  * tie-break, unmatched-null), and range-join equivalence with the
  * brute-force inequality join including bin-boundary and empty-interval
  * edges the binned rewrite could plausibly get wrong.
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // Probe: (id, key, t) — numeric times via timestamps at whole seconds.
  private def ts(s: Long) = timestamp_seconds(lit(s))
  private def probeDf = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
    (4L, "b", 300L), (5L, "c", 10L)
  ).toDF("id", "k", "sec").select(col("id"), col("k"), timestamp_seconds(col("sec")).as("t"))
  // Build: (k, t, bid, v) — two equal-time rows for key a at t=200.
  private def buildDf = Seq(
    ("a", 90L, 11L, 1.0), ("a", 200L, 12L, 2.0), ("a", 200L, 13L, 3.0),
    ("b", 300L, 14L, 4.0), ("b", 301L, 15L, 5.0)
  ).toDF("k", "sec", "bid", "v").select(col("k"), timestamp_seconds(col("sec")).as("t"),
    col("bid"), col("v"))

  test("asofBackward: latest at-or-before per key, greatest-tiebreak ties, null when unmatched") {
    val out = TemporalJoins.asofBackward(probeDf, buildDf,
        keyCols = Seq("k"), leftTime = "t", rightTime = "t",
        rightCols = Seq("bid", "v"), rightTiebreak = "bid")
      .select("id", "bid").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // id1 t=100 → bid 11 (90); id2 t=205 → equal-time pair at 200 broken
    // by greatest bid = 13; id3 t=50 → none; id4 t=300 → bid 14 (equal
    // time IS visible, backward join is <=); id5 key c → none.
    assert(out === Array((1L, 11L), (2L, 13L), (3L, -1L), (4L, 14L), (5L, -1L)))
  }

  test("asofBackward strict: equal-time build rows are invisible") {
    val out = TemporalJoins.asofBackward(probeDf, buildDf,
        keyCols = Seq("k"), leftTime = "t", rightTime = "t",
        rightCols = Seq("bid"), rightTiebreak = "bid", strict = true)
      .select("id", "bid").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // id4 t=300: the t=300 build row no longer matches → null.
    assert(out === Array((1L, 11L), (2L, 13L), (3L, -1L), (4L, -1L), (5L, -1L)))
  }

  test("asofBackward keeps every left column and row (left-outer)") {
    val out = TemporalJoins.asofBackward(probeDf, buildDf,
      keyCols = Seq("k"), leftTime = "t", rightTime = "t",
      rightCols = Seq("bid", "v"), rightTiebreak = "bid")
    assert(out.columns.toSeq === Seq("id", "k", "t", "bid", "v"))
    assert(out.count() === probeDf.count())
  }

  test("pointInInterval equals the brute-force inequality join, incl. bin edges") {
    // Bin width 100s; intervals deliberately straddle bin boundaries,
    // sit exactly on them, and include an empty (end <= start) interval.
    val points = Seq(("a", 1L, 0L), ("a", 2L, 99L), ("a", 3L, 100L),
        ("a", 4L, 199L), ("a", 5L, 250L), ("b", 6L, 100L))
      .toDF("k", "pid", "sec")
      .select(col("k"), col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val intervals = Seq(("a", 10L, 0L, 100L), ("a", 11L, 50L, 150L),
        ("a", 12L, 100L, 300L), ("a", 13L, 200L, 200L), ("b", 14L, 90L, 110L))
      .toDF("k", "iid", "s", "e")
      .select(col("k"), col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))

    val binned = TemporalJoins.pointInInterval(points, intervals,
        keyCols = Seq("k"), pointTime = "pt", startCol = "ws", endCol = "we",
        binSeconds = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.join(intervals, Seq("k"))
      .filter(col("pt") >= col("ws") && col("pt") < col("we"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned === brute)
    // Spot-pin the edges: start is inclusive, end exclusive, empty
    // interval 13 matches nothing.
    assert(brute.contains((1L, 10L)) && !brute.contains((3L, 10L)))
    assert(brute.contains((3L, 12L)) && brute.contains((4L, 12L)))
    assert(!brute.exists(_._2 == 13L))
  }

  test("asofBackward equals the brute-force inequality join on seeded random data with ties") {
    val rnd = new scala.util.Random(42)
    // Dense key/time space on purpose: equal-time probe/build pairs and
    // duplicate build timestamps per key exercise the tie rules.
    val probes = Seq.tabulate(200)(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("t"))
    val builds = Seq.tabulate(200)(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong, 1000L + i, rnd.nextDouble()))
      .toDF("k", "sec", "bid", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("t"), col("bid"), col("v"))

    import org.apache.spark.sql.expressions.Window
    for (strict <- Seq(false, true); forward <- Seq(false, true)) {
      val got = (if (forward)
          TemporalJoins.asofForward(probes, builds,
            Seq("k"), "t", "t", Seq("bid", "v"), "bid", strict = strict)
        else
          TemporalJoins.asofBackward(probes, builds,
            Seq("k"), "t", "t", Seq("bid", "v"), "bid", strict = strict))
        .select("id", "bid").as[(Long, Option[Long])].collect().toMap
      // Brute force: all candidate builds; latest-time/greatest-bid for
      // backward, earliest-time/smallest-bid for forward.
      val cond = (strict, forward) match {
        case (false, false) => col("b.t") <= col("p.t")
        case (true, false)  => col("b.t") < col("p.t")
        case (false, true)  => col("b.t") >= col("p.t")
        case (true, true)   => col("b.t") > col("p.t")
      }
      val w = Window.partitionBy(col("id")).orderBy(
        if (forward) col("b.t").asc else col("b.t").desc,
        if (forward) col("b.bid").asc else col("b.bid").desc)
      val best = probes.as("p")
        .join(builds.as("b"), col("p.k") === col("b.k") && cond, "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("b.bid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got === best, s"strict=$strict forward=$forward")
    }
  }

  test("asofNearest equals brute force: min |Δt|, backward wins distance ties") {
    val rnd = new scala.util.Random(43)
    val probes = Seq.tabulate(200)(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("t"))
    val builds = Seq.tabulate(200)(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong, 1000L + i, rnd.nextDouble()))
      .toDF("k", "sec", "bid", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("t"), col("bid"), col("v"))

    val got = TemporalJoins.asofNearest(probes, builds,
        Seq("k"), "t", "t", Seq("bid", "v"), "bid")
      .select("id", "bid").as[(Long, Option[Long])].collect().toMap

    import org.apache.spark.sql.expressions.Window
    // Brute force over ALL same-key builds: distance asc; backward
    // (b.t <= p.t) before forward at equal distance; greatest bid among
    // backward ties, smallest among forward ties.
    val w = Window.partitionBy(col("id")).orderBy(
      abs(unix_micros(col("b.t")) - unix_micros(col("p.t"))).asc,
      when(col("b.t") <= col("p.t"), 0).otherwise(1).asc,
      when(col("b.t") <= col("p.t"), -col("b.bid")).otherwise(col("b.bid")).asc)
    val best = probes.as("p")
      .join(builds.as("b"), col("p.k") === col("b.k"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("b.bid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === best)
    // and it is genuinely left-outer with every probe present
    assert(got.size === 200)
  }

  test("asofBackward: NULL build keys/times never match; NULL probes come out unmatched") {
    val nullBuild = Seq(
      (Some("a"), Some(90L), 11L), (Some("a"), None, 66L), (None, Some(95L), 77L))
      .toDF("k", "sec", "bid")
      .select(col("k"), when(col("sec").isNotNull, timestamp_seconds(col("sec"))).as("t"),
        col("bid"))
    val nullProbe = Seq((1L, Some("a"), Some(100L)), (2L, None, Some(100L)),
        (3L, Some("a"), None))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"),
        when(col("sec").isNotNull, timestamp_seconds(col("sec"))).as("t"))
    val out = TemporalJoins.asofBackward(nullProbe, nullBuild,
        Seq("k"), "t", "t", Seq("bid"), "bid")
      .select("id", "bid").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // id1 matches ONLY the non-null build row (bid 11) — the null-time
    // bid 66 and null-key bid 77 rows can never match; id2 (null key)
    // and id3 (null time) are kept, unmatched — DuckDB ASOF LEFT JOIN
    // semantics.
    assert(out === Array((1L, 11L), (2L, -1L), (3L, -1L)))
  }

  test("misuse fails at plan time with a named column") {
    val eL = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(probeDf, buildDf, Seq("k"), "t", "t",
        rightCols = Seq("t"), rightTiebreak = "bid") // 't' exists on the left
    }
    assert(eL.getMessage.contains("already exist on"))
    val eM = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(probeDf, buildDf, Seq("nope"), "t", "t",
        Seq("bid"), "bid")
    }
    assert(eM.getMessage.contains("nope"))
    val eP = intercept[IllegalArgumentException] {
      TemporalJoins.pointInInterval(probeDf, buildDf, Seq("k"), "t", "t", "t", 10L)
    }
    assert(eP.getMessage.contains("exist on both"))
  }

  test("pointInInterval equals brute force on seeded random intervals (incl. empty/long)") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(300)(i =>
        (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextInt(500).toLong))
      .toDF("k", "pid", "sec")
      .select(col("k"), col("pid"), timestamp_seconds(col("sec")).as("pt"))
    // Random starts with lengths 0..149 — some empty, some spanning
    // multiple 50s bins (longer than binSeconds, the documented
    // more-replication case).
    val intervals = Seq.tabulate(300) { i =>
        val s = rnd.nextInt(500).toLong
        (s"k${rnd.nextInt(4)}", 1000L + i, s, s + rnd.nextInt(150) - 1)
      }.toDF("k", "iid", "s", "e")
      .select(col("k"), col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    val binned = TemporalJoins.pointInInterval(points, intervals,
        Seq("k"), "pt", "ws", "we", binSeconds = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.join(intervals, Seq("k"))
      .filter(col("pt") >= col("ws") && col("pt") < col("we"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned === brute && brute.nonEmpty)
  }

  test("pointInInterval bins pre-1970 timestamps correctly (floor, not truncate)") {
    val points = Seq(("a", 1L, -50L)).toDF("k", "pid", "sec")
      .select(col("k"), col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val intervals = Seq(("a", 10L, -100L, 0L)).toDF("k", "iid", "s", "e")
      .select(col("k"), col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    val out = TemporalJoins.pointInInterval(points, intervals,
      Seq("k"), "pt", "ws", "we", binSeconds = 100L)
    assert(out.count() === 1L)
  }
}
