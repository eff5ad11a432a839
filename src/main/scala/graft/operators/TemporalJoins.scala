package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks natively: point-in-time (as-of)
  * joins and point-in-interval (range) joins.
  *
  * Scale design (100 TB):
  *  - `asofBackward` is the union+window formulation: both inputs are
  *    tagged and unioned, shuffled ONCE on the join key, sorted within
  *    partitions by (time, side, tiebreak), and the match is a running
  *    `last(payload, ignoreNulls)` window. No row multiplication, no
  *    per-key explode, no inequality join — the exchange carries each
  *    input exactly once, which is the same data movement a native
  *    as-of join operator (kdb aj, QuestDB ASOF) performs. A skewed key
  *    concentrates its rows in one sort partition — the same bound any
  *    keyed window has.
  *  - `pointInInterval` is the binned range join: intervals are
  *    replicated to the fixed-width time bins they cover (≤ 2 bins when
  *    `binSeconds` ≥ the max interval length), points map to exactly one
  *    bin, and the match becomes a narrow equi-join on (key, bin) plus
  *    an exact residual filter. Replication factor is bounded by
  *    ceil(maxInterval/bin)+1, and because points land in a single bin
  *    no dedup pass is needed afterwards. This is the standard rewrite
  *    Spark's optimizer does NOT do (a raw t >= start AND t < end join
  *    falls back to BroadcastNestedLoopJoin / cartesian).
  */
object TemporalJoins {

  /** As-of (backward) join: each left row is matched to the single right
    * row with the greatest `rightTime` <= `leftTime` (strictly < when
    * `strict`) within the same key group; unmatched left rows keep null
    * payload (left-outer semantics, DuckDB `ASOF LEFT JOIN`).
    *
    * Requirements: `keyCols` exist on both sides with identical names;
    * `leftTime`/`rightTime` are mutually comparable (both timestamps or
    * both numerics). Equal-`rightTime` build rows within a key are broken
    * deterministically by the greatest `rightTiebreak` — "arbitrary tie"
    * is non-reproducible at scale, so it is pinned here like
    * `Dedup.dropDuplicatesOrdered` pins keep-first.
    *
    * Output: all left columns, then `rightCols` (null when unmatched).
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   keyCols: Seq[String], leftTime: String, rightTime: String,
                   rightCols: Seq[String], rightTiebreak: String,
                   strict: Boolean = false): DataFrame =
    asofImpl(left, right, keyCols, leftTime, rightTime, rightCols,
      rightTiebreak, strict, forward = false)

  /** As-of (forward) join: the mirror of `asofBackward` — each left row
    * matches the single right row with the SMALLEST `rightTime` >=
    * `leftTime` (strictly > when `strict`), equal-time build ties broken
    * by the smallest `rightTiebreak`. No native DuckDB form (ASOF is
    * backward-only there); the oracle is the window-ranked inequality
    * join. Same single-shuffle plan.
    */
  def asofForward(left: DataFrame, right: DataFrame,
                  keyCols: Seq[String], leftTime: String, rightTime: String,
                  rightCols: Seq[String], rightTiebreak: String,
                  strict: Boolean = false): DataFrame =
    asofImpl(left, right, keyCols, leftTime, rightTime, rightCols,
      rightTiebreak, strict, forward = true)

  /** Nearest as-of join (pandas `merge_asof direction='nearest'`): each
    * left row matches the right row whose time is closest in EITHER
    * direction. Equal-distance ties prefer the backward (at-or-before)
    * match; equal-time ties within a direction follow that direction's
    * tiebreak (greatest for backward, smallest for forward). Left-outer:
    * unmatched probes keep null payloads.
    *
    * Implemented as the backward pass followed by the forward pass over
    * its output, then a per-row distance compare — two keyed exchanges
    * of each input (vs one for a single direction), still no row
    * multiplication and no inequality join.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
                  keyCols: Seq[String], leftTime: String, rightTime: String,
                  rightCols: Seq[String], rightTiebreak: String): DataFrame = {
    val reserved = Seq("__mt") ++ rightCols.flatMap(c => Seq(s"__b_$c", s"__f_$c"))
    val clash = reserved.filter(c => left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty,
      s"asofNearest: reserved working columns ${clash.mkString(",")} already exist")
    // carry the matched build time through each pass for the |Δt| compare
    val rightT = right.withColumn("__mt", col(rightTime))
    val carried = rightCols :+ "__mt"

    val back = asofImpl(left, rightT, keyCols, leftTime, rightTime,
      carried, rightTiebreak, strict = false, forward = false)
    val backTagged = carried.foldLeft(back)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val both = asofImpl(backTagged, rightT, keyCols, leftTime, rightTime,
      carried, rightTiebreak, strict = false, forward = true)
    val tagged = carried.foldLeft(both)((df, c) => df.withColumnRenamed(c, s"__f_$c"))

    // Distance in a common numeric domain: micros for timestamps, the
    // raw (numeric) value otherwise — both exact in long/double range.
    def tnum(c: org.apache.spark.sql.Column) =
      if (left.schema(leftTime).dataType.typeName.startsWith("timestamp"))
        unix_micros(c.cast("timestamp"))
      else c.cast("double")
    val lt = tnum(col(leftTime))
    val db = abs(lt - tnum(col("__b___mt")))
    val df_ = abs(tnum(col("__f___mt")) - lt)
    val useBack = col("__f___mt").isNull ||
      (col("__b___mt").isNotNull && db <= df_)

    val out = tagged.select(
      left.columns.map(col).toSeq ++ rightCols.map(c =>
        when(useBack, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(c)): _*)
    out
  }

  private def asofImpl(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], leftTime: String, rightTime: String,
                       rightCols: Seq[String], rightTiebreak: String,
                       strict: Boolean, forward: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Misuse fails at plan time with a named column, not with a
    // duplicate-column result or a resolution error deep in the union.
    val missingL = (keyCols :+ leftTime).filterNot(left.columns.contains)
    val missingR = (keyCols ++ rightCols :+ rightTime :+ rightTiebreak)
      .distinct.filterNot(right.columns.contains)
    require(missingL.isEmpty && missingR.isEmpty,
      s"asof join: missing columns — left: ${missingL.mkString(",")} " +
        s"right: ${missingR.mkString(",")}")
    val collisions = rightCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"asof join: rightCols ${collisions.mkString(",")} already exist on " +
        "the left side — rename the payload columns before joining")
    // At equal time the probe must sort AFTER builds to see them (>=/<=
    // semantics) and BEFORE builds to not see them (strict).
    val (buildSide, probeSide) = if (strict) (1, 0) else (0, 1)
    val payType = StructType(rightCols.map(n => right.schema(n)))
    val lrowType = StructType(left.schema.fields)

    val probe = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(probeSide).as("__side"),
        lit(null).cast("bigint").as("__tb"),
        struct(left.columns.map(col): _*).as("__lrow"),
        lit(null).cast(payType).as("__pay")): _*)
    // SQL join semantics: a NULL key or NULL time on the build side can
    // never satisfy `l.key = r.key AND l.t >= r.t`, but partitionBy
    // groups NULL keys and ascending sort puts NULL times first — both
    // would fabricate matches. Drop such build rows; NULL-key/time PROBE
    // rows stay and come out unmatched (left-outer), matching DuckDB.
    val buildClean = (keyCols :+ rightTime)
      .foldLeft(right)((df, c) => df.filter(col(c).isNotNull))
    val build = buildClean.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(buildSide).as("__side"),
        col(rightTiebreak).cast("bigint").as("__tb"),
        lit(null).cast(lrowType).as("__lrow"),
        struct(rightCols.map(col): _*).as("__pay")): _*)

    // One exchange on the key; scanning time ascending (backward) or
    // descending (forward), the running last() over the prefix is the
    // closest eligible build: latest-then-greatest-tiebreak for
    // backward, earliest-then-smallest-tiebreak for forward. NULL probe
    // times must sort FIRST in scan order either way (no build in their
    // prefix → unmatched), hence desc_nulls_first on the mirror.
    val (tSort, tbSort) =
      if (forward) (col("__t").desc_nulls_first, col("__tb").desc)
      else (col("__t").asc, col("__tb").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tSort, col("__side").asc, tbSort)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = probe.unionByName(build)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === probeSide)

    val out = matched.select(
      col("__lrow.*") +: rightCols.map(n => col(s"__match.$n").as(n)): _*)
    out
  }

  /** Point-in-interval range join: every (point, interval) pair with
    * matching keys and `start <= pointTime < end`. Returns all point
    * columns plus all interval columns (caller disambiguates names
    * beforehand). Empty/inverted intervals (end <= start) match nothing.
    *
    * `binSeconds` should be >= the maximum interval length so each
    * interval is replicated to at most 2 bins; longer intervals still
    * join correctly, just with proportionally more replication.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointTime: String,
                      startCol: String, endCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"pointInInterval: binSeconds must be > 0, got $binSeconds")
    val missingP = (keyCols :+ pointTime).filterNot(points.columns.contains)
    val missingI = (keyCols :+ startCol :+ endCol).filterNot(intervals.columns.contains)
    require(missingP.isEmpty && missingI.isEmpty,
      s"pointInInterval: missing columns — points: ${missingP.mkString(",")} " +
        s"intervals: ${missingI.mkString(",")}")
    val dupCols = intervals.columns.filterNot(keyCols.contains)
      .filter(points.columns.filterNot(keyCols.contains).contains(_))
    require(dupCols.isEmpty,
      s"pointInInterval: non-key columns ${dupCols.mkString(",")} exist on both " +
        "sides — rename before joining so the output is unambiguous")
    val binMicros = binSeconds * 1000000L
    // Bin id = the bin's start micros (us - us mod width): pure long
    // arithmetic, exact for every timestamp — a float or truncating-div
    // formulation would mis-bin pre-1970 or far-future values. pmod keeps
    // the remainder non-negative for negative epochs.
    def binOf(c: org.apache.spark.sql.Column) = {
      // NTZ columns (parquet isAdjustedToUTC=false) cast via the session
      // zone, which GraftSession pins to UTC — lossless either way.
      val us = unix_micros(c.cast("timestamp"))
      us - pmod(us, lit(binMicros))
    }

    val p = points.withColumn("__bin", binOf(col(pointTime)))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(startCol)),
          // end is exclusive: the last covered instant is end - 1µs.
          binOf(col(endCol) - expr("INTERVAL 1 MICROSECOND")),
          lit(binMicros))))

    p.join(iv, keyCols :+ "__bin")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bin")
  }
}
