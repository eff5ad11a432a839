package graft.queries

import graft.Tables
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Temporal-join battery: as-of (point-in-time) and range
  * (point-in-interval) joins — operators Spark has no native form for,
  * implemented scale-first in `operators/TemporalJoins.scala` and
  * oracle-checked against DuckDB's native ASOF JOIN / inequality join.
  */
object TemporalQueries {
  import RelationalQueries.Q

  val queries: Map[String, Q] = Map(
    // As-of backward join: each click matched to the user's latest
    // at-or-before purchase. One shuffle on user_id, zero row blow-up —
    // vs the naive inequality join (quadratic per user) DuckDB's ASOF
    // operator also avoids.
    "q57_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("asof_purchase_id"),
          col("value").as("asof_purchase_value"))
      TemporalJoins.asofBackward(clicks, purchases,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("asof_purchase_id", "asof_purchase_value"),
          rightTiebreak = "asof_purchase_id")
        .orderBy("event_id")
    }),

    // Forward as-of: each click matched to the user's EARLIEST
    // at-or-after purchase — same single-shuffle plan, mirrored scan.
    // DuckDB's ASOF is backward-only, so the oracle is the
    // window-ranked inequality join.
    "q64_asof_forward" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("next_purchase_id"),
          col("value").as("next_purchase_value"))
      TemporalJoins.asofForward(clicks, purchases,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("next_purchase_id", "next_purchase_value"),
          rightTiebreak = "next_purchase_id")
        .orderBy("event_id")
    }),

    // Nearest as-of: each click matched to the user's closest purchase
    // in EITHER direction (pandas merge_asof direction='nearest');
    // equal-distance ties prefer the backward match. Two keyed
    // exchanges (one per direction), still no row multiplication.
    "q71_asof_nearest" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("near_purchase_id"),
          col("value").as("near_purchase_value"))
      TemporalJoins.asofNearest(clicks, purchases,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("near_purchase_id", "near_purchase_value"),
          rightTiebreak = "near_purchase_id")
        .orderBy("event_id")
    }),

    // Binned range join: for every order, how many OTHER orders the same
    // customer placed inside its 90-day follow-up window. 90-day bins →
    // each interval lands in ≤ 2 (custkey, bin) buckets; the join is a
    // narrow equi-join, not the BroadcastNestedLoopJoin Spark would pick
    // for the raw inequality predicate.
    "q58_range_join" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val points = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey"), col("o_orderdate"))
      val intervals = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("anchor_orderkey"),
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 90 DAY")).as("w_end"))
      TemporalJoins.pointInInterval(points, intervals,
          keyCols = Seq("custkey"), pointTime = "o_orderdate",
          startCol = "w_start", endCol = "w_end",
          binSeconds = 90L * 86400L)
        .filter(col("o_orderkey") =!= col("anchor_orderkey"))
        .groupBy(col("anchor_orderkey"))
        .agg(count(lit(1)).as("n_follow"))
        .select(col("anchor_orderkey").as("o_orderkey"), col("n_follow"))
        .orderBy("o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q57_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  p.asof_purchase_id, p.asof_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') e
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS asof_purchase_id,
        |                  value AS asof_purchase_value
        |                FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q64_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        | p AS (SELECT user_id, ts, event_id AS next_purchase_id,
        |         value AS next_purchase_value
        |       FROM events WHERE event_type = 'purchase'),
        | r AS (SELECT c.event_id, p.next_purchase_id, p.next_purchase_value,
        |         row_number() OVER (PARTITION BY c.event_id
        |           ORDER BY p.ts ASC, p.next_purchase_id ASC) AS rn
        |       FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |  r.next_purchase_id, r.next_purchase_value
        |FROM c LEFT JOIN r ON r.event_id = c.event_id AND r.rn = 1
        |ORDER BY c.event_id""".stripMargin,
    // Ordering mirror of asofNearest's contract: distance asc, then
    // backward before forward, then greatest-id (backward) /
    // smallest-id (forward) — encoded as a signed-id sort within the
    // side since ids are positive.
    "q71_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        | p AS (SELECT user_id, ts, event_id AS near_purchase_id,
        |         value AS near_purchase_value
        |       FROM events WHERE event_type = 'purchase'),
        | r AS (SELECT c.event_id, p.near_purchase_id, p.near_purchase_value,
        |         row_number() OVER (PARTITION BY c.event_id
        |           ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.ts)) ASC,
        |             CASE WHEN p.ts <= c.ts THEN 0 ELSE 1 END ASC,
        |             CASE WHEN p.ts <= c.ts THEN -p.near_purchase_id
        |                  ELSE p.near_purchase_id END ASC) AS rn
        |       FROM c JOIN p ON p.user_id = c.user_id)
        |SELECT c.event_id, c.user_id, c.ts,
        |  r.near_purchase_id, r.near_purchase_value
        |FROM c LEFT JOIN r ON r.event_id = c.event_id AND r.rn = 1
        |ORDER BY c.event_id""".stripMargin,
    "q58_range_join" ->
      """SELECT a.o_orderkey, COUNT(*) AS n_follow
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey
        | AND b.o_orderdate >= a.o_orderdate
        | AND b.o_orderdate <  a.o_orderdate + INTERVAL '90 days'
        | AND b.o_orderkey <> a.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
