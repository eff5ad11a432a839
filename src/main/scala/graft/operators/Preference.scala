package graft.operators

import org.apache.spark.sql.DataFrame

/** Preference-learning preps over BOUNDED "player" sets (reward-model
  * arms, candidate policies, data sources): strength fitting from a
  * pairwise win census. The corpus-scale work — producing the census —
  * happens upstream in declarative Spark; this routine is the
  * model-parameter step (the centroid-pull discipline: a loudly-bounded
  * driver pull of a player-sized relation, never corpus rows).
  */
object Preference {

  /** Bradley–Terry strengths via Hunter's (2004) MM iterations, run in
    * EXACT fixed-point integer arithmetic (micro-units, S = 1e6) so the
    * engine and the DuckDB oracle agree bit-for-bit: every update is a
    * Long multiply + floor divide and integer sums are order-free, so
    * there is no float-aggregation-order hazard anywhere in the loop.
    *
    * Per iteration, for each player i:
    *   raw_i  = W_i·S² div Σ_{j≠i, n_ij>0} (n_ij·S² div (s_i + s_j)),
    *            or S when i has no decided games (denominator 0);
    *   s_i    = max(1, raw_i·P·S div Σ_j raw_j)   (renormalize to Σ≈P·S,
    *            clamp keeps the next denominator defined).
    * The normalization product runs in BigInt (mirrors the oracle's
    * int128) because raw_i·P·S can exceed Long before the divide.
    *
    * Input `wins`: (winnerCol, loserCol, nCol) decided-game counts —
    * ties carry no decision and must not be rows. Bounded by
    * `maxPlayers` with a loud require (limit-k+1 probe, never an
    * unbounded collect). Output: (player, n_games, n_wins,
    * strength_micro) — deterministic, ordered by player.
    */
  def bradleyTerry(wins: DataFrame, winnerCol: String, loserCol: String,
      nCol: String, iters: Int = 16, maxPlayers: Int = 64): DataFrame = {
    val spark = wins.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val maxCells = maxPlayers * maxPlayers
    val cells = wins.select(col(winnerCol).cast("long"),
        col(loserCol).cast("long"), col(nCol).cast("long"))
      .as[(Long, Long, Long)]
      .limit(maxCells + 1).collect()
    require(cells.length <= maxCells,
      s"bradleyTerry: win census exceeds $maxPlayers^2 cells — this fits " +
        "a bounded player set (arms/policies), not corpus-scale entities")
    val S = 1000000L
    cells.foreach { case (w, l, c) =>
      require(c >= 0 && c <= Long.MaxValue / (S * S),
        s"bradleyTerry: game count $c for ($w,$l) out of fixed-point range")
    }
    val players = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    require(players.nonEmpty, "bradleyTerry: empty win census")
    require(players.length <= maxPlayers,
      s"bradleyTerry: ${players.length} players exceeds $maxPlayers")
    val idx = players.zipWithIndex.toMap
    val p = players.length
    val n = Array.ofDim[Long](p, p)
    val w = new Array[Long](p)
    cells.foreach { case (wi, li, c) =>
      val i = idx(wi); val j = idx(li)
      require(i != j, s"bradleyTerry: self-game for player $wi")
      n(i)(j) += c; n(j)(i) += c; w(i) += c
    }
    w.foreach(wi => require(wi <= Long.MaxValue / (S * S),
      "bradleyTerry: win total out of fixed-point range"))
    // n(i)(j) sums BOTH directed counts of a pair (plus any repeated
    // cells), so the per-cell input check above does not bound it —
    // re-validate the accumulated matrix or n(i)(j) * S * S in the MM
    // denominator silently overflows into garbage strengths.
    n.foreach(_.foreach(c => require(c <= Long.MaxValue / (S * S),
      "bradleyTerry: accumulated pair total out of fixed-point range")))
    var s = Array.fill(p)(S)
    for (_ <- 0 until iters) {
      val raw = new Array[Long](p)
      var i = 0
      while (i < p) {
        var denom = 0L
        var j = 0
        while (j < p) {
          if (j != i && n(i)(j) > 0) denom += n(i)(j) * S * S / (s(i) + s(j))
          j += 1
        }
        raw(i) = if (denom > 0) w(i) * S * S / denom else S
        i += 1
      }
      val total = raw.sum
      s = raw.map(r => math.max(1L,
        (BigInt(r) * p * S / total).toLong))
    }
    val games = (0 until p).map(i => n(i).sum)
    spark.createDataFrame(
      players.indices.map(i => (players(i), games(i), w(i), s(i))))
      .toDF("player", "n_games", "n_wins", "strength_micro")
      .orderBy("player")
  }
}
