package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** CMS buffer: depth×width counters as ONE flat primitive Array[Long]
  * (row r, column c at index r·width + c) — single-memcpy encoding,
  * the TopKBuf/KmvBuf trick.
  */
case class CmsBuf(counts: Array[Long])

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed, mergeable
  * Aggregator over pre-hashed keys — the JOIN-SIZE estimator of the
  * sketch family: for sketches A, B built over two key columns, the
  * minimum over rows of the counter inner product estimates
  * |A ⋈ B| = Σ_x a_x·b_x (ibid. §4.2), the quantity a planner needs
  * BEFORE running a join it suspects is quadratic (the q171 skew
  * profile tells you about one table; this prices the join of two).
  *
  * Two laws make it gateable without tolerance hand-waving:
  *  - NEVER under: every counter only over-counts (hash collisions add
  *    mass), and a sum of products of over-counts over-counts, so
  *    est ≥ exact ALWAYS — a deterministic inequality, not a
  *    probability.
  *  - Rarely far over: per row, E[excess] ≤ N_a·N_b/width (pairwise-
  *    independent buckets), so P(excess > e·N_a·N_b/width) ≤ 1/e by
  *    Markov and the min over `depth` independent rows fails only with
  *    probability e^(−depth) — the q188 gate pins the e·N_a·N_b/width
  *    band with depth 5 (failure odds < 1%, and deterministic here:
  *    fixed hash seeds over fixed data either pass or they don't).
  *
  * Merging is element-wise addition (sketch of a union IS the sum of
  * sketches — exact, bit-for-bit), so partials combine map-side in any
  * order and an incremental pipeline maintains one sketch per slice.
  * State: depth·width·8 bytes per group regardless of key cardinality.
  *
  * Bucket hashing: the input is already a 64-bit hash (xxhash64, like
  * KmvAggregator); each row remixes it with a distinct odd constant
  * through the Murmur3 finalizer — deterministic, no RNG anywhere.
  * Contract: counters and inner products stay in Long (rows per group
  * < 2^31-ish and N_a·N_b < 2^63 for the gate arithmetic).
  */
class CmsAggregator(depth: Int, width: Int)
    extends Aggregator[Long, CmsBuf, Array[Long]] {
  require(depth >= 1 && depth <= 16,
    s"CmsAggregator: depth must be in [1,16], got $depth")
  require(width >= 2, s"CmsAggregator: width must be >= 2, got $width")

  override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

  private def mix(h: Long, row: Int): Long = {
    // Murmur3 fmix64 over the row-tweaked hash: full avalanche, so the
    // depth rows behave as independent bucket functions.
    var x = h ^ ((row + 1) * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  override def reduce(buf: CmsBuf, h: Long): CmsBuf = {
    val a = buf.counts
    var r = 0
    while (r < depth) {
      val c = java.lang.Long.remainderUnsigned(mix(h, r), width.toLong).toInt
      a(r * width + c) += 1L
      r += 1
    }
    buf
  }

  override def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
    val a = x.counts; val b = y.counts
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    x
  }

  override def finish(buf: CmsBuf): Array[Long] = buf.counts

  override def bufferEncoder: Encoder[CmsBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder()
}
