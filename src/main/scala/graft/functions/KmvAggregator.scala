package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV buffer: the ≤ `k` smallest DISTINCT hash values seen, kept as a
  * strictly-increasing (signed order) Array[Long] — one flat primitive
  * array encodes as a single UnsafeArrayData memcpy (the TopKBuf trick).
  */
case class KmvBuf(mins: Array[Long])

/** Mergeable KMV (k-minimum-values / bottom-k) distinct sketch
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07) as a typed
  * Aggregator over pre-hashed keys. The sketch IS the set's k smallest
  * hash values, which buys what HLL cannot: SET ALGEBRA. For sketches
  * A, B with union sketch K = k-smallest(A ∪ B), any h ∈ K lies in the
  * k smallest of every set containing it, so "h ∈ underlying set" ≡
  * "h ∈ that set's sketch" — membership tests on K against A and B are
  * EXACT, and |A ∩ B| ≈ (|K ∩ A ∩ B| / |K|) · est(A ∪ B) follows.
  *
  * Hash-order convention: hashes are signed xxhash64 longs; the U(0,1)
  * position of a hash is u(m) = m·2⁻⁶⁴ + 0.5, which is strictly
  * increasing in the SIGNED value — so "k smallest signed longs" is
  * exactly "k smallest uniform draws", and the classic estimator
  * applies: est = (k−1)/u(m_(k)) when the buffer is full, est = |buffer|
  * (EXACT — every distinct hash is present) when it is not.
  *
  * Deterministic given the data (no RNG beyond the fixed xxhash64), and
  * merge is set-union-then-truncate, so the result is invariant under
  * ANY partitioning / merge order — unlike Misra-Gries the VALUES
  * themselves are reproducible, which is what lets the q157 gate pin
  * estimate errors, not just contract laws. Relative error is
  * ~1/√(k−2) per Beyer et al.; k·8 bytes of state per group.
  *
  * The hot reduce path — buffer full, hash above the current k-th
  * minimum, the overwhelming majority of rows under any Zipf-ish key
  * distribution — is one comparison and an immediate return with NO
  * allocation.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2 (estimator divides by k-1), got $k")

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  override def reduce(buf: KmvBuf, h: Long): KmvBuf = {
    val a = buf.mins
    val n = a.length
    if (n == k && h >= a(n - 1)) return buf
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) return buf // duplicate hash — KMV is a DISTINCT sketch
    val ins = -pos - 1
    val m = math.min(n + 1, k)
    val out = new Array[Long](m)
    System.arraycopy(a, 0, out, 0, ins)
    out(ins) = h
    val tail = m - ins - 1
    if (tail > 0) System.arraycopy(a, ins, out, ins + 1, tail)
    KmvBuf(out)
  }

  /** Sorted-merge the two strictly-increasing arrays, drop duplicates,
    * stop at k — the k smallest of the union, i.e. exactly the sketch
    * a single pass over the concatenated inputs would have built.
    */
  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    val a = x.mins; val b = y.mins
    if (a.isEmpty) return y
    if (b.isEmpty) return x
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(buf: KmvBuf): Array[Long] = buf.mins

  override def bufferEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
