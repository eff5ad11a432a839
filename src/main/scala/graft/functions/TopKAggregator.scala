package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Primitive parallel-array top-k buffer: `scores`/`ids` sorted best-first
  * (score desc, id asc on ties), length ≤ k. Two flat primitive arrays
  * encode as two UnsafeArrayData blobs — a single memcpy each — where the
  * previous `List[(Double, Long)]` buffer cost a per-element struct
  * serializer pass plus O(k) cons-cell churn on every insert.
  */
case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Bounded top-k as a typed Aggregator: each partition keeps only its k
  * best (score, id) pairs and partials merge associatively, so the
  * shuffle moves k rows per group per partition instead of every scored
  * row — the scale replacement for the window-function top-k, which
  * must sort ALL rows of each partition key. Ordering matches the
  * window formulation: score descending, id ascending on ties.
  *
  * The hot path is `reduce` on a full buffer: one comparison against the
  * current k-th best and, for the overwhelming majority of rows that
  * don't qualify, an immediate return with NO allocation.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  // java.lang.Double.compare gives a TOTAL order (NaN greatest, -0<0),
  // matching Spark's sort ordering for `sim DESC` — a plain `>` would
  // make NaN insertion-order-dependent and break the merge laws.
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  private def insert(buf: TopKBuf, score: Double, id: Long): TopKBuf = {
    val n = buf.scores.length
    if (n == k && !better(score, id, buf.scores(n - 1), buf.ids(n - 1))) return buf
    var pos = n
    while (pos > 0 && better(score, id, buf.scores(pos - 1), buf.ids(pos - 1))) pos -= 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(buf.scores, 0, ns, 0, pos)
    System.arraycopy(buf.ids, 0, ni, 0, pos)
    ns(pos) = score
    ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(buf.scores, pos, ns, pos + 1, tail)
      System.arraycopy(buf.ids, pos, ni, pos + 1, tail)
    }
    TopKBuf(ns, ni)
  }

  override def reduce(buf: TopKBuf, in: (Long, Double)): TopKBuf =
    insert(buf, in._2, in._1)

  /** Bounded merge of two sorted partials — O(k), no re-sort. */
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (b.scores.isEmpty) return a
    if (a.scores.isEmpty) return b
    val m = math.min(a.scores.length + b.scores.length, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.scores.length ||
        (i < a.scores.length && better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ns(o) = a.scores(i); ni(o) = a.ids(i); i += 1 }
      else { ns(o) = b.scores(j); ni(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKBuf(ns, ni)
  }

  override def finish(buf: TopKBuf): Seq[(Long, Double)] = {
    val out = new Array[(Long, Double)](buf.scores.length)
    var i = 0
    while (i < out.length) { out(i) = (buf.ids(i), buf.scores(i)); i += 1 }
    out.toSeq
  }

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
