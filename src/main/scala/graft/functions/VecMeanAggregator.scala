package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Running element-wise sum + count; one flat primitive array encodes as
  * a single UnsafeArrayData blob.
  */
case class VecSumBuf(sum: Array[Double], n: Long)

/** Element-wise mean of an `array<double>` column as a typed Aggregator:
  * each partition folds its vectors into ONE dim-length sum buffer and
  * partials merge associatively, so a per-group centroid over a 100 TB
  * corpus shuffles one vector per (group, partition) — never the rows.
  * The explode-to-(group, dim)-rows formulation the oracle uses would
  * inflate the exchange by the embedding dimension (64× here).
  *
  * Null vectors are skipped; a group with NO non-null vectors yields an
  * EMPTY array (not NULL — the zero buffer can't know the dimension),
  * so callers that need SQL-AVG NULL semantics for all-null groups
  * should filter nulls out first (q74 does). A dimension mismatch
  * inside a group is a data error and fails loudly rather than
  * truncating.
  */
class VecMeanAggregator extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {

  private def checkDim(have: Int, got: Int): Unit =
    require(have == got, s"vec_mean: mixed dimensions in one group ($have vs $got)")

  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  override def reduce(buf: VecSumBuf, v: Seq[Double]): VecSumBuf = {
    if (v == null) return buf
    if (buf.n == 0L) return VecSumBuf(v.toArray, 1L)
    checkDim(buf.sum.length, v.length)
    val s = buf.sum
    var i = 0
    while (i < s.length) { s(i) += v(i); i += 1 }
    VecSumBuf(s, buf.n + 1L)
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (a.n == 0L) return b
    if (b.n == 0L) return a
    checkDim(a.sum.length, b.sum.length)
    val s = a.sum
    var i = 0
    while (i < s.length) { s(i) += b.sum(i); i += 1 }
    VecSumBuf(s, a.n + b.n)
  }

  override def finish(buf: VecSumBuf): Seq[Double] = {
    if (buf.n == 0L) return Seq.empty
    val n = buf.n.toDouble
    val out = new Array[Double](buf.sum.length)
    var i = 0
    while (i < out.length) { out(i) = buf.sum(i) / n; i += 1 }
    out.toSeq
  }

  override def bufferEncoder: Encoder[VecSumBuf] = ExpressionEncoder[VecSumBuf]()

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
