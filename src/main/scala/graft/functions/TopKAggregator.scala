package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator: each partition keeps only its k
  * best (score, id) pairs and partials merge associatively, so the
  * shuffle moves k rows per group per partition instead of every scored
  * row — the scale replacement for the window-function top-k, which
  * must sort ALL rows of each partition key. Ordering matches the
  * window formulation: score descending, id ascending on ties.
  *
  * The buffer is a sorted List (k is small); merge is a bounded merge.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  // java.lang.Double.compare gives a TOTAL order (NaN greatest, -0<0),
  // matching Spark's sort ordering for `sim DESC` — a plain `>` would
  // make NaN insertion-order-dependent and break the merge laws.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
    val (pre, post) = buf.span(better(_, v))
    (pre ::: v :: post).take(k)
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] =
    insert(buf, (in._2, in._1))

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
