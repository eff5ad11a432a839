package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries summary buffer: ≤ `m` (key, counter) pairs as parallel
  * arrays plus `err`, the cumulative mass subtracted by decrement steps
  * across this buffer's whole merge lineage. Two flat arrays encode as
  * two UnsafeArrayData blobs (the TopKBuf trick); keys are unordered —
  * the hot reduce path is a linear probe over ≤ m strings.
  */
case class MGBuf(keys: Array[String], counts: Array[Long], err: Long)

/** Mergeable Misra–Gries heavy-hitters summary (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) as a typed Aggregator: each partition
  * folds its rows into ≤ `m` counters, partials merge by pointwise sum
  * followed by subtracting the (m+1)-th largest counter, and the final
  * summary carries the EXACT accumulated decrement `err`. Deterministic
  * guarantees that hold under ANY partitioning / merge order (which is
  * what the q154/q155 gates check, since the estimates themselves are
  * partition-order dependent):
  *
  *   - `est(k) ≤ true(k)` — counters only ever lose mass;
  *   - `true(k) − est(k) ≤ err` — a key's undercount is bounded by the
  *     decrements along its lineage, all of which `err` sums;
  *   - every key with `true(k) > err` is present in the summary;
  *   - `err ≤ n/(m+1)` — each decrement round removes ≥ m+1 total mass.
  *
  * This is the sketch complement to count_min_sketch (q77): CMS answers
  * point queries for keys you ALREADY hold, MG surfaces the heavy keys
  * themselves — at 100 TB the pair replaces a corpus-scale vocabulary
  * aggregate with fixed `m`-counter mergeable state and map-side
  * partials (no key ever shuffles except inside the m-row partials).
  */
class HeavyHittersAggregator(m: Int)
    extends Aggregator[String, MGBuf, (Seq[(String, Long)], Long)] {
  require(m >= 1, s"heavy-hitters summary needs capacity >= 1, got $m")

  override def zero: MGBuf =
    MGBuf(Array.empty[String], Array.emptyLongArray, 0L)

  override def reduce(buf: MGBuf, key: String): MGBuf = {
    val n = buf.keys.length
    var i = 0
    while (i < n && buf.keys(i) != key) i += 1
    if (i < n) { buf.counts(i) += 1L; buf }
    else if (n < m) {
      val nk = new Array[String](n + 1)
      val nc = new Array[Long](n + 1)
      System.arraycopy(buf.keys, 0, nk, 0, n)
      System.arraycopy(buf.counts, 0, nc, 0, n)
      nk(n) = key; nc(n) = 1L
      MGBuf(nk, nc, buf.err)
    } else {
      // Full and key absent: the virtual new counter sits at 1, so the
      // (m+1)-th largest of the m+1 counters is exactly 1 (every live
      // counter is ≥ 1). Decrement all by 1, drop the zeros; the new key
      // never lands. Amortized O(1): each such round removes m+1 mass,
      // so rounds ≤ n/(m+1) and total compaction work is O(n).
      var keep = 0
      i = 0
      while (i < n) { if (buf.counts(i) > 1L) keep += 1; i += 1 }
      val nk = new Array[String](keep)
      val nc = new Array[Long](keep)
      var o = 0
      i = 0
      while (i < n) {
        if (buf.counts(i) > 1L) { nk(o) = buf.keys(i); nc(o) = buf.counts(i) - 1L; o += 1 }
        i += 1
      }
      MGBuf(nk, nc, buf.err + 1L)
    }
  }

  /** Pointwise-sum the two summaries, then restore the size bound by
    * subtracting the (m+1)-th largest combined counter from every entry
    * (Agarwal et al. §3.1) — that subtraction is the only new error, and
    * it is added to the carried `err` exactly.
    */
  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (b.keys.isEmpty && b.err == 0L) return a
    if (a.keys.isEmpty && a.err == 0L) return b
    val sum = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < a.keys.length) { sum.put(a.keys(i), a.counts(i)); i += 1 }
    i = 0
    while (i < b.keys.length) {
      val k = b.keys(i)
      val prev = sum.get(k)
      sum.put(k, (if (prev eq null) 0L else prev.longValue()) + b.counts(i))
      i += 1
    }
    var err = a.err + b.err
    var c = 0L
    if (sum.size > m) {
      val vals = new Array[Long](sum.size)
      val it0 = sum.values().iterator()
      var j = 0
      while (it0.hasNext) { vals(j) = it0.next(); j += 1 }
      java.util.Arrays.sort(vals)
      c = vals(vals.length - 1 - m) // (m+1)-th largest
      err += c
    }
    var keep = 0
    val it1 = sum.values().iterator()
    while (it1.hasNext) if (it1.next() > c) keep += 1
    val nk = new Array[String](keep)
    val nc = new Array[Long](keep)
    var o = 0
    val it2 = sum.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      if (e.getValue > c) { nk(o) = e.getKey; nc(o) = e.getValue - c; o += 1 }
    }
    MGBuf(nk, nc, err)
  }

  /** Items sorted (count desc, key asc) for stable presentation; the
    * VALUES are merge-order dependent — only the guarantees above are
    * contractual, which is why the gates check those, not the numbers.
    */
  override def finish(buf: MGBuf): (Seq[(String, Long)], Long) = {
    val out = new Array[(String, Long)](buf.keys.length)
    var i = 0
    while (i < out.length) { out(i) = (buf.keys(i), buf.counts(i)); i += 1 }
    (out.sortBy { case (k, c) => (-c, k) }.toSeq, buf.err)
  }

  override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()

  override def outputEncoder: Encoder[(Seq[(String, Long)], Long)] =
    ExpressionEncoder[(Seq[(String, Long)], Long)]()
}
