package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KmvAggregator

/** KMV (bottom-k) distinct sketches and their set algebra — the sketch
  * family HLL cannot provide: HLL unions, but it cannot intersect, and
  * cross-corpus OVERLAP (shared n-gram vocabulary, shared users, shared
  * chunks) is the question contamination / diversity audits actually
  * ask. A KMV sketch is the set's k smallest xxhash64 values
  * ([[graft.functions.KmvAggregator]]); every estimator here is plain
  * column arithmetic over those arrays, so overlap matrices across
  * groups are computed on a GROUP-COUNT-sized relation of k·8-byte
  * sketches — at 100 TB the per-group sketches build with map-side
  * k-row partials (no key ever shuffles except inside the bounded
  * partials) while the exact formulation must shuffle the full
  * corpus-scale key domain once per comparison.
  *
  * Estimator regimes (Beyer et al., SIGMOD'07): a buffer that never
  * filled holds EVERY distinct hash, so its answers are exact; a full
  * buffer estimates (k−1)/u(m_(k)) with relative error ~1/√(k−2).
  * Both regimes are handled uniformly below, and the intersection
  * estimate ρ̂·est(∪) degrades to the exact count in the exact regime
  * (ρ̂ = common/|K|, est(∪) = |K|).
  */
object Sketches {

  /** U(0,1) position of a signed 64-bit hash: u = m·2⁻⁶⁴ + 0.5 —
    * strictly increasing in the signed value, so signed array order is
    * uniform-draw order.
    */
  def kmvU(m: Column): Column =
    m.cast("double") * lit(math.pow(2.0, -64)) + lit(0.5)

  /** Per-group KMV sketch of `xxhash64(keyCol)`: one aggregation with
    * k-row mergeable partials; output column `sk` is the sorted
    * bottom-k hash array.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
                k: Int): DataFrame = {
    val kmv = udaf(new KmvAggregator(k), Encoders.scalaLong)
    df.select((groupCols.map(col) :+ xxhash64(col(keyCol)).as("__h")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__h")).as("sk"))
  }

  /** Distinct-count estimate of the set behind a sketch. */
  def kmvDistinct(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / kmvU(element_at(sk, k)))

  /** Union sketch: the k smallest of the two sketches' union — exactly
    * the sketch of the underlying union (every element of the union's
    * bottom-k is in its own set's bottom-k, hence present in `a` or
    * `b`).
    */
  def kmvUnionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Incremental maintenance of a per-group sketch TABLE — the 100 TB
    * operating mode: the corpus-scale aggregation ran once when each
    * batch arrived; absorbing a new batch is a group-keyed full-outer
    * join of two MODEL-SIZED sketch tables (k·8 bytes per group), the
    * raw history never re-read. Because KMV merge is exact set-union-
    * then-truncate, the maintained table is BIT-IDENTICAL to a
    * from-scratch sketch of the union — not approximately equal — which
    * is exactly what the q166 gate checks as an empty diff.
    */
  def mergeKmvTables(current: DataFrame, delta: DataFrame,
                     groupCols: Seq[String], k: Int): DataFrame = {
    val a = current.withColumnRenamed("sk", "__sk_a")
    val b = delta.withColumnRenamed("sk", "__sk_b")
    a.join(b, groupCols, "full")
      .select((groupCols.map(col) :+
        coalesce(
          when(col("__sk_a").isNotNull && col("__sk_b").isNotNull,
            kmvUnionSketch(col("__sk_a"), col("__sk_b"), k)),
          col("__sk_a"), col("__sk_b")).as("sk")): _*)
  }

  /** (union_est, intersect_est, jaccard_est) struct for two sketches.
    * Membership of a union-sketch hash in either input sketch is EXACT
    * (see [[kmvUnionSketch]]), so ρ̂ = |K ∩ A ∩ B| / |K| and
    * |A ∩ B| ≈ ρ̂ · est(A ∪ B); jaccard ≡ ρ̂ in both regimes.
    */
  def kmvOverlap(a: Column, b: Column, k: Int): Column = {
    val ks = kmvUnionSketch(a, b, k)
    val common = size(array_intersect(ks, array_intersect(a, b))).cast("double")
    val unionEst = kmvDistinct(ks, k)
    val rho = common / size(ks).cast("double")
    struct(unionEst.as("union_est"), (rho * unionEst).as("intersect_est"),
      rho.as("jaccard_est"))
  }

  /** One CMS per group over `keyCol` — the join-size face of the sketch
    * family (see [[graft.functions.CmsAggregator]]). Map-side partials
    * merge by element-wise add; depth·width longs of state per group.
    */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
                depth: Int, width: Int): DataFrame = {
    val cms = udaf(new graft.functions.CmsAggregator(depth, width),
      Encoders.scalaLong)
    val grouped = df
      .select((groupCols.map(col) :+ xxhash64(col(keyCol)).as("__h")): _*)
      .groupBy(groupCols.map(col): _*)
    grouped.agg(cms(col("__h")).as("cms"))
  }

  /** Join-size estimate min_r Σ_c A[r][c]·B[r][c] for two CMS columns
    * of the same (depth, width) — pure higher-order column arithmetic
    * (no UDF): |A ⋈ B| on the sketched keys, NEVER below the exact
    * value, within e·N_a·N_b/width above it w.p. 1−e^(−depth).
    */
  def cmsJoinSize(a: Column, b: Column, depth: Int, width: Int): Column =
    array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
      aggregate(sequence(lit(0), lit(width - 1)), lit(0L), (acc, c) =>
        acc + element_at(a, r * width + c + 1) *
          element_at(b, r * width + c + 1))))
}
