package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) and
  * `array_intersect` are interpreted per-row lambda evaluators — fine on
  * input-side projections, but the pair-scoring stages of similarity
  * search and near-dup detection evaluate them O(n²) times. These
  * expressions fuse each score into a single whole-stage-codegen'd loop
  * with no per-row allocation, which is the difference between an
  * interpreted ~50 s stage and a ~1 s one at sf0.1 (and the difference
  * between feasible and not at 100 TB).
  */

/** Cosine similarity of two double arrays in one fused loop (dot and both
  * norms accumulated together). Float inputs are implicitly cast by
  * Catalyst, so callers can pass the storage-typed `array<float>` column
  * directly. Accumulation order is ascending-index, matching the
  * left-fold of the `aggregate`-based formulation and the DuckDB oracle's
  * `list_cosine_similarity` bit-for-bit at 6 dp rounding.
  *
  * Mismatched lengths return NULL (the SQL-function contract — DuckDB's
  * list_cosine_similarity errors there; silently truncating to min(n,m)
  * masked caller bugs). A zero-norm side yields NaN, like the oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def foldable: Boolean = children.forall(_.foldable)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere: two instances of this expression can land in
      // ONE codegen scope (non-nullable inputs are inlined unbraced), and
      // fixed identifiers would collide -> Janino error -> silent
      // whole-stage fallback to interpreted execution.
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product of two double arrays — for uses that only need the
  * projection (e.g. hyperplane sign tests), where cosine's two norms
  * and sqrt/divide are wasted work. Mismatched lengths return NULL
  * (same contract as `cosine_similarity`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def foldable: Boolean = children.forall(_.foldable)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |∩|/|∪| of two SORTED-ascending distinct long
  * arrays via a merge walk — no hash set, no intermediate array, O(n+m)
  * per pair. Callers must pre-sort with `sort_array` (done once per input
  * row, not per pair). Two empty arrays (∅∪∅, a 0/0) return NULL rather
  * than NaN — NaN compares true under `>=` in Spark's total order, which
  * would silently pass threshold filters.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def foldable: Boolean = children.forall(_.foldable)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n + m == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for the same reason as CosineSimilarity above.
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $n = $a.numElements(), $m = $b.numElements();
         |if ($n + $m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0, $j = 0, $inter = 0;
         |  while ($i < $n && $j < $m) {
         |    long $xi = $a.getLong($i);
         |    long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $inter++; $i++; $j++; }
         |    else if ($xi < $yj) $i++;
         |    else $j++;
         |  }
         |  ${ev.value} = ((double) $inter) / ($n + $m - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Mean unsigned-byte value of a binary payload (the "brightness" byte
  * feature of the multimodal path) in one fused loop. The column-
  * expression twin of `Multimodal.byteFeatures`'s byte mean: keeps q35's
  * benched path inside whole-stage codegen instead of deserializing every
  * row through a typed `mapPartitions`. Empty input yields 0.0 (matching
  * `byteFeatures`' contract).
  */
case class ByteMean(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "byte_mean"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0.0
    else {
      var sum = 0L; var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      sum.toDouble / bytes.length
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.length;
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ($a[$i] & 0xff);
         |}
         |${ev.value} = $n == 0 ? 0.0 : ((double) $sum) / $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 256-bin byte histogram of a binary payload — the cheapest
  * content-signature a multimodal pipeline can compute without decoding
  * the media (distribution of bytes survives container re-muxing far
  * better than a whole-file hash). One codegen pass over the bytes;
  * counts are exact longs, so downstream cosine arithmetic is
  * integer-exact and cross-engine reproducible (the q138 gate).
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val h = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { h(bytes(i) & 0xff) += 1L; i += 1 }
    new GenericArrayData(h)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |long[] $h = new long[256];
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $h[$a[$i] & 0xff]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Indices of the `k` centroids most cosine-similar to the input vector,
  * in one fused kernel — the map-side argmax of IVF bucket assignment.
  *
  * The interpreted formulation (an nlist-element literal struct array
  * built per row, `array_sort`ed, reversed, sliced) re-evaluates a
  * higher-order-function pipeline for every corpus row and was most of
  * q33's cost; here the centroid matrix rides along as a codegen
  * reference object, centroid norms are precomputed once at plan time,
  * and the per-row work is one dot-product loop per centroid plus a
  * k-pass selection — no allocation beyond the k-element result.
  *
  * Ordering contract matches the sort formulation exactly: descending
  * similarity, ties broken by DESCENDING centroid index (ascending
  * struct sort then reverse), NaN ordered greatest (Spark's double
  * total order). A vector whose length differs from the centroid
  * dimension yields NULL, like `cosine_similarity`.
  */
case class ArgTopKCosine(child: Expression, centroids: Array[Array[Double]], k: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  require(centroids.nonEmpty, "argtopk_cosine: centroid matrix must be non-empty")
  require(centroids.forall(_.length == centroids.head.length),
    "argtopk_cosine: centroid rows must share one dimension")
  require(k >= 1 && k <= centroids.length,
    s"argtopk_cosine: k must be in [1, ${centroids.length}], got $k")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "argtopk_cosine"
  override def nullable: Boolean = true

  @transient private lazy val centNorms: Array[Double] =
    centroids.map { c =>
      var ss = 0.0; var i = 0
      while (i < c.length) { ss += c(i) * c(i); i += 1 }
      math.sqrt(ss)
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != centroids.head.length) null
    else ArgTopKCosine.topK(v, centroids, centNorms, k)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    val dim = centroids.head.length
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.ArgTopKCosine.topK($a, $cents, $norms, $k);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArgTopKCosine {
  /** Shared eval/codegen kernel. Selection is k passes of argmax over the
    * nlist sims (k, nlist both model-sized constants — no sort, no heap).
    */
  def topK(vec: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
           k: Int): ArrayData = {
    val dim = vec.numElements()
    var vs = 0.0
    var i = 0
    while (i < dim) { val x = vec.getDouble(i); vs += x * x; i += 1 }
    val vnorm = math.sqrt(vs)

    val m = cents.length
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = cents(c)
      var dot = 0.0; var j = 0
      while (j < dim) { dot += vec.getDouble(j) * cv(j); j += 1 }
      sims(c) = dot / (vnorm * norms(c))
      c += 1
    }

    val out = new Array[Long](k)
    val taken = new Array[Boolean](m)
    var r = 0
    while (r < k) {
      var best = -1
      var cc = 0
      while (cc < m) {
        if (!taken(cc) && (best < 0 || {
          // Double.compare = Spark's double total order (NaN greatest);
          // ties on sim prefer the LARGER index (reverse-of-ascending).
          val cmp = java.lang.Double.compare(sims(cc), sims(best))
          cmp > 0 || (cmp == 0 && cc > best)
        })) best = cc
        cc += 1
      }
      taken(best) = true
      out(r) = best.toLong
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Product-quantization encoder: for each of the `m` contiguous
  * subvectors of the input, the index of the L2-nearest codeword in that
  * subspace's codebook, plus the total squared reconstruction error —
  * one fused codegen pass per row (m·ksub·dsub multiply-adds, no
  * allocation beyond the output). Ties pick the LOWEST codeword index
  * (strict `<` keeps the first minimum). A vector whose length is not
  * m·dsub returns NULL. The codebook is a model parameter captured as a
  * literal reference object, like `ArgTopKCosine`'s centroid matrix.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  require(codebooks.nonEmpty, "pq_encode: need at least one subspace codebook")
  require(codebooks.forall(_.nonEmpty), "pq_encode: empty codebook")
  require(codebooks.forall(_.length == codebooks.head.length),
    "pq_encode: all subspaces must share one ksub")
  require(codebooks.flatten.forall(_.length == codebooks.head.head.length),
    "pq_encode: all codewords must share one subvector dimension")

  private def dim: Int = codebooks.length * codebooks.head.head.length

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sq_err", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) null
    else PqEncode.encode(v, codebooks)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.PqEncode.encode($a, $books);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Shared eval/codegen kernel (static forwarder lets generated Java
    * call it directly, like `ArgTopKCosine.topK`).
    */
  def encode(vec: ArrayData,
             books: Array[Array[Array[Double]]]): org.apache.spark.sql.catalyst.InternalRow = {
    val m = books.length
    val dsub = books(0)(0).length
    val codes = new Array[Long](m)
    var err = 0.0
    var j = 0
    while (j < m) {
      val base = j * dsub
      val book = books(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(base + t) - cw(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toLong
      err += bestD
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), err))
  }
}

/** Codegen'd membership probe against a pre-built Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, the mergeable sketch
  * `DataFrameStatFunctions.bloomFilter` trains distributively). The
  * filter rides along as a codegen reference object — serialized once
  * with the plan, probed with `mightContainLong` per row, no UDF and no
  * per-row (de)serialization. Spark's own runtime `BloomFilterMightContain`
  * is planner-internal (injected by the InjectRuntimeFilter rule, not
  * constructible from the public API), hence this expression.
  */
case class BloomMightContainLong(child: Expression,
                                 filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the expressions above. */
/** Sparse dot product of two vectors stored as aligned (sorted-ascending
  * distinct long keys, double values) array pairs, via a merge walk —
  * O(n+m) per pair, no hash map, no per-pair allocation. The sparse twin
  * of [[DotProduct]]: dense pair scoring walks two aligned value arrays,
  * sparse pair scoring (TF / TF-IDF document vectors, where the "dimension"
  * is the vocabulary) walks two key-sorted postings. Callers pre-sort once
  * per row (`sort_array` on a struct list), not per pair — the
  * [[JaccardSortedLongs]] contract.
  *
  * Accumulation order is ascending-key, matching the key-ordered SUM the
  * DuckDB oracle's shared-term join produces, so 6-dp rounding agrees.
  * A keys/values length mismatch on either side returns NULL (caller bug,
  * same contract as [[CosineSimilarity]]'s length check); disjoint or
  * empty inputs return 0.0 (an empty sum, exactly like the oracle's join
  * producing no rows for the pair).
  */
case class SparseDotSortedLongs(aKeys: Expression, aVals: Expression,
                                bKeys: Expression, bVals: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes with Serializable {

  override def first: Expression = aKeys
  override def second: Expression = aVals
  override def third: Expression = bKeys
  override def fourth: Expression = bVals
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(DoubleType),
    ArrayType(LongType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot_sorted"
  override def foldable: Boolean = children.forall(_.foldable)
  override def nullable: Boolean = true

  override def nullSafeEval(ak: Any, av: Any, bk: Any, bv: Any): Any = {
    val xk = ak.asInstanceOf[ArrayData]; val xv = av.asInstanceOf[ArrayData]
    val yk = bk.asInstanceOf[ArrayData]; val yv = bv.asInstanceOf[ArrayData]
    val n = xk.numElements(); val m = yk.numElements()
    if (n != xv.numElements() || m != yv.numElements()) return null
    var i = 0; var j = 0; var acc = 0.0
    while (i < n && j < m) {
      val ki = xk.getLong(i); val kj = yk.getLong(j)
      if (ki == kj) { acc += xv.getDouble(i) * yv.getDouble(j); i += 1; j += 1 }
      else if (ki < kj) i += 1
      else j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ak, av, bk, bv) => {
      // freshName for the same reason as CosineSimilarity above.
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val ki = ctx.freshName("ki"); val kj = ctx.freshName("kj")
      s"""
         |int $n = $ak.numElements(), $m = $bk.numElements();
         |if ($n != $av.numElements() || $m != $bv.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0, $j = 0;
         |  double $acc = 0.0;
         |  while ($i < $n && $j < $m) {
         |    long $ki = $ak.getLong($i);
         |    long $kj = $bk.getLong($j);
         |    if ($ki == $kj) {
         |      $acc += $av.getDouble($i) * $bv.getDouble($j);
         |      $i++; $j++;
         |    }
         |    else if ($ki < $kj) $i++;
         |    else $j++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(aKeys = newFirst, aVals = newSecond, bKeys = newThird, bVals = newFourth)
}

object ArrayOps {
  private def expr2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused cosine similarity; accepts array<float> or array<double>. */
  def cosineSim(a: Column, b: Column): Column = expr2(CosineSimilarity)(a, b)

  /** Plain dot product (no norms). */
  def dot(a: Column, b: Column): Column = expr2(DotProduct)(a, b)

  /** Jaccard of two sorted-ascending long arrays. */
  def jaccardSorted(a: Column, b: Column): Column = expr2(JaccardSortedLongs)(a, b)

  /** Mean unsigned-byte value of a binary column. */
  def byteMean(a: Column): Column =
    ColumnBridge.column(ByteMean(ColumnBridge.expression(a)))

  def byteHistogram(a: Column): Column =
    ColumnBridge.column(ByteHistogram(ColumnBridge.expression(a)))

  /** Indices of the k most cosine-similar centroid rows for each vector. */
  def argTopKCosine(vec: Column, centroids: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(ArgTopKCosine(ColumnBridge.expression(vec), centroids, k))

  /** PQ codes + squared reconstruction error against literal codebooks. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  /** Sparse dot of two (sorted long keys, aligned double values) vectors. */
  def sparseDotSorted(aKeys: Column, aVals: Column,
                      bKeys: Column, bVals: Column): Column =
    ColumnBridge.column(SparseDotSortedLongs(
      ColumnBridge.expression(aKeys), ColumnBridge.expression(aVals),
      ColumnBridge.expression(bKeys), ColumnBridge.expression(bVals)))

  /** Membership probe of a long column against a pre-built Bloom filter. */
  def bloomMightContainLong(c: Column,
                            bf: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(c), bf))
}
