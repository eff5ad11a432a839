package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** Column-level entry points for the expressions above. */
object ArrayOps {
  private def expr2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused cosine similarity; accepts array<float> or array<double>. */
  def cosineSim(a: Column, b: Column): Column = expr2(CosineSimilarity)(a, b)

  /** Plain dot product (no norms). */
  def dot(a: Column, b: Column): Column = expr2(DotProduct)(a, b)

  /** Jaccard of two sorted-ascending long arrays. */
  def jaccardSorted(a: Column, b: Column): Column = expr2(JaccardSortedLongs)(a, b)
}
