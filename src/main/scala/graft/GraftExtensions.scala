package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions so they are usable from `spark.sql`
  * (and from any BI/SQL surface attached to the session), not only from
  * the Column API in `ArrayOps`/`TextOps`.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `GraftExtensions.register(spark)` on a live
  * session (used by GraftSession so every engine session has them).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableDefinitions.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
    // the GRAFT write verbs (plans.GraftSql) as first-class SQL text:
    // non-GRAFT statements delegate to the session parser untouched.
    // Parser injection only happens at session BUILD time, so sessions
    // handed to us pre-built reach the same verbs via GraftSql.run.
    ext.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")
    f(args)
  }

  /** Plan-shaping parameters must be literals; fail with a clear message
    * instead of eval()-ing an unresolved expression (internal error).
    */
  private def intLiteral(fn: String, param: String, e: Expression): Int = {
    require(e.foldable, s"$fn: argument '$param' must be an integer literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  /** The numeric element type at nesting `depth` of an array literal,
    * with a $fn-prefixed error (not a bare ClassCastException) when the
    * SQL author passes the wrong nesting.
    */
  private def elementTypeAtDepth(fn: String, param: String, t: DataType,
                                 depth: Int): DataType = {
    var cur = t
    (1 to depth).foreach { d =>
      cur match {
        case ArrayType(e, _) => cur = e
        case other => throw new IllegalArgumentException(
          s"$fn: '$param' must be a $depth-level nested array literal; " +
            s"found $other at nesting level $d")
      }
    }
    cur
  }

  /** Eval a foldable array literal after validating its nesting depth. */
  private def literalArrayData(fn: String, param: String, e: Expression,
                               depth: Int): ArrayData = {
    require(e.foldable, s"$fn: argument '$param' must be a literal")
    elementTypeAtDepth(fn, param, e.dataType, depth)
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0,
      s"$fn: '$param' must be a non-empty literal")
    ad
  }

  /** One numeric cell, promoting every SQL numeric literal type —
    * including the DecimalType that plain fractional literals like 0.5
    * parse to — so SQL authors don't need d-suffixes.
    */
  private def numericCell(fn: String, t: DataType, row: ArrayData, j: Int): Double =
    t match {
      case DoubleType => row.getDouble(j)
      case FloatType => row.getFloat(j).toDouble
      case IntegerType => row.getInt(j).toDouble
      case LongType => row.getLong(j).toDouble
      case ShortType => row.getShort(j).toDouble
      case d: DecimalType => row.getDecimal(j, d.precision, d.scale).toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: unsupported element type $other")
    }

  /** A 2-level numeric array literal as a dense matrix. */
  private def literalMatrix(fn: String, param: String,
                            e: Expression): Array[Array[Double]] = {
    val md = literalArrayData(fn, param, e, depth = 2)
    val cellType = elementTypeAtDepth(fn, param, e.dataType, 2)
    (0 until md.numElements()).map { i =>
      val row = md.getArray(i)
      (0 until row.numElements()).map(numericCell(fn, cellType, row, _)).toArray
    }.toArray
  }

  /** (name, info, builder) for every graft SQL function. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - fused cosine over numeric arrays"),
      arity("cosine_similarity", 2)(a => CosineSimilarity(a(0), a(1))) _),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of numeric arrays"),
      arity("dot_product", 2)(a => DotProduct(a(0), a(1))) _),
    ("byte_mean",
      info("byte_mean", "byte_mean(bin) - mean unsigned byte value of a binary column"),
      arity("byte_mean", 1)(a => ByteMean(a.head)) _),
    ("argtopk_cosine",
      info("argtopk_cosine",
        "argtopk_cosine(vec, matrix, k) - indices of the k most cosine-similar rows of a literal matrix"),
      arity("argtopk_cosine", 3) { a =>
        val centroids = literalMatrix("argtopk_cosine", "matrix", a(1))
        ArgTopKCosine(a.head, centroids, intLiteral("argtopk_cosine", "k", a(2)))
      } _),
    ("pq_encode",
      info("pq_encode",
        "pq_encode(vec, codebooks) - product-quantization codes + squared reconstruction error against a literal m x ksub x dsub codebook tensor"),
      arity("pq_encode", 2) { a =>
        val td = literalArrayData("pq_encode", "codebooks", a(1), depth = 3)
        val cellType = elementTypeAtDepth("pq_encode", "codebooks", a(1).dataType, 3)
        val books = (0 until td.numElements()).map { m =>
          val book = td.getArray(m)
          (0 until book.numElements()).map { c =>
            val cw = book.getArray(c)
            (0 until cw.numElements())
              .map(numericCell("pq_encode", cellType, cw, _)).toArray
          }.toArray
        }.toArray
        PqEncode(a.head, books)
      } _),
    ("jaccard_sorted",
      info("jaccard_sorted", "jaccard_sorted(a, b) - Jaccard of two sorted bigint arrays"),
      arity("jaccard_sorted", 2)(a => JaccardSortedLongs(a(0), a(1))) _),
    ("sparse_dot_sorted",
      info("sparse_dot_sorted",
        "sparse_dot_sorted(aKeys, aVals, bKeys, bVals) - merge-walk dot of two key-sorted sparse vectors"),
      arity("sparse_dot_sorted", 4)(a =>
        SparseDotSortedLongs(a(0), a(1), a(2), a(3))) _),
    ("shingle_hash_set",
      info("shingle_hash_set", "shingle_hash_set(text, n) - sorted distinct n-gram shingle hashes"),
      arity("shingle_hash_set", 2) { a =>
        ShingleHashSet(a.head, intLiteral("shingle_hash_set", "n", a(1)))
      } _),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(hashes, numPerm) - MinHash signature"),
      arity("minhash_signature", 2) { a =>
        MinHashSignature(a.head, intLiteral("minhash_signature", "numPerm", a(1)))
      } _),
    ("simhash64",
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of a hash array"),
      arity("simhash64", 1)(a => SimHash64(a.head)) _),
    ("rolling_fingerprint",
      info("rolling_fingerprint", "rolling_fingerprint(text) - polynomial rolling hash mod 1e9+7"),
      arity("rolling_fingerprint", 1)(a => RollingFingerprint(a.head)) _),
    ("subword_count",
      info("subword_count",
        "subword_count(text) - BPE-style pre-token segment count, one text scan"),
      arity("subword_count", 1)(a => SubwordCount(a.head)) _),
    ("repetition_stats",
      info("repetition_stats",
        "repetition_stats(text) - [dup_word_frac, top_bigram_frac] in one text scan"),
      arity("repetition_stats", 1)(a => RepetitionStats(a.head)) _),
    ("marker_hits",
      info("marker_hits",
        "marker_hits(text, 'w1,w2;w3,w4') - per-set counts of whole-word marker matches, one text scan"),
      arity("marker_hits", 2) { a =>
        require(a(1).foldable, "marker_hits: argument 'markers' must be a string literal")
        val spec = a(1).eval().toString
        MarkerHits(a.head, spec.split(';').toSeq.map(_.split(',').toSeq.map(_.trim)))
      } _))

  /** SQL TABLE functions — the `spark.sql`-reachable surface of the
    * lakehouse verbs (the kernels above cover scalar SQL; these cover
    * the manifest layer): `graft_history('dir')` is DESCRIBE HISTORY,
    * `graft_snapshot('dir', v)` is a DV-aware time-travel read
    * (v = -1 → latest). Both resolve eagerly at analysis time — the
    * layout dir must be a literal, exactly like a table name — and
    * return the SAME plans the Scala APIs build, so q384/q378's
    * semantics carry over verbatim.
    */
  private def stringLiteral(fn: String, param: String, e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: argument '$param' must be a string literal")
    e.eval().toString
  }

  val tableDefinitions: Seq[(String, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_history",
      info("graft_history",
        "graft_history(dir) - DESCRIBE HISTORY of a graft manifest layout"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_history expects 1 argument, got ${args.length}")
        val dir = stringLiteral("graft_history", "dir", args.head)
        graft.operators.Manifest
          .history(org.apache.spark.sql.SparkSession.active, dir)
          .queryExecution.analyzed
      }),
    ("graft_snapshot",
      info("graft_snapshot",
        "graft_snapshot(dir, version) - DV-aware time-travel read of a graft manifest layout (version -1 = latest)"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_snapshot expects 2 arguments, got ${args.length}")
        val dir = stringLiteral("graft_snapshot", "dir", args.head)
        val v = intLiteral("graft_snapshot", "version", args(1))
        graft.operators.Manifest
          .readWithDeletes(org.apache.spark.sql.SparkSession.active, dir, v)
          .drop("__file", "__pos")
          .queryExecution.analyzed
      }),
    ("graft_detail",
      info("graft_detail",
        "graft_detail(dir) - DESCRIBE DETAIL of a graft manifest layout (one row: version, op, n_files, n_partitions, n_dv_deltas, checkpoint_version)"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_detail expects 1 argument, got ${args.length}")
        val dir = stringLiteral("graft_detail", "dir", args.head)
        graft.operators.Manifest
          .detail(org.apache.spark.sql.SparkSession.active, dir)
          .queryExecution.analyzed
      }),
    ("graft_changes",
      info("graft_changes",
        "graft_changes(dir, from, to) - change data feed of a graft manifest layout between two versions (rows tagged insert/delete in _change)"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_changes expects 3 arguments, got ${args.length}")
        val dir = stringLiteral("graft_changes", "dir", args.head)
        val from = intLiteral("graft_changes", "from", args(1))
        val to = intLiteral("graft_changes", "to", args(2))
        graft.operators.Manifest
          .changesBetween(org.apache.spark.sql.SparkSession.active, dir,
            from, to)
          .queryExecution.analyzed
      }))

  /** Register on an already-built session. Truly idempotent: a name
    * that is already present is left alone (re-registering would emit a
    * "function replaced" WARN per call site — `GraftSession.tune` runs
    * on every query, so a battery run would spray hundreds of them
    * through PlanAudit output).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, inf, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id))
        registry.registerFunction(id, inf, builder)
    }
    // Typed aggregators go through the udf registry (they are udafs,
    // not expression builders) but land in the same session registry,
    // so the same exists-check applies.
    if (!registry.functionExists(FunctionIdentifier("vec_mean")))
      spark.udf.register("vec_mean",
        org.apache.spark.sql.functions.udaf(new graft.functions.VecMeanAggregator))
    // table functions land in their OWN registry
    val tables = spark.sessionState.tableFunctionRegistry
    tableDefinitions.foreach { case (name, inf, builder) =>
      val id = FunctionIdentifier(name)
      if (!tables.functionExists(id))
        tables.registerFunction(id, inf, builder)
    }
  }
}
