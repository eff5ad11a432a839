package graft

import graft.expressions.ArrayOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The custom codegen expressions must agree with the interpreted
  * built-in formulations they replace (which in turn were oracle-checked
  * against DuckDB), in both codegen and interpreted (eval) modes.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.5f, -1.5f, 0.5f), Array(2.5f, -1.5f, 0.5f))
  ).toDF("id", "a", "b")

  test("CosineSimilarity matches the zip_with/aggregate formulation") {
    def refCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val ad = transform($"a", x => x.cast("double"))
    val bd = transform($"b", x => x.cast("double"))
    val rows = vecs
      .select($"id", ArrayOps.cosineSim($"a", $"b").as("fast"), refCosine(ad, bd).as("ref"))
      .collect()
    rows.foreach { case Row(_, fast: Double, ref: Double) =>
      assert(math.abs(fast - ref) < 1e-12, s"fast=$fast ref=$ref")
    }
  }

  test("CosineSimilarity known values") {
    val out = vecs.select($"id", round(ArrayOps.cosineSim($"a", $"b"), 6).as("c"))
      .orderBy($"id").as[(Long, Double)].collect()
    assert(out(1)._2 === 0.0)   // orthogonal
    assert(out(2)._2 === 1.0)   // identical
    assert(math.abs(out(0)._2 - 0.974632) < 1e-6)
  }

  test("CosineSimilarity interpreted eval agrees with codegen") {
    val e = graft.expressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("JaccardSortedLongs matches array_intersect formulation and handles disjoint/equal") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L)),   // 2/6
      (Array(1L, 2L), Array(3L, 4L)),                   // 0
      (Array(7L, 8L, 9L), Array(7L, 8L, 9L))            // 1
    ).toDF("a", "b")
    val ref = {
      val inter = size(array_intersect($"a", $"b")).cast("double")
      inter / (size($"a") + size($"b") - inter)
    }
    val rows = df.select(ArrayOps.jaccardSorted($"a", $"b").as("fast"), ref.as("ref")).collect()
    rows.foreach { case Row(fast: Double, ref: Double) => assert(fast === ref) }
    val vals = rows.map(_.getDouble(0))
    assert(vals(0) === 2.0 / 6.0 && vals(1) === 0.0 && vals(2) === 1.0)
  }

  test("SparseDotSortedLongs: merge-walk values, disjoint/empty → 0.0, SQL surface") {
    GraftSession.tune(spark)
    val df = Seq(
      (Array(1L, 3L, 5L), Array(0.5, 0.25, 0.125),
        Array(3L, 5L, 7L), Array(2.0, 4.0, 8.0)),              // 0.25·2 + 0.125·4 = 1.0
      (Array(1L, 2L), Array(1.0, 1.0), Array(3L, 4L), Array(1.0, 1.0)), // disjoint
      (Array.empty[Long], Array.empty[Double],
        Array(1L), Array(2.0))                                 // empty side
    ).toDF("ka", "wa", "kb", "wb")
    val vals = df.select(ArrayOps.sparseDotSorted($"ka", $"wa", $"kb", $"wb"))
      .collect().map(_.getDouble(0)).toSeq
    assert(vals === Seq(1.0, 0.0, 0.0))
    // Same kernel on the SQL surface (GraftExtensions registration).
    val sql = spark.sql(
      "SELECT sparse_dot_sorted(array(1L, 3L), array(0.5d, 2.0d), " +
        "array(3L), array(10.0d)) AS d").head().getDouble(0)
    assert(sql === 20.0)
  }

  test("SparseDotSortedLongs: keys/values length mismatch → NULL; eval == codegen") {
    val bad = Seq((Array(1L, 2L), Array(1.0), Array(1L), Array(1.0)))
      .toDF("ka", "wa", "kb", "wb")
    assert(bad.select(ArrayOps.sparseDotSorted($"ka", $"wa", $"kb", $"wb"))
      .collect()(0).isNullAt(0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val e = graft.expressions.SparseDotSortedLongs(
      Literal.create(Seq(1L, 3L, 5L), ArrayType(LongType)),
      Literal.create(Seq(0.5, 0.25, 0.125), ArrayType(DoubleType)),
      Literal.create(Seq(3L, 5L, 7L), ArrayType(LongType)),
      Literal.create(Seq(2.0, 4.0, 8.0), ArrayType(DoubleType)))
    assert(e.eval(null).asInstanceOf[Double] === 1.0)
  }

  test("ShingleHashSet kernel == sort_array(array_distinct(xxhash64(shingle strings)))") {
    import graft.functions.TextFunctions
    import graft.expressions.TextOps
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                    // shorter than n → whole-text hash
      "x y z x y z x y z"       // duplicate shingles collapse
    ).toDF("text")
    val rows = df.select(
      TextOps.shingleHashSet($"text", 3).as("fast"),
      sort_array(array_distinct(TextFunctions.shingleHashes(
        TextFunctions.shingles($"text", 3)))).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("wordBigrams / wordBigramStructs / shingles: brute force on edge " +
      "cases (1 word, 2 words, repeats, empty string, null)") {
    import graft.functions.TextFunctions
    val cases = Seq(
      Some("the quick brown fox"), Some("a b"), Some("solo"),
      Some("x y x y x"), Some(""), None)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id",
        TextFunctions.wordBigrams($"text").as("bi"),
        TextFunctions.wordBigramStructs($"text").as("bs"),
        TextFunctions.shingles($"text", 3).as("sh"))
      .orderBy("id").collect()
    cases.zip(got).foreach { case (t, row) =>
      t match {
        case None =>
          // split(NULL) is NULL → zip_with(NULL,...) is NULL; shingles'
          // short-doc fallback array(text) makes NULL text [NULL]
          // (pre-existing contract — size(NULL) = -1 under legacy
          // sizeOfNull takes the otherwise branch).
          assert(row.isNullAt(1) && row.isNullAt(2))
          assert(row.getSeq[String](3) === Seq(null))
        case Some(s) =>
          val w = s.split(" ", -1)
          val expBi = (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}")
          assert(row.getSeq[String](1) === expBi, s"'$s' bigrams")
          val expBs = (0 until w.length - 1).map(i => (w(i), w(i + 1)))
          assert(row.getSeq[org.apache.spark.sql.Row](2)
            .map(r => (r.getString(0), r.getString(1))) === expBs, s"'$s'")
          val expSh =
            if (w.length < 3) Seq(s)
            else (0 until w.length - 2)
              .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
          assert(row.getSeq[String](3).sorted === expSh.sorted, s"'$s'")
      }
    }
  }

  test("MinHashSignature kernel == the transform/array_min formulation") {
    import graft.functions.TextFunctions
    import graft.expressions.TextOps
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val hs = TextOps.shingleHashSet($"text", 3)
    val rows = df.select(
      TextOps.minhashSignature(hs, 64).as("fast"),
      TextFunctions.minhashSignature(hs, 64).as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("RollingFingerprint kernel == the SQL aggregate recurrence") {
    import graft.expressions.TextOps
    val df = Seq("hello world", "a", "").toDF("text")
    val sqlForm = expr(
      "aggregate(transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1))), " +
        "0L, (acc, c) -> (acc * 31 + c) % 1000000007)")
    val rows = df.select(TextOps.fingerprint($"text").as("fast"), sqlForm.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("expressions survive null inputs") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    val out = df.select(ArrayOps.cosineSim($"a", $"b")).collect()
    assert(out.head.isNullAt(0))
  }

  test("ByteMean kernel == the SQL aggregate formulation; empty → 0.0; null → null") {
    val df = Seq(Some("hello world"), Some("a"), Some(""), None)
      .toDF("text").select($"text".cast("binary").as("payload"))
    val sqlForm = expr(
      "CASE WHEN octet_length(payload) = 0 THEN 0.0 ELSE " +
        "aggregate(transform(sequence(1, octet_length(payload)), " +
        "i -> ascii(substr(cast(payload as string), i, 1))), " +
        "0L, (acc, c) -> acc + c) / cast(octet_length(payload) as double) END")
    val rows = df.select(ArrayOps.byteMean($"payload").as("fast"), sqlForm.as("ref")).collect()
    rows.init.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), r.toString)
    }
    assert(rows.last.isNullAt(0))
  }

  test("ArgTopKCosine == the array_sort struct formulation (random vectors, ties, all k)") {
    val rnd = new scala.util.Random(42)
    val nlist = 16; val dim = 8
    val centroids = Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian()))
    val data = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val vd = transform($"v", x => x.cast("double"))
    for (k <- Seq(1, 3, nlist)) {
      val rows = data.select(
        ArrayOps.argTopKCosine(vd, centroids, k).as("fast"),
        graft.operators.Similarity.sortFormBuckets(centroids)(vd, k).as("ref")).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k: $r"))
    }
    // exact-tie ordering: a duplicated centroid must surface the LARGER
    // index first (reverse-of-ascending struct sort semantics)
    val dup = centroids.take(4) ++ Array(centroids(0).clone())
    val tied = data.limit(20).select(
      ArrayOps.argTopKCosine(vd, dup, 2).as("fast"),
      graft.operators.Similarity.sortFormBuckets(dup)(vd, 2).as("ref")).collect()
    tied.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString))
  }

  test("ArgTopKCosine: dimension mismatch → null; interpreted eval agrees with codegen") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(Array(1.0, 2.0, 3.0)).toDF("v")
    assert(df.select(ArrayOps.argTopKCosine($"v", centroids, 1)).head.isNullAt(0))
    val e = graft.expressions.ArgTopKCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      centroids, 2)
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq === Seq(0L, 1L))
  }

  test("PqEncode: codes + sq_err match a Scala recompute; ties take lowest index; dim mismatch → null") {
    val rnd = new scala.util.Random(7L)
    val m = 4; val dsub = 3; val ksub = 5
    val books = Array.fill(m, ksub, dsub)(rnd.nextDouble() * 2 - 1)
    val vecs = Seq.fill(20)(Seq.fill(m * dsub)(rnd.nextDouble() * 2 - 1))
    val got = vecs.toDF("v")
      .select(graft.expressions.ArrayOps.pqEncode($"v", books).as("pq"))
      .select($"pq.codes", $"pq.sq_err")
      .as[(Seq[Long], Double)].collect()
    vecs.zip(got).foreach { case (v, (codes, err)) =>
      var expErr = 0.0
      val expCodes = (0 until m).map { j =>
        val ds = books(j).map { cw =>
          (0 until dsub).map(t => math.pow(v(j * dsub + t) - cw(t), 2)).sum
        }
        val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
        expErr += best._1
        best._2.toLong
      }
      assert(codes === expCodes)
      assert(math.abs(err - expErr) < 1e-9)
    }
    // duplicate codewords: the tie must resolve to the LOWEST index
    val dup = Array(Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(9.0, 9.0)))
    val tied = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(graft.expressions.ArrayOps.pqEncode($"v", dup).getField("codes"))
      .as[Seq[Long]].head()
    assert(tied === Seq(0L))
    // wrong dimension → null
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(graft.expressions.ArrayOps.pqEncode($"v", dup).as("pq"))
      .collect()
    assert(bad.head.isNullAt(0))
  }

  test("RepetitionStats: hand-computed fractions and string_split edge semantics") {
    import graft.expressions.TextOps
    val rows = Seq(
      "a b a b a",      // 5 words, 2 distinct → dup 3/5; bigrams ab,ba,ab,ba → top 2/4
      "x",              // single word: dup 0, no bigrams → 0
      "",               // string_split('') = [''] → 1 (empty) word
      "w w w w")        // dup 3/4; bigrams ww ×3 → top 3/3
      .toDF("text")
    val out = rows.select(TextOps.repetitionStats($"text").as("r"))
      .collect().map(r => r.getSeq[Double](0))
    assert(out(0) === Seq(0.6, 0.5))
    assert(out(1) === Seq(0.0, 0.0))
    assert(out(2) === Seq(0.0, 0.0))
    assert(out(3) === Seq(0.75, 1.0))
  }

  test("ByteHistogram: Scala reference equality incl. high bytes; empty; sums to length") {
    val data = Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, Array[Byte](0, -1, -128, 127, -1, 0)), // high bytes must land in 128..255
      (3L, Array.emptyByteArray),
      (4L, "日本語テキスト".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val got = data.select(col("id"),
        graft.expressions.ArrayOps.byteHistogram(col("payload")).as("h"))
      .as[(Long, Array[Long])].collect().toMap
    def ref(bs: Array[Byte]): Array[Long] = {
      val h = new Array[Long](256); bs.foreach(b => h(b & 0xff) += 1); h
    }
    Seq(1L -> "hello world".getBytes("UTF-8"),
      2L -> Array[Byte](0, -1, -128, 127, -1, 0),
      3L -> Array.emptyByteArray,
      4L -> "日本語テキスト".getBytes("UTF-8")).foreach { case (id, bs) =>
      assert(got(id).toSeq === ref(bs).toSeq, s"id=$id")
      assert(got(id).sum === bs.length.toLong)
    }
    assert(got(2L)(255) === 2L && got(2L)(128) === 1L && got(2L)(0) === 2L)
  }

  test("CdcChunks: Scala reference equality, reconstruction, shift-robustness") {
    val W = 8; val MASK = 64L; val M = 1000000007L; val B = 31L
    def ref(s: String): Seq[(Long, Long, Long, Long)] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      val bw = (1 to W).foldLeft(1L)((a, _) => a * B % M)
      var h = 0L
      val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- 0 until n) {
        h = (h * B + cps(i)) % M
        if (i >= W) h = ((h - cps(i - W) * bw) % M + M) % M
        if (i + 1 >= W && h % MASK == 0 && i + 1 < n) bounds += (i + 1)
      }
      val starts = 1 +: bounds.map(_ + 1)
      starts.zipWithIndex.map { case (st, k) =>
        val end = if (k + 1 < starts.length) starts(k + 1) - 1 else n
        val fp = (st - 1 until end).foldLeft(0L)((a, p) => (a * B + cps(p)) % M)
        ((k + 1).toLong, st.toLong, (end - st + 1).toLong, fp)
      }.toSeq
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight again",
      "short", "", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa") ++
      Tables.load(spark, sfDir, "documents").select("text")
        .limit(50).as[String].collect().toSeq
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        explode(graft.expressions.TextOps.cdcChunks(col("text"), W, MASK)).as("c"))
      .select(col("id"), col("c.chunk_no"), col("c.c_start"), col("c.c_len"),
        col("c.fp"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5)).sortBy(_._1).toSeq)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t), s"text #$i diverged from reference")
      // Chunks must tile the text exactly: starts/lengths reconstruct it.
      val chunks = got(i.toLong)
      assert(chunks.map(_._3).sum === t.codePointCount(0, t.length).toLong)
      chunks.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + a._3 === b._2, "chunks must be contiguous")
        case _ => ()
      }
    }
    // Shift-robustness: prepending text realigns at the next content
    // boundary — the suffix chunks keep their fingerprints (fixed-width
    // chunking would shift every one of them).
    val base = texts.head
    val shifted = "INSERTED PREFIX " + base
    val fpBase = ref(base).map(_._4)
    val fpShift = ref(shifted).map(_._4)
    assert(fpBase.intersect(fpShift).nonEmpty,
      "no shared chunk fingerprints after a prefix edit - chunking is not content-defined")
  }

  test("AhoCorasickCounts: overlap, cross-pattern, case folding, and a brute-force referee") {
    import graft.expressions.TextOps
    def run(text: String, pats: Seq[String]): Seq[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(TextOps.ahoCorasickCounts(org.apache.spark.sql.functions.col("t"), pats))
        .as[Seq[Long]].head()
    // overlapping self-bordered hits ALL count: "ababa" holds "aba" at
    // offsets 0 and 2 (a split-based counter reports 1 — why the
    // oracle-gated q326 restricts itself to borderless patterns)
    assert(run("ababa", Seq("aba")) === Seq(2L))
    // two patterns overlapping EACH OTHER both count; word boundaries
    // are irrelevant (the MarkerHits contrast)
    assert(run("xbuy cheap nowz", Seq("buy cheap", "cheap now")) === Seq(1L, 1L))
    // case folds on the text side
    assert(run("BUY CHEAP twice buy cheap", Seq("buy cheap")) === Seq(2L))
    // brute-force referee on seeded random small-alphabet strings,
    // patterns WITH borders (the hard overlap case)
    val rnd = new scala.util.Random(42)
    val pats = Seq("aa", "aba", "abab", "ba", "c")
    (1 to 30).foreach { _ =>
      val text = (1 to 200).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
      val want = pats.map { p =>
        var c = 0L; var i = text.indexOf(p)
        while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
        c
      }
      assert(run(text, pats) === want, s"referee mismatch on $text")
    }
  }
}
