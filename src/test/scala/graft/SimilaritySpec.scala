package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Brute-force top-k is the ground truth; the IVF approximate path is
  * graded by recall against it (the oracle can't check an approximate
  * operator, so its contract lives here).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK: hand-checkable 2-d example") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Double)].collect()
    // Nearest to (1,0): (0.9,0.1) then (0,1); the antipode is excluded by k.
    assert(out.map(r => (r._2, r._3)).toSeq === Seq((1L, 1L), (2L, 2L)))
  }

  test("ivfTopK recall >= 0.9 vs brute force on sf0.001 embeddings") {
    // The synthetic embeddings are ISOTROPIC (no cluster structure), the
    // adversarial case for IVF: recall here is pure trained-centroid +
    // multi-assignment quality, with zero help from the data.
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9 (|exact|=${exact.size})")
  }

  test("q250 MaxSim: window top-k equals the brute-force late-interaction " +
      "scorer; MaxSim(q,q) slices to 4.0") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def maxsim(q: Array[Double], d: Array[Double]): Double =
      (0 until 4).map { i =>
        (0 until 4).map { j =>
          cos(q.slice(16 * i, 16 * i + 16), d.slice(16 * j, 16 * j + 16))
        }.max
      }.sum
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      vecs.toSeq.filter(_._1 != qid)
        .map { case (nid, v) => (nid, maxsim(vecs(qid), v)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((nid, s), r) =>
          (qid, r + 1L, nid, math.rint(s * 1e6) / 1e6) }
    }
    val got = SparkEntry.queries("q250_maxsim_topk")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ===
      expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 2e-6, s"${g._1}/${g._3}") }
    // identity law: every slice matches itself exactly
    vecs.keys.take(3).foreach { id =>
      assert(math.abs(maxsim(vecs(id), vecs(id)) - 4.0) < 1e-9)
    }
  }

  test("ivfTopK ranks are dense and unique per query") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val out = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "rank").as[(Long, Long)].collect()
    // Multi-assignment must not double-count a neighbor: ranks 1..5 once.
    out.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"query $qid ranks ${rs.toSeq}")
    }
  }

  test("RHP-LSH pairs: recall >= 0.9 vs exact pairs, precision 1.0 (verified)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.rhpCosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert((lsh -- exact).isEmpty, "verification must kill false positives")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"RHP recall $recall < 0.9 (|exact|=${exact.size})")
  }

  test("rhpCosinePairs: salting-invariant under a forced hot-band re-salt") {
    // Default params on sf0.001 leave every band under the 4096-row cap
    // (census collects nothing); maxBandRows=2 forces the proportional
    // re-salt path on essentially every band key. The candidate set must
    // be identical either way — each (a,b) pair meets exactly once under
    // the a-salted/b-replicated scheme — so the output cannot move.
    val e = Tables.load(spark, sfDir, "embeddings")
    val cold = Similarity.rhpCosinePairs(e, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val hot = Similarity.rhpCosinePairs(e, "vec_id", "embedding", 0.4,
        saltBuckets = 4, maxBandRows = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(cold.nonEmpty)
    assert(cold === hot)
  }

  test("RHP-LSH is exact in the planted-duplicate regime (q49 contract)") {
    // Identical vectors agree on every sign bit ⇒ they collide in every
    // band ⇒ recall is exactly 1.0; exact-cosine verification kills all
    // band false positives ⇒ output ≡ exact pairs at the threshold.
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = e.unionAll(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
    val lsh = Similarity.rhpCosinePairs(planted, "vec_id", "embedding",
        threshold = 0.9, bands = 8, rowsPerBand = 16)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.cosinePairs(planted, "vec_id", "embedding",
        threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh === exact)
    assert(exact.size === 25 && exact.forall(_._3 === 1.0),
      s"expected the 25 planted identity pairs, got ${exact.size}")
  }

  test("sparseCosinePairs: hand fixture — exact dups 1.0, partial trigram overlap, short-doc fallback, NULL text") {
    val docs = Seq(
      (1L, "a b c d"),                  // trigrams: "a b c", "b c d"
      (2L, "a b c d"),                  // exact dup of 1
      (3L, "a b c x"),                  // shares "a b c" with 1/2
      (4L, "p q"),                      // < 3 words → whole-text feature
      (5L, "p q"),                      // exact dup of 4
      (6L, null.asInstanceOf[String])   // no vector at all
    ).toDF("doc_id", "text")
    val out = Similarity.sparseCosinePairs(docs, "doc_id", "text", threshold = 0.05)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(out((1L, 2L)) === 1.0 && out((4L, 5L)) === 1.0)
    // Hand-computed 1↔3: smooth idf over N=6 docs; "a b c" df=3,
    // "b c d" df=2, "b c x" df=1, tf=1 everywhere.
    def idf(df: Int) = math.log(7.0 / (df + 1)) + 1
    val expected = BigDecimal(idf(3) * idf(3) /
        (math.sqrt(idf(3) * idf(3) + idf(2) * idf(2)) *
         math.sqrt(idf(3) * idf(3) + idf(1) * idf(1))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, 3L)) === expected && out((2L, 3L)) === expected)
  }

  test("sparseCosinePairs ≡ the naive shared-term join (no prefix filter) on sf0.001") {
    // Prefix filtering is pruning, not approximation: the full
    // inverted-index join with identical featurization must produce the
    // identical pair set. (The DuckDB oracle states the same property;
    // this pins it in-JVM at spec time.)
    val d = Tables.load(spark, sfDir, "documents")
    val out = Similarity.sparseCosinePairs(d, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val wArr = split(col("text"), " ")
    val grams = when(size(wArr) >= 3,
        transform(sequence(lit(0), size(wArr) - 3),
          i => array_join(slice(wArr, i + 1, lit(3)), " ")))
      .otherwise(array(col("text")))
    val tf = d.select(col("doc_id").as("id"), explode(grams).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val nd = d.count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val tw = tf.join(dfreq, "term").select(col("id"), col("term"), (col("tf") *
      (log((lit(nd) + 1).cast("double") / (col("df") + 1)) + 1)).as("tw"))
    val nrm = tw.groupBy("id").agg(sqrt(sum(col("tw") * col("tw"))).as("nn"))
    val v = tw.join(nrm, "id")
      .select(col("id"), col("term"), (col("tw") / col("nn")).as("w"))
    val ref = v.as("x").join(v.as("y"),
        col("x.term") === col("y.term") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(round(sum(col("x.w") * col("y.w")), 6).as("cos"))
      .filter(col("cos") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(out.nonEmpty)
    assert(out === ref)
  }

  test("sparseCosinePairs: salting-invariant under a forced hot-term re-salt") {
    // maxTermRows=2 pushes essentially every shared trigram through the
    // census; the full-side-salted/prefix-side-replicated scheme meets
    // each (full, prefix) row pair exactly once, so the candidate set —
    // and the output — cannot move.
    val d = Tables.load(spark, sfDir, "documents")
    val cold = Similarity.sparseCosinePairs(d, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val hot = Similarity.sparseCosinePairs(d, "doc_id", "text", 0.8,
        saltBuckets = 4, maxTermRows = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(cold.nonEmpty)
    assert(cold === hot)
  }

  test("vocab rank: the distributed two-phase rank ≡ the single-window rank on the real trigram dfreq") {
    import org.apache.spark.sql.expressions.Window
    // The exact (df, term) relation q119 ranks — built the operator's
    // way (word trigrams, short-doc whole-text fallback) — must get
    // IDENTICAL rank values from Profile.exactRank's composite-bin
    // two-phase machinery and from the single-partition window it
    // replaced (the round-7 scale-killer).
    val d = Tables.load(spark, sfDir, "documents")
    val wArr = split(col("text"), " ")
    val grams = when(size(wArr) >= 3,
        transform(sequence(lit(0), size(wArr) - 3),
          i => array_join(slice(wArr, i + 1, lit(3)), " ")))
      .otherwise(array(col("text")))
    val dfreq = d.select(col("doc_id").as("id"), explode(grams).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val ref = dfreq.withColumn("rank",
        row_number().over(Window.orderBy(col("df").asc, col("term").asc))
          .cast("long"))
      .select("term", "df", "rank").orderBy("rank").collect().toSeq
    val got = graft.operators.Profile.exactRank(dfreq, "df", "term", "rank")
      .select("term", "df", "rank").orderBy("rank").collect().toSeq
    assert(ref.nonEmpty)
    assert(got === ref)
  }

  test("IVF layout centroids round-trip bit-exactly through the persisted model") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString
    Similarity.writeIvfLayout(e, "vec_id", "embedding", dir, nlist = 8)
    val trained = Similarity.trainIvfCentroids(e, "vec_id", "embedding", 8, iters = 10)
    val read = Similarity.readIvfCentroids(dir,
      spark.sparkContext.hadoopConfiguration)
    assert(read.length === trained.length)
    // Double.toString/parseDouble round-trips exactly — the stored model
    // IS the trained model, bit for bit (the q102 gate depends on it).
    read.zip(trained).foreach { case (r, t) => assert(r.toSeq === t.toSeq) }
  }

  test("marginMinePairs matches a Scala reference on a hand fixture") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srcRows = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
    val tgtRows = Seq((10L, Array(0.8f, 0.6f)), (11L, Array(0.6f, 0.8f)),
      (12L, Array(1f, 0.05f)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val k = 2
    // reference: rank by unrounded sim (id-asc ties), average/margin
    // over 6dp-rounded sims — the operator's documented split
    def topk(q: (Long, Array[Float]), cands: Seq[(Long, Array[Float])]) =
      cands.map(c => (c._1, cos(q._2, c._2)))
        .sortBy { case (id, s) => (-s, id) }.take(k)
    val srcAvg = srcRows.map(s => s._1 ->
      topk(s, tgtRows).map(t => round6(t._2)).sum / k).toMap
    val tgtAvg = tgtRows.map(t => t._1 ->
      topk(t, srcRows).map(s => round6(s._2)).sum / k).toMap
    val expected = srcRows.map { s =>
      val (bestId, bestSim) = topk(s, tgtRows).head
      (s._1, bestId, round6(bestSim),
        round6(2 * round6(bestSim) / (srcAvg(s._1) + tgtAvg(bestId))))
    }.filter(_._4 >= 1.0).toSet
    val got = Similarity.marginMinePairs(
        srcRows.toDF("vec_id", "embedding"), tgtRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = k, minMargin = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("appendIvfLayout: appends under the persisted model without retraining") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val base = e.filter(col("vec_id") % 5 =!= 4)
    val extra = e.filter(col("vec_id") % 5 === 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Similarity.writeIvfLayout(base, "vec_id", "embedding", dir, nlist = 8)
    val before = Similarity.readIvfCentroids(dir,
      spark.sparkContext.hadoopConfiguration)
    Similarity.appendIvfLayout(dir, extra, "vec_id", "embedding")
    // the model is untouched — an accidental retrain would shift every
    // existing vector's bucket out from under the stored layout
    val after = Similarity.readIvfCentroids(dir,
      spark.sparkContext.hadoopConfiguration)
    before.zip(after).foreach { case (b, a) => assert(b.toSeq === a.toSeq) }
    // the appended layout holds exactly the union's ids, each in its
    // nassign buckets
    val layout = spark.read.parquet(dir)
    assert(layout.select("neighbor_id").distinct().count() === e.count())
    assert(layout.count() === e.count() * 3)
    import org.apache.spark.sql.functions.countDistinct
    assert(layout.groupBy("neighbor_id")
      .agg(countDistinct("bucket").as("nb"))
      .filter(col("nb") =!= 3).count() === 0L)
  }

  test("rebalanceIvfLayout: blue/green rebuild preserves the id set and " +
      "equals an in-flight search trained on the same corpus") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val src = java.nio.file.Files.createTempDirectory("reb_src").toString
    val dst = java.nio.file.Files.createTempDirectory("reb_dst").toString
    Similarity.writeIvfLayout(e, "vec_id", "embedding", src,
      nlist = 8, nassign = 2)
    Similarity.rebalanceIvfLayout(spark, src, dst, nlist = 8, nassign = 2)
    // the stored id set survives the rebuild exactly once (dedup law)
    val ids = spark.read.parquet(dst).select("neighbor_id")
      .distinct().count()
    assert(ids === e.count(), "rebalance lost or duplicated stored ids")
    // same corpus + same deterministic training seed => the rebalanced
    // layout's search is BIT-EQUAL to an in-flight ivfTopK
    val q = e.filter($"vec_id" < 10)
    val fromLayout = Similarity.ivfTopKFromLayout(dst, q, "vec_id",
      "embedding", k = 5, nprobe = 2)
    val inFlight = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nlist = 8, nprobe = 2, nassign = 2)
    assert(fromLayout.exceptAll(inFlight).count() === 0L &&
      inFlight.exceptAll(fromLayout).count() === 0L,
      "rebalanced layout search diverged from the in-flight build")
    // in-place rebuild is refused
    val err = intercept[IllegalArgumentException] {
      Similarity.rebalanceIvfLayout(spark, src, src, nlist = 8)
    }
    assert(err.getMessage.contains("blue/green"))
  }

  test("hardNegatives excludes same-label vectors even when they are nearest") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f), "a"),   // the query itself
      (1L, Array(0.99f, 0.01f), "a"), // nearest overall but same label
      (2L, Array(0.9f, 0.1f), "b"),
      (3L, Array(0.0f, 1.0f), "b"),
      (4L, Array(0.8f, 0.2f), null.asInstanceOf[String]) // unlabeled: never a negative
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(corpus, corpus.filter($"vec_id" === 0),
        "vec_id", "embedding", "label", k = 2)
      .as[(Long, Long, Long, Double)].collect()
    // ids 0/1 (label a) and 4 (NULL) are disqualified; among label b,
    // (0.9,0.1) beats (0,1).
    assert(out.map(r => (r._2, r._3)).toSeq === Seq((1L, 2L), (2L, 3L)))
  }

  test("clusteredCosinePairs: salting-invariant and ≡ cosinePairs within clusters") {
    val e = Tables.load(spark, sfDir, "embeddings")
    // saltBuckets=1 (no fan-out) vs 8 with a cap that forces the
    // proportional re-salt path on every ~50-row label: identical output.
    val s1 = Similarity.clusteredCosinePairs(e, "vec_id", "embedding", "label",
      threshold = 0.3, saltBuckets = 1).as[(Long, Long, Double)].collect().toSet
    val s8 = Similarity.clusteredCosinePairs(e, "vec_id", "embedding", "label",
        threshold = 0.3, saltBuckets = 8, maxClusterRows = 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(s1 === s8 && s1.nonEmpty)
    // The operator is exactly cosinePairs restricted to equi-cluster
    // pairs — nothing dropped inside a cluster, nothing invented across.
    val cl = e.select(col("vec_id"), col("label"))
    val expected = Similarity.cosinePairs(e, "vec_id", "embedding", threshold = 0.3)
      .join(cl.select(col("vec_id").as("id_a"), col("label").as("la")), "id_a")
      .join(cl.select(col("vec_id").as("id_b"), col("label").as("lb")), "id_b")
      .filter(col("la") === col("lb"))
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(s1 === expected)
  }

  test("clusteredCosinePairs drops NULL-cluster rows (SQL equi-join semantics)") {
    val df = Seq((1L, Array(1f, 0f), Option("a")), (2L, Array(1f, 0f), Option("a")),
        (3L, Array(1f, 0f), Option.empty[String]), (4L, Array(1f, 0f), Option.empty[String]))
      .toDF("vec_id", "embedding", "cl")
    val out = Similarity.clusteredCosinePairs(df, "vec_id", "embedding", "cl",
      threshold = 0.9).as[(Long, Long, Double)].collect().toSet
    // NULL never equals NULL: ids 3/4 pair with nothing, matching the
    // oracle's `a.label = b.label` predicate.
    assert(out === Set((1L, 2L, 1.0)))
  }

  test("q105 keep rule: quality argmax inside a component, lowest-id tie-break") {
    import org.apache.spark.sql.functions.{count, lit, max, struct}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq((1L, 100L), (2L, 300L), (3L, 300L), (10L, 5L), (11L, 9L))
      .toDF("doc_id", "n_chars")
    val out = graft.operators.Dedup.nearDupComponents(pairs)
      .join(quality, Seq("doc_id"))
      .groupBy(col("rep_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"),
          col("doc_id"))).as("m"))
      .select(col("cluster_id"), col("n_members"),
        col("m.doc_id").as("keep_id"), col("m.n_chars").as("keep_n_chars"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // {1,2,3}: 300-char tie between 2 and 3 resolves to the LOWER id;
    // {10,11}: plain quality argmax.
    assert(out === Set((1L, 3L, 2L, 300L), (10L, 2L, 11L, 9L)))
  }

  test("subsampleBytes subsamples payload bytes deterministically") {
    val docs = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val resized = graft.operators.Multimodal.subsampleBytes(
      graft.operators.Multimodal.toMedia(docs), factor = 2).collect()
    assert(resized.head.payload.map(_.toChar).mkString === "aceg")
  }

  test("cosinePairs symmetric-free output: id_a < id_b always") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val pairs = Similarity.cosinePairs(e.limit(200), "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("q74 centroids/cohesion match a brute-force Scala recompute on sf0.001") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>"))
      .as[(Int, Seq[Double])].collect()
    val expected = rows.groupBy(_._1).toSeq.map { case (label, g) =>
      val vs = g.map(_._2.toArray)
      val n = vs.length
      val dim = vs.head.length
      val cent = Array.tabulate(dim)(i => vs.map(_(i)).sum / n)
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.map(i => a(i) * b(i)).sum
      def norm(a: Array[Double]) = math.sqrt(dot(a, a))
      val cos = vs.map(v => dot(v, cent) / (norm(v) * norm(cent)))
      (label, n.toLong, round6(norm(cent)), round6(cos.sum / n), round6(cos.min))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q74_label_centroids")(spark, sfDir)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 === e._1); assert(g._2 === e._2)
      // The Scala fold and the aggregator merge tree sum in different
      // orders; equality holds to float tolerance, not bit-exactness.
      assert(math.abs(g._3 - e._3) < 1e-9, s"label ${g._1} norm")
      assert(math.abs(g._4 - e._4) < 1e-9, s"label ${g._1} mean_cos")
      assert(math.abs(g._5 - e._5) < 1e-9, s"label ${g._1} min_cos")
    }
    assert(got.size === expected.size)
  }

  test("pqRerankTopK: recall >= 0.9 vs exact top-5; ranks dense") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.pqRerankTopK(e, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect()
    pq.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"query $qid ranks")
    }
    val byQ = pq.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      (byQ.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"PQ rerank recall $recall < 0.9")
  }

  test("ivfPqTopK: recall >= 0.85 vs exact top-5; ranks dense; deterministic") {
    // Both quantizers' adversarial case at once (isotropic data): the
    // q122 gate's 0.85 floor and the fraction-sized candidate pool are
    // pinned here at sf0.001 so a recall regression fails the suite
    // before it reaches the driver gate.
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val candidates = math.max(100L, (e.count() + 4) / 5).toInt
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def run() = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nprobe = 6, nassign = 4, candidates = candidates)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect()
    val out = run()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ===
      run().sortBy(r => (r._1, r._2)).toSeq, "ivfPqTopK must be deterministic")
    out.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"query $qid ranks")
    }
    val byQ = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      (byQ.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.85, s"IVF-PQ recall $recall < 0.85")
  }

  test("q141 JL-LSH gate is empty on sf0.001 and its half slice keeps " +
      "planted pairs") {
    assert(graft.SparkEntry.queries("q141_jl_lsh_gate")(spark, sfDir)
      .count() === 0L)
    // The sliced expected set (every 20th EVEN base id) must stay
    // non-empty or the recall law is vacuously satisfied.
    val n = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 20 === 0 && col("vec_id") % 2 === 0)
      .count()
    assert(n >= 5, s"sliced q141 fixture plants only $n pairs")
  }

  test("randomProject: deterministic, map-side, JL distortion in a sane band") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val p = Similarity.randomProject(e, "vec_id", "embedding", outDim = 16)
    assert(p.collect().toSeq === Similarity.randomProject(e, "vec_id",
      "embedding", outDim = 16).collect().toSeq, "projection must be deterministic")
    // No exchange: the projection is a pure per-row kernel.
    assert(!p.queryExecution.executedPlan.toString.contains("Exchange"),
      "randomProject must not shuffle")
    // JL sanity on the real vectors: pairwise distance ratios stay in a
    // wide-but-bounded band and center near 1 (ε≈0.5 at outDim=16 —
    // this pins "the matrix mixes", not a tight JL constant).
    import org.apache.spark.sql.expressions.Window
    val both = e.limit(40).join(p, Seq("vec_id"))
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"), col("pv"))
    val rows = both.as[(Long, Array[Double], Array[Double])].collect()
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      (ia, va, pa) <- rows; (ib, vb, pb) <- rows if ia < ib
      d0 = dist(va, vb) if d0 > 0
    } yield dist(pa, pb) / d0
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.3 && r < 1.9),
      s"ratio outside band: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean drifted from 1")
  }

  test("pqQuantize: trained codebooks beat the k=1 (global mean) distortion") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val quant = Similarity.pqQuantize(e, "vec_id", "embedding", m = 8, ksub = 16)
      .as[(Long, Seq[Long], Double)].collect()
    assert(quant.length === e.count())
    assert(quant.forall(_._2.length === 8))
    assert(quant.forall(q => q._2.forall(c => c >= 0 && c < 16)))
    val meanPqErr = quant.map(_._3).sum / quant.length
    // k=1 baseline: reconstruct every vector as the global mean
    val vs = e.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val dim = vs.head.length
    val gm = Array.tabulate(dim)(i => vs.map(_(i)).sum / vs.length)
    val meanBaseErr = vs.map(v =>
      v.indices.map(i => math.pow(v(i) - gm(i), 2)).sum).sum / vs.length
    assert(meanPqErr < meanBaseErr,
      s"PQ distortion $meanPqErr not below k=1 baseline $meanBaseErr")
  }

  test("nearestCentroid: separable clusters classify perfectly; ties break to lowest label") {
    // Three well-separated axis clusters; noise is small enough that
    // every held-out vector is nearest its own label's centroid.
    val rng = new scala.util.Random(7)
    def pt(axis: Int) = Array.tabulate(3)(i =>
      (if (i == axis) 1.0f else 0.0f) + rng.nextFloat() * 0.1f)
    val rows = for (lbl <- 0 to 2; j <- 0 until 20)
      yield (lbl * 100L + j, pt(lbl), lbl)
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroid(
        df.filter(col("vec_id") % 5 =!= 0), df.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", "label")
      .as[(Long, Int, Int, Double)].collect()
    assert(out.length === 12 && out.forall(r => r._2 == r._3))
    // Tie: two labels with IDENTICAL centroids — prediction pins to the
    // lower label, not an arbitrary one.
    val tied = Seq(
      (1L, Array(1.0f, 0.0f), 5), (2L, Array(1.0f, 0.0f), 9),
      (3L, Array(1.0f, 0.1f), 5)).toDF("vec_id", "embedding", "label")
    val t = Similarity.nearestCentroid(
        tied.filter(col("vec_id") =!= 3), tied.filter(col("vec_id") === 3),
        "vec_id", "embedding", "label")
      .as[(Long, Int, Int, Double)].collect()
    assert(t.length === 1 && t.head._3 === 5)
  }

  test("kmeansRefine: hand-computed 2-d convergence, monotone objective, unit centroids") {
    // Points split into the (1,0)-ish and (0,1)-ish half; init at the
    // axes. Round 1 objective = 1+0.8+1+0.8 = 3.6; the update moves each
    // centroid to the normalized half-mean (0.9487, 0.3162)/(0.3162,
    // 0.9487), under which every point scores 0.9487 -> round 2
    // objective 3.7947 and a fixed point thereafter.
    val pts = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.8, 0.6)),
      (3L, Array(0.0, 1.0)), (4L, Array(0.6, 0.8))
    ).toDF("vec_id", "embedding")
    val init = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val (cents, objs) = Similarity.kmeansRefine(pts, "vec_id", "embedding", init, iters = 3)
    assert(math.abs(objs(0) - 3.6) < 1e-9)
    assert(math.abs(objs(1) - 3.7947331922020545) < 1e-9)
    assert(objs.sliding(2).forall(w => w(1) >= w(0) - 1e-9), objs.toSeq.toString)
    val exp = Array(Array(0.9486832980505138, 0.31622776601683794),
      Array(0.31622776601683794, 0.9486832980505138))
    for (c <- 0 until 2; d <- 0 until 2)
      assert(math.abs(cents(c)(d) - exp(c)(d)) < 1e-9, cents.map(_.toSeq).toSeq.toString)
    for (c <- cents)
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("kmeansRefine: emptied cluster keeps its centroid; NULL vectors skipped; deterministic") {
    val pts = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, null.asInstanceOf[Array[Double]])
    ).toDF("vec_id", "embedding")
    // Centroid 1 at the antipode attracts nothing and must survive
    // unchanged (a dropped cluster would shrink the IVF model).
    val init = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val (c1, o1) = Similarity.kmeansRefine(pts, "vec_id", "embedding", init, iters = 2)
    assert(c1(1).toSeq === Seq(-1.0, 0.0))
    val (c2, o2) = Similarity.kmeansRefine(pts, "vec_id", "embedding", init, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq && o1.toSeq === o2.toSeq)
  }

  test("lloydRound plan: fused assignment kernel, map-side vector partials, one exchange") {
    val pts = Tables.load(spark, sfDir, "embeddings")
      .select(transform(col("embedding"), x => x.cast("double")).as("__u"))
    val cents = Array(Array.fill(64)(0.125), Array.tabulate(64)(i => if (i % 2 == 0) 0.17 else -0.1))
    val plan = Similarity.lloydRound(pts, cents).queryExecution.executedPlan.toString
    assert(plan.contains("argtopk_cosine"), plan.take(2000))
    assert(plan.toLowerCase.contains("partial_vecmeanaggregator"), plan.take(2000))
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2, plan.take(3000))
  }

  test("VecMeanAggregator: skips nulls, rejects mixed dimensions") {
    val vmean = udaf(new graft.functions.VecMeanAggregator)
    val ok = Seq((1, Seq(1.0, 3.0)), (1, Seq(3.0, 5.0))).toDF("g", "v")
      .union(Seq((1, null.asInstanceOf[Seq[Double]])).toDF("g", "v"))
      .groupBy("g").agg(vmean($"v").as("m"))
      .as[(Int, Seq[Double])].head()
    assert(ok._2 === Seq(2.0, 4.0))
    val err = intercept[org.apache.spark.SparkException] {
      Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0))).toDF("g", "v")
        .groupBy("g").agg(vmean($"v")).collect()
    }
    assert(err.getMessage.contains("mixed dimensions")
      || err.getCause.getMessage.contains("mixed dimensions"))
  }

  test("q189 SemDeDup-IVF gate: empty, non-vacuous (pairs exist; a " +
      "threshold skew fires the diff)") {
    import graft.operators.Similarity
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding", nlist = 8)
    val assigned = e.select($"vec_id", $"embedding",
      element_at(graft.expressions.ArrayOps.argTopKCosine(
        Similarity.asDouble($"embedding"), cents, 1), 1).as("bucket"))
    val clustered = Similarity.clusteredCosinePairs(assigned, "vec_id",
      "embedding", "bucket", threshold = 0.4)
    // the composition finds real within-cluster pairs on this corpus
    assert(clustered.count() > 0, "no within-cluster pairs - gate is vacuous")
    // the battery gate itself is empty
    assert(SparkEntry.queries("q189_semdedup_ivf_gate")(spark, sfDir)
      .count() === 0L)
    // skewing one side's threshold makes the two sides diverge — proof
    // the diff actually compares the relations
    val buckets = assigned.select($"vec_id", $"bucket")
    val exactTighter = Similarity.cosinePairs(e, "vec_id", "embedding",
        threshold = 0.45)
      .join(buckets.withColumnRenamed("vec_id", "id_a")
        .withColumnRenamed("bucket", "ba"), Seq("id_a"))
      .join(buckets.withColumnRenamed("vec_id", "id_b")
        .withColumnRenamed("bucket", "bb"), Seq("id_b"))
      .filter($"ba" === $"bb").select("id_a", "id_b", "sim")
    val diff = clustered.select("id_a", "id_b", "sim").exceptAll(exactTighter)
    assert(diff.count() > 0, "threshold skew must surface in the diff")
  }

  test("q192 matryoshka gate: empty over a real query set; prefix-only " +
      "search (no rerank) is genuinely lossier at small k") {
    import graft.operators.Similarity
    val base = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val n = base.count()
    assert(n / 20 > 0, "fixture must plant at least one clone")
    assert(SparkEntry.queries("q192_matryoshka_ann_gate")(spark, sfDir)
      .count() === 0L)
    // the 16-dim prefix ORDER differs from the full-dim order for real
    // (non-clone) queries — proof the rerank stage is load-bearing, not
    // decorative: compare top-1 under truncated vs full similarity
    def top1(vecCol: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val q = base.filter($"vec_id" < 25)
      Similarity.bruteForceTopKAgg(vecCol(base), vecCol(q), "vec_id",
          "v", k = 1)
        .select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toMap
    }
    val full = top1(d => d.select($"vec_id", $"embedding".as("v")))
    val pref = top1(d => d.select($"vec_id", slice($"embedding", 1, 16).as("v")))
    assert(full.keySet === pref.keySet)
    assert(full.exists { case (q, nb) => pref(q) != nb },
      "prefix order should differ somewhere at k=1 - otherwise the gate " +
        "could pass without the rerank and proves nothing")
  }

  test("q303 AUC: brute-force pairwise comparison equals the census " +
      "doubled-U; q304 buckets partition the corpus") {
    val rows = Tables.load(spark, sfDir, "embeddings")
      .select($"embedding", $"label")
      .as[(Array[Float], Int)].collect().toSeq
      .map { case (v, l) =>
        val d = v.map(_.toDouble)
        val ss = d.foldLeft(0.0)((a, x) => a + x * x)
        (math.floor(d(0) / math.sqrt(ss) * 1000).toLong, l < 5)
      }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var u2 = 0L
    pos.foreach(p => neg.foreach { n =>
      if (p > n) u2 += 2 else if (p == n) u2 += 1
    })
    val expected = (1000000L * u2) / (2L * pos.size * neg.size)
    val got = SparkEntry.queries("q303_distributed_auc")(spark, sfDir)
      .as[(Long, Long, Long)].head()
    assert(got === ((pos.size.toLong, neg.size.toLong, expected)))
    val buckets = SparkEntry.queries("q304_score_calibration")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(buckets.map(_._2).sum === rows.size.toLong)
    assert(buckets.map(_._3).sum === pos.size.toLong)
    buckets.foreach(b => assert(b._4 === 1000000L * b._3 / b._2))
  }

  test("signBits: MSB-first fold matches a Scala reference; " +
      "deterministic; duplicate vectors collide at Hamming 0") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(50)
    val rows = e.select($"vec_id", $"embedding",
        Similarity.signBits($"embedding").as("sig"))
      .as[(Long, Array[Float], Long)].collect().toSeq
    rows.foreach { case (id, v, sig) =>
      val exp = v.foldLeft(0L)((acc, x) =>
        (acc << 1) | (if (x >= 0) 1L else 0L))
      assert(sig === exp, s"vec $id signature")
    }
    // identical vectors ⇒ identical signatures (Hamming 0)
    val dup = rows.head
    val again = e.filter($"vec_id" === dup._1)
      .select(Similarity.signBits($"embedding")).as[Long].head()
    assert(again === dup._3)
  }

  test("signBitTopK: shortlist covering the corpus degenerates to the " +
      "exact brute force (rerank exactness law)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count().toInt
    val q = e.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val viaSig = Similarity.signBitTopK(e, q, "vec_id", "embedding", k = 5,
        shortlist = n)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(viaSig === exact)
  }

  test("signBitTopK: a planted exact duplicate is always retrieved " +
      "first (Hamming 0 survives any shortlist)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val planted = e.unionByName(
      e.filter($"vec_id" === 3).withColumn("vec_id", lit(100000L)))
    val out = Similarity.signBitTopK(planted,
        planted.filter($"vec_id" === 100000L), "vec_id", "embedding",
        k = 1, shortlist = 8)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.size === 1)
    assert(out.head._3 === 3L && out.head._4 === 1.0)
  }

  test("SQ8: hand-exact codes and roundtrip; rerank ≡ brute force with full shortlist") {
    import org.apache.spark.sql.functions.col
    // ranges per dim: d0 [0,255] (step 1 — integers roundtrip EXACTLY),
    // d1 [0,1] (step 1/255)
    val d = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(255.0f, 1.0f)),
      (3L, Array(7.0f, 0.5f)), (4L, Array(200.0f, 0.25f))
    ).toDF("vec_id", "embedding")
    val ranges = Similarity.trainSqRanges(d, "vec_id", "embedding")
    assert(ranges.toSeq === Seq((0.0, 255.0), (0.0, 1.0)))
    val codes = Similarity.sqQuantize(d, "vec_id", "embedding", ranges)
      .orderBy("neighbor_id")
      .as[(Long, Seq[Byte])].collect().toSeq
    // code = round(x/step) - 128
    assert(codes.map(_._2.head.toInt) === Seq(-128, 127, -121, 72))
    val rv = Similarity.sqQuantize(d, "vec_id", "embedding", ranges)
      .select(col("neighbor_id"),
        Similarity.sqDequantize(col("codes"), ranges).as("rv"))
      .orderBy("neighbor_id").as[(Long, Seq[Double])].collect()
    // integer-step dim roundtrips exactly
    assert(rv.map(_._2.head) === Array(0.0, 255.0, 7.0, 200.0))
    // full shortlist degenerates to exact brute force
    val got = Similarity.sqRerankTopK(d, d, "vec_id", "embedding", k = 2,
      candidates = 4).collect().map(_.toString).sorted.toSeq
    val want = Similarity.bruteForceTopKAgg(d, d, "vec_id", "embedding",
      k = 2).collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }
}
