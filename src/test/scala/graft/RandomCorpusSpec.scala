package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential fuzzing of the text battery: the fixed testdata has no
  * NULL text, no empty documents, and no multi-space runs, so a query
  * can pass the DuckDB gate by data-shape luck (exactly how the
  * size(NULL) = -1 asymmetry in q75's first draft stayed invisible).
  * Here seeded random corpora — salted with those adversarial shapes —
  * are written as parquet and the SparkEntry queries are checked
  * against independent Scala reference models.
  */
class RandomCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(424242L)
  private val vocab = Vector("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "ß", "号", "a", "b-1", "x")

  /** Random corpus with edge rows: null text, empty text, single word,
    * all-identical words, double spaces (empty tokens), trailing space.
    */
  private def corpus(n: Int): Seq[(Long, String, String)] = {
    val langs = Vector("en", "es", "zz")
    val regular = (0 until n).map { i =>
      val nw = 1 + rnd.nextInt(40)
      val text = Seq.fill(nw)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, langs(rnd.nextInt(langs.size)))
    }
    val edges = Seq(
      (n + 0L, null.asInstanceOf[String], "en"),
      (n + 1L, "", "es"),
      (n + 2L, "solo", "zz"),
      (n + 3L, Seq.fill(12)("w").mkString(" "), "en"),
      (n + 4L, "a  b", "es"),        // double space → empty token
      (n + 5L, "tail ", "zz"))       // trailing space → empty token
    regular ++ edges
  }

  private def writeCorpus(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fuzz"))
      .withColumn("n_chars", coalesce(length($"text").cast("long"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q72/q75/q79 match Scala reference models on 3 random corpora") {
    (1 to 3).foreach { trial =>
      val rows = corpus(60 + rnd.nextInt(60))
      val dir = writeCorpus(rows)
      val docs = rows.filter(_._2 != null)
      val nDocsAll = rows.size.toLong // q72's N counts every row, null text included

      // --- q72 TF-IDF reference ---
      val tf = docs.flatMap { case (id, text, _) =>
        text.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
          .map { case (t, a) => (id, t, a.length.toLong) }
      }
      val dfreq = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
      val expTfidf = tf.groupBy(_._1).toSeq.flatMap { case (id, g) =>
        g.map { case (_, t, c) =>
            val d = dfreq(t)
            (t, c, d, round6(c * (math.log((nDocsAll + 1).toDouble / (d + 1)) + 1)))
          }
          .sortBy { case (t, _, _, s) => (-s, t) }.take(3).zipWithIndex
          .map { case ((t, c, d, s), i) => (id, (i + 1).toLong, t, c, d, s) }
      }.sortBy(r => (r._1, r._2))
      val gotTfidf = SparkEntry.queries("q72_tfidf_topterms")(spark, dir)
        .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
      assert(gotTfidf === expTfidf, s"trial $trial: q72")

      // --- q75 vocabulary head reference ---
      val counts = tf.groupBy(_._2).map { case (t, g) => t -> g.map(_._3).sum }
      val total = counts.values.sum.toDouble
      val expHead = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
        .zipWithIndex.map { case ((t, c), i) =>
          ((i + 1).toLong, t, c, round6(c / total))
        }
      val gotHead = SparkEntry.queries("q75_vocab_head")(spark, dir)
        .as[(Long, String, Long, Double)].collect().toSeq
      assert(gotHead === expHead, s"trial $trial: q75")

      // --- q79 bigram LM reference (empty tokens count as words) ---
      val bigrams = docs.flatMap { case (id, text, _) =>
        val ws = text.split(" ", -1)
        ws.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))).toSeq
      }
      val c2 = bigrams.groupBy(_._2).map { case (g, v) => g -> v.size.toLong }
      val c1 = bigrams.groupBy(_._2._1).map { case (w, v) => w -> v.size.toLong }
      val vctx = c1.size.toLong
      val expLm = bigrams.groupBy(_._1).toSeq.map { case (id, g) =>
        val lps = g.map { case (_, bg) =>
          math.log((c2(bg) + 1).toDouble / (c1(bg._1) + vctx))
        }
        (id, g.size.toLong, round6(lps.sum / lps.size))
      }.sortBy(_._1)
      val gotLm = SparkEntry.queries("q79_bigram_logprob")(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
      assert(gotLm.map(r => (r._1, r._2)) === expLm.map(r => (r._1, r._2)),
        s"trial $trial: q79 keys")
      gotLm.zip(expLm).foreach { case (g, e) =>
        assert(math.abs(g._3 - e._3) < 1e-9, s"trial $trial: q79 doc ${g._1}")
      }
    }
  }

  test("q96/q98 match Scala reference models on a random corpus (null text/lang edges)") {
    // The fixed testdata has no NULL lang and no duplicate texts at
    // sf0.01 — precisely where the anti-join and the band join could
    // diverge from SQL semantics unnoticed.
    val base = corpus(80)
    val rows = base :+ ((base.size + 100L, "orphan words here",
      null.asInstanceOf[String]))
    val dir = writeCorpus(rows)

    // --- q96 reference: NOT EXISTS on the text; NULL text never matches ---
    val histTexts = rows.filter(r => r._1 % 3 != 0 && r._2 != null).map(_._2).toSet
    val expNew = rows.filter(_._1 % 2 == 0)
      .filter(r => r._2 == null || !histTexts.contains(r._2))
      .map(_._1).sorted
    val gotNew = SparkEntry.queries("q96_incremental_new")(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(gotNew === expNew, "q96")

    // --- q98 reference: per-lang inclusive [p05, p95] interpolated band;
    // NULL-lang rows vanish (the bounds join never matches them) ---
    def quant(vs: Seq[Long], p: Double): Double = {
      val s = vs.sorted
      val pos = p * (s.size - 1)
      val lo = s(pos.floor.toInt).toDouble
      val hi = s(pos.ceil.toInt).toDouble
      lo + (hi - lo) * (pos - pos.floor)
    }
    def nchars(t: String): Long = if (t == null) 0L else t.length.toLong
    val expKept = rows.filter(_._3 != null).groupBy(_._3).toSeq
      .flatMap { case (_, rs) =>
        val lens = rs.map(r => nchars(r._2))
        val (lo, hi) = (quant(lens, 0.05), quant(lens, 0.95))
        rs.filter(r => nchars(r._2) >= lo && nchars(r._2) <= hi).map(_._1)
      }.sorted
    val gotKept = SparkEntry.queries("q98_adaptive_length_filter")(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(gotKept === expKept, "q98")
  }

  test("q73 chunking reconstructs random corpora; null/empty rows behave") {
    val rows = corpus(40)
    val dir = writeCorpus(rows)
    val chunks = SparkEntry.queries("q73_token_chunks")(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    val nonNull = rows.filter(_._2 != null).map(r => r._1 -> r._2).toMap
    // null-text doc vanishes; every other doc (incl. "" → one chunk of
    // the empty token) reconstructs exactly
    assert(chunks.keySet === nonNull.keySet)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      val toks = sorted.flatMap { case (_, no, _, _, text) =>
        val ws = text.split(" ", -1)
        if (no == 1L) ws else ws.drop(8)
      }
      assert(toks.mkString(" ") === nonNull(id), s"doc $id")
    }
  }

  test("q92 drift: zero on mirrored slices, matches a Scala reference on a random corpus") {
    // Mirrored corpus — every text present once per slice → all three
    // divergences are exactly zero (p = q term-by-term).
    val base = corpus(40)
    val mirrored = base.zipWithIndex.flatMap { case ((_, t, l), i) =>
      Seq((2L * i, t, l), (2L * i + 1, t, l)) }
    val out = SparkEntry.queries("q92_corpus_drift")(spark, writeCorpus(mirrored))
      .collect().head
    assert(out.getDouble(3) === 0.0 && out.getDouble(4) === 0.0 &&
      out.getDouble(5) === 0.0)

    // Random corpus vs an independent Scala model of the smoothed KL/JSD.
    val rows = corpus(80)
    val got = SparkEntry.queries("q92_corpus_drift")(spark, writeCorpus(rows))
      .collect().head
    val toks = rows.filter(_._2 != null).flatMap { case (id, t, _) =>
      t.split(" ", -1).filter(_.nonEmpty).map(w => (id % 2 == 0, w)) }
    val byTerm = toks.groupBy(_._2).values.map(xs =>
      (xs.count(_._1).toLong, xs.count(!_._1).toLong)).toVector
    val (totA, totB, v) = (byTerm.map(_._1).sum, byTerm.map(_._2).sum, byTerm.size)
    def prob(c: Long, tot: Long) = (c + 1).toDouble / (tot + v)
    val terms = byTerm.map { case (ca, cb) => (prob(ca, totA), prob(cb, totB)) }
    val klAb = terms.map { case (p, q) => p * math.log(p / q) }.sum
    val klBa = terms.map { case (p, q) => q * math.log(q / p) }.sum
    val jsd = terms.map { case (p, q) =>
      p * math.log(p / ((p + q) / 2)) + q * math.log(q / ((p + q) / 2)) }.sum / 2
    assert(got.getLong(0) === v.toLong && got.getLong(1) === totA && got.getLong(2) === totB)
    assert(math.abs(got.getDouble(3) - klAb) < 1e-6)
    assert(math.abs(got.getDouble(4) - klBa) < 1e-6)
    assert(math.abs(got.getDouble(5) - jsd) < 1e-6)
    // Divergence invariants: non-negative, JSD bounded by ln 2.
    assert(got.getDouble(3) >= 0 && got.getDouble(4) >= 0)
    assert(got.getDouble(5) >= 0 && got.getDouble(5) <= math.log(2) + 1e-12)
  }

  test("q166 KMV incremental law survives random corpora with edge rows " +
      "(null/empty text, unicode, random split)") {
    import graft.operators.Sketches
    import graft.functions.TextFunctions.shingles
    (1 to 3).foreach { _ =>
      val dir = writeCorpus(corpus(40 + rnd.nextInt(40)))
      val all = Tables.load(spark, dir, "documents")
      def grams(d: org.apache.spark.sql.DataFrame) = d.select($"source",
        explode(shingles($"text", 3)).as("g"))
      val m = 2 + rnd.nextInt(4)
      val history = Sketches.kmvSketch(
        grams(all.filter($"doc_id" % m =!= 0)), Seq("source"), "g", 64)
      val delta = Sketches.kmvSketch(
        grams(all.filter($"doc_id" % m === 0)), Seq("source"), "g", 64)
      val maintained = Sketches.mergeKmvTables(history, delta,
        Seq("source"), 64)
      val scratch = Sketches.kmvSketch(grams(all), Seq("source"), "g", 64)
      val diff = maintained.withColumnRenamed("sk", "a")
        .join(scratch.withColumnRenamed("sk", "b"), Seq("source"), "full")
        .filter($"a".isNull || $"b".isNull || $"a" =!= $"b")
        .count()
      assert(diff === 0L, s"maintained sketch diverged from scratch (m=$m)")
    }
  }

  test("stripMarkup is the identity on markup-free random corpora") {
    val rows = corpus(60)
    val dir = writeCorpus(rows)
    val d = Tables.load(spark, dir, "documents").filter($"text".isNotNull)
    // Whitespace-collapse exception: the generator's double-space and
    // trailing-space edge rows legitimately normalize; everything else
    // must come back byte-identical.
    val changed = d.select($"doc_id", $"text",
        graft.operators.Scrub.stripMarkup($"text").as("c"))
      .filter($"text" =!= $"c")
      .as[(Long, String, String)].collect()
    changed.foreach { case (id, t, c) =>
      assert(t.replaceAll("\\s+", " ").trim === c,
        s"doc $id changed beyond whitespace normalization: '$t' -> '$c'")
    }
  }

  test("temperatureMix and proportionalInterleave match reference models " +
      "on random corpora with edge rows") {
    import graft.operators.Packing
    (1 to 2).foreach { trial =>
      val rows = corpus(50 + rnd.nextInt(50))
      val dir = writeCorpus(rows)
      val d = Tables.load(spark, dir, "documents")
        .withColumn("n_tokens", size(split($"text", " ")).cast("bigint"))
      // --- temperatureMix vs the single-window formulation ---
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = d.groupBy("lang")
        .agg(coalesce(sum("n_tokens"), lit(0L)).as("t"))
        .as[(String, Long)].collect().toMap
      val ws = totals.view
        .mapValues(t => math.floor(math.sqrt(t.toDouble)).toLong).toMap
      val wSum = ws.values.sum
      val budget = udf((lang: String) => (BigInt(1500) * ws(lang) / wSum).toLong)
      val ref = d.withColumn("cum_tokens", sum("n_tokens").over(w))
        .withColumn("grp_budget", budget($"lang"))
        .filter($"cum_tokens" <= $"grp_budget")
        .select("doc_id", "lang", "cum_tokens", "grp_budget")
        .as[(Long, String, Long, Long)].collect().toSet
      val got = Packing.temperatureMix(d, "lang", "doc_id", "n_tokens",
          totalBudget = 1500, binSize = 7)
        .select("doc_id", "lang", "cum_tokens", "grp_budget")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === ref && got.nonEmpty, s"trial $trial")
      // --- interleave vs a Scala reference merge (natural + sqrt) ---
      Seq(false, true).foreach { sq =>
        val ids = rows.map(r => (r._3, r._1))
        val byLang = ids.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        val refOrder = byLang.toSeq.flatMap { case (g, gIds) =>
          val w0 = gIds.length.toLong
          val wg = if (sq) math.floor(math.sqrt(w0.toDouble)).toLong else w0
          gIds.zipWithIndex.map { case (id, i) =>
            ((2L * (i + 1) - 1).toDouble / wg, g, id)
          }
        }.sortBy(r => (r._1, r._2)).take(40)
          .zipWithIndex.map { case ((_, g, id), i) => (i + 1L, g, id) }
        val gotOrder = Packing.proportionalInterleave(
            Tables.load(spark, dir, "documents"), "lang", "doc_id",
            take = 40, sqrtWeights = sq, binSize = 7)
          .select("ord", "lang", "doc_id")
          .as[(Long, String, Long)].collect().toSeq
        assert(gotOrder === refOrder, s"trial $trial sqrtWeights=$sq")
      }
    }
  }

  test("downsampleFrequentTokens matches a Scala reference model on " +
      "random corpora (empty tokens, null text, aggressive threshold)") {
    import graft.operators.Scrub
    (1 to 2).foreach { trial =>
      val rows = corpus(50 + rnd.nextInt(50))
      val dir = writeCorpus(rows)
      val d = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      val ppb = 50000000000L // t=0.05: thins moderately on tiny corpora
      val texts = rows.filter(_._2 != null).map(r => (r._1, r._2))
      val allToks = texts.flatMap(_._2.split(" ", -1))
      val freq = allToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = allToks.length.toLong
      val t = BigInt(ppb) * n
      def maxh(wd: String): Long = {
        val arg = t / freq(wd)
        if (arg >= BigInt(1000000000000L)) 1000000L
        else math.floor(math.sqrt(arg.toDouble)).toLong
      }
      def h6(id: Long, pos: Long): Long =
        ((id * 1000003L + pos + 1) % 3000000000L) * 2654435761L % 1000000L
      val ref = texts.map { case (id, txt) =>
        val kept = txt.split(" ", -1).zipWithIndex
          .filter { case (wd, i) => h6(id, i.toLong) <= maxh(wd) }.map(_._1)
        (id, kept.mkString(" "), kept.length.toLong)
      }.toSet ++ rows.filter(_._2 == null)
        .map(r => (r._1, null.asInstanceOf[String], -1L)) // null marker
      val got = Scrub.downsampleFrequentTokens(d, "doc_id", "text",
          thresholdPpb = ppb)
        .as[(Long, Option[String], Option[Long])].collect()
        .map { case (id, ds, nk) => (id, ds.orNull, nk.getOrElse(-1L)) }.toSet
      assert(got === ref, s"trial $trial")
      // the aggressive threshold must actually thin something
      assert(got.exists { case (id, ds, nk) =>
        nk >= 0 && texts.toMap.get(id).exists(_.split(" ", -1).length > nk) },
        s"trial $trial: vacuous — nothing thinned")
    }
  }

  test("q76 sampling is text-independent: null-text docs still rank by id hash") {
    val rows = corpus(40)
    val dir = writeCorpus(rows)
    val got = SparkEntry.queries("q76_stratified_sample")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    val expected = rows.groupBy(_._3).toSeq.flatMap { case (lang, g) =>
      g.map { case (id, _, _) => (id, (id * 2654435761L) % 4294967296L) }
        .sortBy { case (id, h) => (-h, id) }.take(25).zipWithIndex
        .map { case ((id, h), i) => (lang, (i + 1).toLong, id, h) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq.sortBy(r => (r._1, r._2)) === expected)
  }
}
