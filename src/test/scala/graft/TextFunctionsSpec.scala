package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("QualityModel: GD separates a separable set; score() is the literal sigmoid") {
    import graft.operators.QualityModel
    val sample: Array[(Array[Double], Double)] = Array(
      (Array(0.0, 0.1), 0.0), (Array(0.05, 0.2), 0.0), (Array(0.0, 0.3), 0.0),
      (Array(0.5, 0.1), 1.0), (Array(0.6, 0.2), 1.0), (Array(0.45, 0.3), 1.0))
    val m = QualityModel.trainLogistic(sample, iters = 2000, lr = 2.0)
    def p(x: Array[Double]): Double = {
      val z = x.zip(m.weights).map { case (a, b) => a * b }.sum + m.bias
      1.0 / (1.0 + math.exp(-z))
    }
    sample.foreach { case (x, y) =>
      assert((p(x) >= 0.5) === (y == 1.0), s"x=${x.toSeq} p=${p(x)}")
    }
    // the column expression computes the identical sigmoid
    val got = Seq((0.0, 0.1), (0.5, 0.1)).toDF("f1", "f2")
      .select(m.score(Seq($"f1", $"f2"))).as[Double].collect()
    got.zip(Seq(Array(0.0, 0.1), Array(0.5, 0.1)).map(p)).foreach {
      case (g, e) => assert(math.abs(g - e) < 1e-12)
    }
    // zero-init fixed-iteration GD: bit-deterministic retrain
    val m2 = QualityModel.trainLogistic(sample, iters = 2000, lr = 2.0)
    assert(m.weights.toSeq === m2.weights.toSeq && m.bias === m2.bias)
  }

  test("QualityModel.trainLogisticFull: bit-identical to the driver " +
      "reference regardless of partitioning; separates the separable set") {
    import graft.operators.QualityModel
    val rows: Array[(Array[Double], Double)] = Array(
      (Array(0.0, 0.1), 0.0), (Array(0.05, 0.2), 0.0), (Array(0.0, 0.3), 0.0),
      (Array(0.5, 0.1), 1.0), (Array(0.6, 0.2), 1.0), (Array(0.45, 0.3), 1.0),
      (Array(0.02, 0.15), 0.0), (Array(0.55, 0.25), 1.0))
    val ref = QualityModel.trainLogisticFullReference(rows,
      iters = 80, lr = 50.0)
    // two different partitionings must both bit-equal the reference —
    // the 1e-6 integer-grid gradients make the sums order-independent
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        rows.toSeq.map(r => (r._1(0), r._1(1), r._2)))
        .toDF("f1", "f2", "y").repartition(parts)
      val m = QualityModel.trainLogisticFull(df, Seq("f1", "f2"), "y",
        iters = 80, lr = 50.0)
      assert(m.weights.toSeq === ref.weights.toSeq && m.bias === ref.bias,
        s"parts=$parts: ${m.weights.toSeq}/${m.bias} vs " +
          s"${ref.weights.toSeq}/${ref.bias}")
    }
    // and the fit actually separates
    def p(x: Array[Double]): Double = {
      val z = x.zip(ref.weights).map { case (a, b) => a * b }.sum + ref.bias
      1.0 / (1.0 + math.exp(-z))
    }
    rows.foreach { case (x, y) =>
      assert((p(x) >= 0.5) === (y == 1.0), s"x=${x.toSeq} p=${p(x)}")
    }
    // null features drop on both sides (na.drop mirrors the referee's
    // pre-filtered input)
    val withNull = spark.createDataFrame(
      rows.toSeq.map(r => (Option(r._1(0)), r._1(1), r._2)) :+
        ((Option.empty[Double], 0.9, 1.0)))
      .toDF("f1", "f2", "y")
    val m3 = QualityModel.trainLogisticFull(withNull, Seq("f1", "f2"), "y",
      iters = 80, lr = 50.0)
    assert(m3.weights.toSeq === ref.weights.toSeq && m3.bias === ref.bias)
  }

  test("q243 FIM: char conservation, marker overhead, brute-force render md5") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val P = 1000000007L
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("q243_fim_transform")(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long, String)].collect().toSeq
    assert(rows.map(_._1).toSet === texts.keySet)
    assert(rows.map(_._2).toSet === Set("none", "psm", "spm"))
    rows.foreach { case (id, mode, nPre, nMid, nSuf, nOut, gotMd5) =>
      val text = texts(id)
      val len = text.length.toLong
      assert(nPre + nMid + nSuf === len, s"doc $id conservation")
      assert(nOut === len + (if (mode == "none") 0L else 15L), s"doc $id")
      val h1 = (id * 1000003L + 17L) % P
      val h2 = (id * 1000003L + 89L) % P
      val dh = (id * 2654435761L) % 4294967296L
      val fim = dh % 2 == 0
      val expMode = if (!fim) "none" else if (dh % 4 == 0) "psm" else "spm"
      assert(mode === expMode, s"doc $id mode")
      val lo = math.min(h1 % (len + 1), h2 % (len + 1)).toInt
      val hi = math.max(h1 % (len + 1), h2 % (len + 1)).toInt
      val (pre, mid, suf) =
        (text.substring(0, lo), text.substring(lo, hi), text.substring(hi))
      val rendered = mode match {
        case "none" => text
        case "psm"  => s"<PRE>$pre<SUF>$suf<MID>$mid"
        case _      => s"<PRE><SUF>$suf<MID>$pre$mid"
      }
      assert(gotMd5 === md5hex(rendered), s"doc $id rendered bytes")
    }
  }

  test("q244 chat flatten: brute-force conversations match exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val expected = docs.groupBy(_._1 / 4).toSeq.map { case (conv, turns) =>
      val ordered = turns.sortBy(_._1 % 4)
      val rendered = ordered.map { case (id, t) =>
        val role = if (id % 2 == 0) "user" else "assistant"
        s"<|$role|>$t<|end|>"
      }.mkString
      val toks = ordered.map { case (_, t) => t.split(" ", -1).length + 2L }.sum
      val loss = ordered.collect { case (id, t) if id % 2 == 1 =>
        t.split(" ", -1).length + 1L }.sum
      (conv, ordered.size.toLong, toks, loss, 1000000L * loss / toks,
        md5hex(rendered))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q244_chat_flatten")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got === expected)
  }

  test("q245 license scrub: detection is exact and strip inverts the plant") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("q245_license_scrub")(spark, sfDir)
      .as[(Long, String, Boolean, Long, String)].collect().toSeq
    assert(rows.map(_._1).toSet === texts.keySet)
    rows.foreach { case (id, lic, had, nStripped, gotMd5) =>
      val planted = id % 7 == 0
      assert(had === planted, s"doc $id detection")
      val expLic =
        if (!planted) "none"
        else if ((id / 7) % 2 == 0) "MIT" else "Apache-2.0"
      assert(lic === expLic, s"doc $id license")
      val header =
        if (planted) s"// SPDX-License-Identifier: $expLic\n" else ""
      assert(nStripped === header.length.toLong, s"doc $id strip length")
      // strip ∘ plant = identity: the scrubbed bytes are the original
      assert(gotMd5 === md5hex(texts(id)), s"doc $id inverse")
    }
  }

  test("q247 best-of-n: window argmax equals the brute-force selector") {
    import graft.functions.TextFunctions.markerHits
    val scored = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id",
        (lit(1000L) * markerHits($"text", Seq("the", "a", "of", "and", "to"))
          .cast("bigint")
          + size(split($"text", " ")).cast("bigint")).as("reward"))
      .as[(Long, Long)].collect().toSeq
    val expected = scored.groupBy(_._1 / 8).toSeq.map { case (p, cs) =>
      val ordered = cs.sortBy { case (id, r) => (-r, id) }
      val margin = if (ordered.size > 1) ordered(0)._2 - ordered(1)._2 else 0L
      (p, ordered.head._1, ordered.head._2, margin, cs.size.toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q247_best_of_n")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.forall(_._4 >= 0))
  }

  test("q248 distinct-n: brute-force per-source ratios match; bounds hold") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("source", "text")
      .as[(String, String)].collect().toSeq
    val expected = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val unis = ds.flatMap(_._2.split(" ", -1))
      val bis = ds.flatMap { case (_, t) =>
        val w = t.split(" ", -1)
        if (w.length < 2) Seq.empty
        else (0 until w.length - 1).map(i => w(i) + " " + w(i + 1))
      }
      (src, unis.distinct.size.toLong, unis.size.toLong,
        bis.distinct.size.toLong, bis.size.toLong,
        1000000L * unis.distinct.size / unis.size,
        1000000L * bis.distinct.size / bis.size)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q248_distinct_ngrams")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    got.foreach { r =>
      assert(r._2 <= r._3 && r._4 <= r._5, s"${r._1} distinct ≤ total")
      assert(r._6 <= 1000000L && r._7 <= 1000000L)
    }
  }

  test("q253 UL2 mix: brute-force masks per task; all three tasks " +
      "present; s masks exactly the suffix half") {
    val P = 1000000007L
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q253_ul2_denoiser_mix")(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).toSet === Set("r", "x", "s"))
    got.foreach { case (id, task, n, nMasked, maskPpm, maskHash) =>
      val words = texts(id).split(" ", -1)
      assert(n === words.length.toLong, s"doc $id")
      def h(q: Int): Long = (id * 1000003L + q * 7919L) % P
      val cov = (0 until words.length).map { p =>
        task match {
          case "s" => p >= words.length - words.length / 2
          case _ => (math.max(0, p - 31) to p).exists { q =>
            val starts =
              if (task == "r") h(q) % 20 < 3 else h(q) % 64 == 0
            val len =
              if (task == "r") 1 + (h(q) / 20) % 3 else 16 + (h(q) / 64) % 17
            starts && len > p - q
          }
        }
      }
      assert(nMasked === cov.count(identity).toLong, s"doc $id ($task)")
      assert(maskPpm === 1000000L * nMasked / n, s"doc $id")
      val mh = cov.zipWithIndex.filter(_._1)
        .foldLeft(0L)((a, pi) => (a * 131 + pi._2) % P)
      assert(maskHash === mh, s"doc $id mask positions")
      if (task == "s") assert(nMasked === n / 2, s"doc $id suffix half")
    }
  }

  test("q254 dup-aware epochs: thresholds honored, dup census exact, " +
      "heavy template gets 1 epoch") {
    val got = SparkEntry.queries("q254_dup_aware_epochs")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the planted template spam (50 docs over 5 variants at sf0.001)
    // must hit the >= 8 bucket; untouched unique docs get 4 epochs
    assert(got.filter(_._1 % 10 == 0).forall(r => r._2 >= 8 && r._3 == 1L))
    got.foreach { case (id, dup, epochs, nTok, eff) =>
      val exp = if (dup >= 8) 1L else if (dup >= 4) 2L
        else if (dup >= 2) 3L else 4L
      assert(epochs === exp, s"doc $id")
      assert(eff === epochs * nTok, s"doc $id")
    }
    // dup census sums back to the corpus: group sizes × members
    val byDup = got.groupBy(_._2)
    byDup.foreach { case (d, rs) =>
      assert(rs.size % d == 0 || d == 1L,
        s"dup_count $d inconsistent with member count ${rs.size}")
    }
  }

  test("q255 in-batch collisions: closed-form pair math equals " +
      "enumeration; conservation") {
    val got = SparkEntry.queries("q255_inbatch_collisions")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        val text = if (id % 10 == 0)
          s"template boilerplate page variant ${(id / 10) % 5}" else t
        ((id * 2654435761L) % 4294967296L % 16, text)
      }
    assert(got.map(_._2).sum === docs.size.toLong)
    val expected = docs.groupBy(_._1).toSeq.map { case (b, ds) =>
      val pairs = ds.combinations(2).count(p => p(0)._2 == p(1)._2).toLong
      (b, ds.size.toLong, pairs)
    }.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)) === expected)
    assert(got.exists(_._3 > 0), "planted dups must collide somewhere")
  }

  test("q256 MLM masking: brute-force 80/10/10 decisions, counts, " +
      "decision hash, and corrupted bytes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val P = 1000000007L
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q256_mlm_masking")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(got.map(_._1).toSet === texts.keySet)
    got.foreach { case (id, n, nM, nMt, nR, nK, dh, outMd5) =>
      val w = texts(id).split(" ", -1)
      assert(n === w.length.toLong)
      def h(p: Int): Long = (id * 1000003L + p * 7919L + 31L) % P
      val cls = (0 until w.length).map { p =>
        if (h(p) % 20 >= 3) 0
        else if ((h(p) / 20) % 10 < 8) 1
        else if ((h(p) / 20) % 10 == 8) 2 else 3
      }
      assert(nM === cls.count(_ > 0).toLong, s"doc $id")
      assert(nMt === cls.count(_ == 1).toLong, s"doc $id")
      assert(nR === cls.count(_ == 2).toLong, s"doc $id")
      assert(nK === cls.count(_ == 3).toLong, s"doc $id")
      val expDh = cls.zipWithIndex.filter(_._1 > 0)
        .foldLeft(0L)((a, ci) => (a * 131 + (ci._2 * 4L + ci._1)) % P)
      assert(dh === expDh, s"doc $id decisions")
      val rendered = (0 until w.length).map { p =>
        cls(p) match {
          case 1 => "[MASK]"
          case 2 => w(((h(p) / 200) % w.length).toInt)
          case _ => w(p)
        }
      }.mkString(" ")
      assert(outMd5 === md5hex(rendered), s"doc $id corrupted bytes")
    }
    // mask rate lands near 15% corpus-wide
    val rate = got.map(_._3).sum.toDouble / got.map(_._2).sum
    assert(rate > 0.12 && rate < 0.18, s"mask rate $rate")
  }

  test("q252 anchor text: brute-force link/bag aggregation matches; " +
      "link conservation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val n = docs.size.toLong
    val links = docs.flatMap { case (id, t) =>
      val anchor = t.split(" ", -1).take(3).mkString(" ")
      (0L to 2L).map(k => ((id * 1000003L + k * 7919L + 13L) % n, anchor))
    }
    val expected = links.groupBy(_._1).toSeq.map { case (tgt, as) =>
      val bag = as.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (topAnchor, topCnt) = bag.minBy { case (a, c) => (-c, a) }
      (tgt, as.size.toLong, bag.size.toLong, topAnchor, topCnt)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q252_anchor_text")(spark, sfDir)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got === expected)
    // every link lands exactly once: in-degrees sum to 3·|docs|
    assert(got.map(_._2).sum === 3 * n)
  }

  test("q259 incremental anchor census is bit-identical to the " +
      "from-scratch q252 release") {
    val inc = SparkEntry.queries("q259_anchor_incremental")(spark, sfDir)
      .collect().toSeq
    val scratch = SparkEntry.queries("q252_anchor_text")(spark, sfDir)
      .collect().toSeq
    assert(inc.nonEmpty && inc === scratch)
  }

  test("q263 co-purchase lift and q264 negative sampling match " +
      "brute force at sf0.001") {
    // q263: per-order distinct supplier pairs, lift in exact ppm
    val basket = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val nOrders = basket.map(_._1).distinct.size.toLong
    val item = basket.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCnt = basket.groupBy(_._1).values.flatMap { rows =>
      val ss = rows.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected263 = pairCnt.toSeq.collect { case ((a, b), nAb) if nAb >= 5 =>
      (a, b, nAb, item(a), item(b), 1000000L * nAb * nOrders / (item(a) * item(b)))
    }.sortBy { case (a, b, _, _, _, lift) => (-lift, a, b) }.take(100)
    val got263 = SparkEntry.queries("q263_copurchase_lift")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got263 === expected263 && got263.nonEmpty)

    // q264: cnt^0.75 via composed sqrt, 1e-3 grid, integer total
    val cnts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    def wq(c: Long): Long = {
      val s2 = math.sqrt(math.sqrt(c.toDouble))
      math.floor(s2 * s2 * s2 * 1000d).toLong
    }
    val tot = cnts.map { case (_, c) => wq(c) }.sum
    val expected264 = cnts.map { case (t, c) =>
      (t, c, wq(c), 1000000L * wq(c) / tot) }
      .sortBy { case (t, c, _, _) => (-c, t) }.take(200)
    val got264 = SparkEntry.queries("q264_negative_sampling")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got264 === expected264 && got264.nonEmpty)
  }

  test("q267 contrastive crops: brute-force crops, md5s, and exact " +
      "interval overlap") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val P = 1000000007L
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q267_contrastive_crops")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got.map(_._1).toSet === texts.keySet)
    got.foreach { case (id, span, s1, s2, ov, ovPpm, m1, m2) =>
      val text = texts(id)
      val len = text.length.toLong
      assert(span === len / 2, s"doc $id span")
      val e1 = (id * 1000003L + 41L) % P % (len - span + 1)
      val e2 = (id * 1000003L + 97L) % P % (len - span + 1)
      assert(s1 === e1 && s2 === e2, s"doc $id starts")
      val expOv = math.max(0L,
        math.min(s1 + span, s2 + span) - math.max(s1, s2))
      assert(ov === expOv, s"doc $id overlap")
      // the interval formula equals the true positional intersection
      val set1 = (s1 until s1 + span).toSet
      assert(ov === (set1 & (s2 until s2 + span).toSet).size.toLong)
      assert(ovPpm === (if (span > 0) 1000000L * ov / span else 0L))
      assert(m1 === md5hex(text.substring(s1.toInt, (s1 + span).toInt)))
      assert(m2 === md5hex(text.substring(s2.toInt, (s2 + span).toInt)))
    }
    // the augmentation must produce a spread: some heavy and some
    // light overlaps across the corpus (sanity that crops vary)
    assert(got.exists(_._6 > 500000) && got.exists(_._6 < 500000))
  }

  test("q269 skip-gram census: brute-force window-2 pair counts match") {
    val texts = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"text").as[String].collect()
    val counts = texts.flatMap { t =>
      val w = t.split(" ", -1)
      w.indices.flatMap { i =>
        Seq(1, 2).flatMap { d =>
          Seq(i + d).filter(_ < w.length)
            .flatMap(j => Seq((w(i), w(j)), (w(j), w(i))))
        }
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expected = counts
      .map { case ((c, x), n) => (c, x, n) }
      .sortBy { case (c, x, n) => (-n, c, x) }.take(100)
    val got = SparkEntry.queries("q269_skipgram_census")(spark, sfDir)
      .as[(String, String, Long)].collect().toSeq
    assert(got === expected && got.nonEmpty)
  }

  test("Scrub.piiStats: counts each class, redacts byte-exactly, skips clean docs") {
    import graft.operators.Scrub
    val docs = Seq(
      (1L, "mail a@b.io and c.d+x@e.org then 1.2.3.4 plus card 123456789012"),
      (2L, "clean text with short 123 and 1.2 nothing else"),
      (3L, "edge 999.999.999.999 still redacts as ip")
    ).toDF("doc_id", "text")
    val out = Scrub.piiStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 2 is clean -> absent; doc 3's over-wide quad redacts (a
    // scrubber over-redacts rather than leaks).
    assert(out.map(_._1) === Seq(1L, 3L))
    assert(out.head._2 === 2L && out.head._3 === 1L && out.head._4 === 1L)
    val redacted = docs.filter($"doc_id" === 1)
      .select(Scrub.redactPii($"text")).as[String].head()
    assert(redacted ===
      "mail <EMAIL> and <EMAIL> then <IP> plus card <NUM>")
  }

  test("Scrub.stripMarkup: blocks die whole, entities decode once, " +
      "idempotent, clean text passes through") {
    import graft.operators.Scrub
    val docs = Seq(
      (1L, "<p class=\"x\">hello <b>world</b></p>" +
        "<script>var a = 1 < 2;</script>tail"),
      (2L, "Fish &amp; Chips say &lt;hi&gt; and &amp;lt;not-a-tag&amp;gt;"),
      (3L, "already clean single spaced text"),
      (4L, "<style>.a{color:red}</style>kept"),
      // HTML tag names are case-insensitive; the payload must die with
      // the block, not leak once the tags are stripped.
      (5L, "<SCRIPT>var leak = 1;</SCRIPT><Style>.b{}</Style>ok"),
      // a stray </style> must NOT close a <script> block early
      (6L, "<script>var a = 'x</style>y';</script>after")
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id", Scrub.stripMarkup($"text").as("c"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out(0)._2 === "hello world tail",
      "script body (incl. bare <) must die with its block")
    // &amp;lt; decodes to the LITERAL string &lt; — one pass, no
    // double-decode into a tag opener.
    assert(out(1)._2 === "Fish & Chips say <hi> and &lt;not-a-tag&gt;")
    assert(out(2)._2 === "already clean single spaced text",
      "clean text must pass through byte-identical")
    assert(out(3)._2 === "kept")
    assert(out(4)._2 === "ok",
      "<SCRIPT>/<Style> payloads must die case-insensitively")
    assert(out(5)._2 === "after",
      "a </style> inside a script body must not close the script block")
    // Idempotence, the q147 property: scrub ∘ scrub ≡ scrub — EXCEPT
    // where decoding legitimately produced literal <...> text, which a
    // second pass would strip; that is why production runs the scrub
    // ONCE at ingest (same reason PII redaction tokens are angle-free).
    val once = docs.filter($"doc_id" =!= 2)
      .select(Scrub.stripMarkup($"text").as("c"))
    val twice = once.select(Scrub.stripMarkup($"c").as("c"))
    assert(once.as[String].collect().toSeq ===
      twice.as[String].collect().toSeq)
  }

  test("Scrub.dropFrequentLines: boilerplate drops, order keeps, " +
      "below-threshold survives, null/empty total, guard fires") {
    import graft.operators.Scrub
    val boiler = "subscribe now"
    val docs = (1L to 6L).map { i =>
      (i, Some(s"body line $i\n$boiler\ntail line $i"))
    } :+ (7L, Some(s"rare line\nonly twice")) :+
      (8L, Some("only twice")) :+ (9L, None: Option[String])
    val df = docs.toDF("doc_id", "text")
    val out = Scrub.dropFrequentLines(df, "doc_id", "text", minDf = 5)
      .orderBy("doc_id").as[(Long, Option[String], Option[Long])]
      .collect().toSeq
    // boilerplate (df=6) dies; body/tail keep their order
    assert(out.head._2.get === "body line 1\ntail line 1" &&
      out.head._3.get === 1L)
    // "only twice" (df=2 < 5) survives in both docs
    assert(out(6)._2.get === "rare line\nonly twice")
    assert(out(7)._2.get === "only twice")
    // null text is total
    assert(out(8)._2.isEmpty && out(8)._3.isEmpty)
    // loud guard on an over-threshold drop set
    intercept[IllegalArgumentException] {
      Scrub.dropFrequentLines(df, "doc_id", "text", minDf = 1,
        maxDropLines = 2)
    }
  }

  test("Scrub.dropFrequentLinesDistributed ≡ literal-set regime, " +
      "including all-dropped, empty, and null docs") {
    import graft.operators.Scrub
    val boiler = "subscribe now"
    val docs = (1L to 6L).map { i =>
      (i, Some(s"body line $i\n$boiler\ntail line $i"))
    } :+ (7L, Some(boiler)) :+ // every line drops
      (8L, Some("")) :+        // no non-empty lines at all
      (9L, None: Option[String])
    val df = docs.toDF("doc_id", "text")
    val literal = Scrub.dropFrequentLines(df, "doc_id", "text", minDf = 5)
      .orderBy("doc_id").as[(Long, Option[String], Option[Long])]
      .collect().toSeq
    val joined = Scrub
      .dropFrequentLinesDistributed(df, "doc_id", "text", minDf = 5)
      .orderBy("doc_id").as[(Long, Option[String], Option[Long])]
      .collect().toSeq
    assert(literal === joined)
    // and the edge rows really exercise the edges
    assert(joined(6) === ((7L, Some(""), Some(1L)))) // all-dropped
    assert(joined(7) === ((8L, Some(""), Some(0L)))) // empty text
    assert(joined(8) === ((9L, None, None)))         // null is total
  }

  test("Scrub.pseudonymizeEmails: stable tokens, structure preserved, " +
      "idempotent, null-total") {
    import graft.operators.Scrub
    val df = Seq(
      (1L, Some("write a@x.com then b@y.org end")),
      (2L, Some("reply a@x.com")),   // same address as doc 1
      (3L, Some("no emails here")),
      (4L, None: Option[String])).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        Scrub.pseudonymizeEmails($"text").as("p"))
      .orderBy("doc_id").as[(Long, Option[String])].collect()
    val tokA = out(0)._2.get.split(" ")(1)
    assert(tokA.matches("<EMAIL:[0-9a-f]{8}>"))
    // same address → same token across documents
    assert(out(1)._2.get === s"reply $tokA")
    // different addresses → different tokens, surrounding text intact
    assert(out(0)._2.get.startsWith("write <EMAIL:") &&
      out(0)._2.get.endsWith(" end"))
    assert(out(0)._2.get.split("<EMAIL:").length === 3)
    assert(!out(0)._2.get.contains("@"))
    // email-free and NULL docs pass through
    assert(out(2)._2.get === "no emails here")
    assert(out(3)._2.isEmpty)
    // idempotent: tokens contain no '@', so a second pass is a no-op
    val twice = df.select($"doc_id", Scrub.pseudonymizeEmails(
        Scrub.pseudonymizeEmails($"text")).as("p"))
      .orderBy("doc_id").as[(Long, Option[String])].collect()
    assert(twice.map(_._2).toSeq === out.map(_._2).toSeq)
  }

  test("percentile referee: silent on an honest sketch, fires on corrupted claims") {
    import graft.queries.TextQueries
    val d = (1 to 100).map(i => ("en", i.toLong)).toDF("lang", "tok")
    val honest = d.groupBy(col("lang"))
      .agg(percentile_approx(col("tok"), lit(0.5), lit(100)).as("v"),
        count(lit(1)).as("n"))
    assert(TextQueries.percentileViolations(d, "lang", "tok", honest, 0.5, 100)
      .count() === 0)
    // Rank 98 sits far outside the ±1-rank window around 50.
    val shifted = honest.withColumn("v", lit(98L))
    assert(TextQueries.percentileViolations(d, "lang", "tok", shifted, 0.5, 100)
      .count() === 1)
    // A value that is not an element of the column at all must also fire.
    val phantom = honest.withColumn("v", lit(1000L))
    assert(TextQueries.percentileViolations(d, "lang", "tok", phantom, 0.5, 100)
      .count() === 1)
  }

  test("q98 keeps exactly each language's inclusive [p05, p95] length band") {
    val d = Tables.load(spark, sfDir, "documents")
    val out = SparkEntry.queries("q98_adaptive_length_filter")(spark, sfDir)
    val kept = out.groupBy("lang").agg(count(lit(1)).as("k"),
      min("n_chars").as("mn"), max("n_chars").as("mx"))
    val bounds = d.groupBy("lang").agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"), count(lit(1)).as("n"))
    val rows = kept.join(bounds, "lang")
      .as[(String, Long, Long, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, k, mn, mx, lo, hi, n) =>
      assert(mn >= lo && mx <= hi, s"$lang kept [$mn,$mx] outside band [$lo,$hi]")
      // an adaptive p05-p95 band must actually trim tails but keep ~90%
      assert(k < n && k >= (0.85 * n).toLong, s"$lang kept $k of $n")
    }
  }

  test("shingles: distinct 3-gram word shingles; short docs collapse to whole text") {
    val df = Seq(
      ("a b c d"),          // 2 shingles
      ("a b"),              // shorter than n → [text]
      ("x y z x y z x y z") // repeated grams collapse via distinct
    ).toDF("text")
    val out = df.select(TextFunctions.shingles($"text", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("a b"))
    assert(out(2).sorted === Seq("x y z", "y z x", "z x y").sorted)
  }

  test("jaccard on shingle sets") {
    val df = Seq(("a b c d e", "a b c d x")).toDF("t1", "t2")
    val j = df.select(TextFunctions.jaccard(
      TextFunctions.shingles($"t1", 3), TextFunctions.shingles($"t2", 3)).as("j"))
      .as[Double].head()
    // shingles: {abc,bcd,cde} vs {abc,bcd,cdx}: 2 common of 4 → 0.5
    assert(j === 0.5)
  }

  test("minhash signature is deterministic and length numPerm") {
    val df = Seq("a b c d e f g").toDF("text")
    val sig = df.select(TextFunctions.minhashSignature(
        TextFunctions.shingleHashes(TextFunctions.shingles($"text", 3)), 64).as("sig"))
      .as[Seq[Long]].head()
    assert(sig.length === 64)
    val sig2 = df.select(TextFunctions.minhashSignature(
        TextFunctions.shingleHashes(TextFunctions.shingles($"text", 3)), 64).as("sig"))
      .as[Seq[Long]].head()
    assert(sig === sig2)
  }

  test("fingerprint: polynomial rolling hash mod 1e9+7, verifiable in Scala") {
    val s = "hello"
    val expected = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val got = Seq(s).toDF("text").select(TextFunctions.fingerprint("text")).as[Long].head()
    assert(got === expected)
  }

  test("markerHits counts word-boundary matches case-insensitively") {
    val df = Seq("The cat and THE dog, theater").toDF("text")
    val hits = df.select(TextFunctions.markerHits($"text", Seq("the", "and")).as("h"))
      .as[Long].head()
    assert(hits === 3L) // 'theater' must not match
  }

  test("markerHitsAll counts every marker set in one pass, regex-\\b semantics") {
    // Punctuation and non-ASCII letters are non-word chars for ASCII \b:
    // "the-la" yields runs (the, la); "über" yields run (ber); "qué" (qu).
    val df = Seq("The la THE-la der, über el qué toto to").toDF("text")
    val sets = Seq(Seq("the", "to"), Seq("el", "la"), Seq("der", "die"))
    val got = df.select(TextFunctions.markerHitsAll($"text", sets).as("h"))
      .as[Seq[Long]].head()
    assert(got === Seq(3L, 3L, 1L)) // the×2+to×1; la×2+el×1; der×1 ('toto' no hit)
  }

  test("markerHits matches the regexp_extract_all oracle formulation") {
    val docs = Seq(
      "the quick brown fox and the lazy dog",
      "el perro y la casa de que",
      "a-b_c the_x the x to,to;to",
      "", "solo")
    val df = docs.toDF("text")
    val markers = Seq("the", "a", "of", "and", "to")
    val kernel = df.select(TextFunctions.markerHits($"text", markers).as("h")).as[Long].collect()
    val regex = df.select(
      size(regexp_extract_all(lower($"text"),
        lit("\\b(" + markers.mkString("|") + ")\\b"), lit(0))).cast("long").as("h"))
      .as[Long].collect()
    assert(kernel.toSeq === regex.toSeq)
  }

  test("approx length quantiles stay within 5% of exact on sf0.001 documents") {
    // The approx path (Greenwald-Khanna, accuracy 10000) is the 100 TB
    // quantile contract: constant memory per group, mergeable partials.
    // At ~125 docs/lang the sketch's rank error is sub-1-rank, so values
    // differ from the interpolated exact percentile only by the gap
    // between adjacent order statistics — empirically ~2.3% at the p99
    // tail of these groups; bounded here at 5% relative.
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = graft.queries.TextQueries.lengthQuantiles(d, approx = false)
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val approx = graft.queries.TextQueries.lengthQuantiles(d, approx = true)
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(exact.map(_._1).toSeq === approx.map(_._1).toSeq)
    exact.zip(approx).foreach { case ((lang, e50, e90, e99), (_, a50, a90, a99)) =>
      Seq((e50, a50), (e90, a90), (e99, a99)).foreach { case (e, a) =>
        assert(math.abs(a - e) / e <= 0.05, s"$lang: approx $a vs exact $e")
      }
    }
  }

  test("subwordCount matches the regexp_extract_all oracle formulation") {
    val docs = Seq(
      "the quick brown fox", "abc123def", "hello, world! 42",
      "a-b_c  d", "", "¡hola señor!", "x")
    val df = docs.toDF("text")
    val kernel = df.select(graft.expressions.TextOps.subwordCount($"text").as("n"))
      .as[Long].collect()
    val regex = df.select(
      size(regexp_extract_all(lower($"text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n"))
      .as[Long].collect()
    assert(kernel.toSeq === regex.toSeq)
  }

  test("markerHits rejects non-word markers at construction") {
    intercept[IllegalArgumentException] {
      TextFunctions.markerHits(lit("x"), Seq("a|b"))
    }
    intercept[IllegalArgumentException] {
      TextFunctions.markerHits(lit("x"), Seq("The")) // must be lowercase
    }
  }

  test("q72 tf-idf top terms match a brute-force Scala recompute on sf0.001") {
    // Scala BigDecimal(double) is valueOf/HALF_UP — the exact rounding
    // path Spark's Round takes on DoubleType, so equality is exact.
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val rows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = rows.length.toLong
    val tf: Seq[(Long, String, Long)] = rows.toSeq.flatMap { case (id, text) =>
      text.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (t, a) => (id, t, a.length.toLong) }
    }
    val dfreq: Map[String, Long] =
      tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, g) =>
      g.map { case (_, t, c) =>
          val d = dfreq(t)
          (t, c, d, round6(c * (math.log((n + 1).toDouble / (d + 1)) + 1)))
        }
        .sortBy { case (t, _, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, c, d, s), i) => (id, (i + 1).toLong, t, c, d, s) }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q72_tfidf_topterms")(spark, sfDir)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("q73 chunks reconstruct every document exactly (stride 24, size 32)") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val chunks = SparkEntry.queries("q73_token_chunks")(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk_no dense from 1, starts at stride intervals
      assert(sorted.map(_._2).toSeq === (1L to sorted.length))
      assert(sorted.map(_._3).toSeq === sorted.indices.map(_ * 24L))
      // dropping each chunk's 8-token overlap with its predecessor
      // reassembles the original token stream exactly
      val toks = sorted.flatMap { case (_, no, _, _, text) =>
        val ws = text.split(" ", -1)
        if (no == 1L) ws else ws.drop(8)
      }
      assert(toks.mkString(" ") === docs(id), s"doc $id")
      // each chunk holds min(32, remaining) tokens from its start
      val nw = docs(id).split(" ", -1).length.toLong
      sorted.foreach(c => assert(c._4 === math.min(32L, nw - c._3), s"doc $id"))
    }
  }

  test("q79 bigram log-prob matches a brute-force Scala LM on sf0.001") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val bigrams: Seq[(Long, (String, String))] = rows.toSeq.flatMap {
      case (id, text) =>
        val ws = text.split(" ", -1)
        ws.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))).toSeq
    }
    val c2 = bigrams.groupBy(_._2).map { case (g, v) => g -> v.size.toLong }
    val c1 = bigrams.groupBy(_._2._1).map { case (wd, v) => wd -> v.size.toLong }
    val vctx = c1.size.toLong
    val expected = bigrams.groupBy(_._1).toSeq.map { case (id, g) =>
      val lps = g.map { case (_, bg) =>
        math.log((c2(bg) + 1).toDouble / (c1(bg._1) + vctx))
      }
      (id, g.size.toLong, round6(lps.sum / lps.size))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q79_bigram_logprob")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"doc ${g._1}")
    }
  }

  test("q235 Kneser-Ney log-prob matches a brute-force Scala LM; " +
      "q236 terciles are balanced and score-ordered per language") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val bigrams: Seq[(Long, (String, String))] = rows.toSeq.flatMap {
      case (id, text) =>
        val ws = text.split(" ", -1)
        ws.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))).toSeq
    }
    val c2 = bigrams.groupBy(_._2).map { case (g, v) => g -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (wd, v) => wd -> v.values.sum }
    val n1f = c2.groupBy(_._1._1).map { case (wd, v) => wd -> v.size.toLong }
    val n1b = c2.groupBy(_._1._2).map { case (wd, v) => wd -> v.size.toLong }
    val b = c2.size.toDouble
    val D = 0.75
    val expected = bigrams.groupBy(_._1).toSeq.map { case (id, g) =>
      val lps = g.map { case (_, bg) =>
        math.log((c2(bg) - D) / c1(bg._1) +
          D * n1f(bg._1) / c1(bg._1) * n1b(bg._2) / b)
      }
      (id, g.size.toLong, round6(lps.sum / lps.size))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q235_kn_bigram_logprob")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"doc ${g._1}")
    }
    // KN differs from add-1 (the models are genuinely distinct)
    val addOne = SparkEntry.queries("q79_bigram_logprob")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._3) !== addOne.map(_._3))
    // buckets: partition the scored docs; per lang sizes differ <= 1;
    // every head score >= every middle score >= every tail score
    val buckets = SparkEntry.queries("q236_ppl_buckets")(spark, sfDir)
      .as[(Long, String, Double, Long, String)].collect().toSeq
    assert(buckets.map(_._1).sorted === got.map(_._1).sorted)
    buckets.groupBy(_._2).foreach { case (lang, g) =>
      val sizes = g.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set(1L, 2L, 3L), lang)
      assert(sizes.values.max - sizes.values.min <= 1, lang)
      assert(g.filter(_._4 == 1L).map(_._3).min >=
        g.filter(_._4 == 2L).map(_._3).max - 1e-12, lang)
      assert(g.filter(_._4 == 2L).map(_._3).min >=
        g.filter(_._4 == 3L).map(_._3).max - 1e-12, lang)
      assert(g.forall(r => r._5 == Map(1L -> "head", 2L -> "middle",
        3L -> "tail")(r._4)), lang)
    }
  }

  test("q240 span corruption matches a brute-force Scala mask; " +
      "q241 pairs are strict preferences; q242 sorted batching never " +
      "pads more than arrival order") {
    val P = 1000000007L
    val docsRows = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // q240 brute force
    val expected = docsRows.map { case (id, text) =>
      val n = text.split(" ", -1).length
      def h(p: Int): Long = (id * 1000003L + p * 7919L) % P
      val cov = (0 until n).map { p =>
        (0 to 2).exists { o =>
          p - o >= 0 && h(p - o) % 20 == 0 && 1 + (h(p - o) / 20) % 3 > o
        }
      }
      val masked = cov.count(identity)
      val spans = (0 until n).count(p => cov(p) && (p == 0 || !cov(p - 1)))
      val mh = (0 until n).filter(cov).foldLeft(0L)((a, p) => (a * 131 + p) % P)
      (id, n.toLong, masked.toLong, spans.toLong,
        1000000L * masked / n, mh)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q240_span_corruption")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // q241: strict margins, no doc reused within a group, chosen
    // outranks rejected by construction
    val pairs = SparkEntry.queries("q241_preference_pairs")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._6 > 0), "margins must be strictly positive")
    pairs.groupBy(p => (p._1, p._2)).foreach { case (g, ps) =>
      val ids = ps.flatMap(p => Seq(p._4, p._5))
      assert(ids.distinct.size === ids.size, s"group $g reuses a doc")
    }
    // q242: per (shard): sorted total pad <= arrival total pad, row
    // conservation, batches full except the last
    val b = SparkEntry.queries("q242_batch_padding")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val byPol = b.groupBy(_._1)
    assert(byPol.keySet === Set("arrival", "sorted"))
    (0L until 16L).foreach { sh =>
      val a = byPol("arrival").filter(_._2 == sh)
      val s2 = byPol("sorted").filter(_._2 == sh)
      assert(a.map(_._4).sum === s2.map(_._4).sum, s"shard $sh rows")
      assert(s2.map(_._7).sum <= a.map(_._7).sum, s"shard $sh pad")
      Seq(a, s2).foreach { g =>
        val last = g.map(_._3).max
        g.filter(_._3 < last).foreach(r => assert(r._4 === 8L, s"shard $sh"))
      }
    }
  }

  test("q76 bounded-heap sample equals the window-sort formulation") {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("h", pmod($"doc_id" * lit(2654435761L), lit(4294967296L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy($"h".desc, $"doc_id".asc)
    val viaWindow = d.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= 25)
      .select($"lang", $"rnk", $"doc_id", $"h".cast("bigint").as("h"))
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val viaAgg = SparkEntry.queries("q76_stratified_sample")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(viaAgg.toSeq === viaWindow.toSeq)
    // exactly-k per stratum (strata here are larger than k)
    assert(viaAgg.groupBy(_._1).values.forall(_.length === 25))
  }

  test("Scrub.downsampleFrequentTokens: tail untouched, head thinned, " +
      "subsequence law, deterministic, null/empty totality") {
    import graft.operators.Scrub
    // all-distinct corpus of ≥1000 tokens: every word's frequency is
    // 1/N ≤ t=1e-3, nothing is droppable → identity. (On a TINY corpus
    // even singletons exceed the frequency threshold and thin — that is
    // the formula, not a bug: f = 1/N >> t.)
    val tailTexts = (0 until 2).map(d =>
      (d.toLong + 1L, (0 until 600).map(i => s"w${d}_$i").mkString(" ")))
    val tail = tailTexts.toDF("doc_id", "text")
    val tailOut = Scrub.downsampleFrequentTokens(tail, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(tailOut === tailTexts.map { case (id, t) => (id, t, 600L) })

    // real corpus: head words thin, rare words never dropped, every
    // output is a positional subsequence of its input
    val d = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")
    val out = Scrub.downsampleFrequentTokens(d, "doc_id", "text")
    val joined = d.join(out, "doc_id")
      .select($"doc_id", $"text", $"ds_text", $"n_kept")
      .as[(Long, String, String, Long)].collect()
    val freq = d.as[(Long, String)].collect()
      .flatMap(_._2.split(" ", -1)).groupBy(identity).view.mapValues(_.length)
    val nTok = freq.values.sum
    joined.foreach { case (id, orig, ds, nk) =>
      val ow = orig.split(" ", -1).toSeq
      val dw = if (ds.isEmpty) Seq.empty else ds.split(" ", -1).toSeq
      assert(dw.size === nk, s"doc $id")
      // subsequence check: dw embeds into ow in order
      var i = 0
      dw.foreach { w =>
        val j = ow.indexOf(w, i)
        assert(j >= 0, s"doc $id: '$w' not a subsequence element")
        i = j + 1
      }
      // words below the droppable bound survive in full
      val hotBound = nTok / 1000L
      val owHot = ow.filter(w => freq(w) > hotBound)
      assert(dw.size >= ow.size - owHot.size, s"doc $id dropped a tail word")
    }
    // head genuinely thinned on this corpus
    assert(joined.map(_._4).sum < joined.map(_._2.split(" ", -1).length.toLong).sum)
    // deterministic re-run
    val again = Scrub.downsampleFrequentTokens(d, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(again === out.as[(Long, String, Long)].collect().toSet)

    // totality: NULL text → NULL; a doc whose token always drops → ('', 0)
    // (forced by a tiny threshold over a two-word corpus is impossible to
    // pin deterministically, so assert the NULL path only)
    val nulls = Seq((9L, Option.empty[String]), (10L, Option("x x x"))).toDF("doc_id", "text")
    val nOut = Scrub.downsampleFrequentTokens(nulls, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(nOut.head === ((9L, None, None)))
    assert(nOut(1)._2.isDefined && nOut(1)._3.isDefined)
  }

  test("q273 BM25: engine top-10 equals the brute-force scorer") {
    val queryDefs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("customer", "query"), 2L -> Seq("vector", "merge"),
      3L -> Seq("stream", "window", "sort"), 4L -> Seq("hash", "join"))
    val corpus = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val nDocs = corpus.size.toLong
    val sumDl = corpus.map(_._2.size.toLong).sum
    val tf = corpus.map { case (id, ws) =>
      (id, ws.size.toLong, ws.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val df = queryDefs.flatMap(_._2).distinct
      .map(t => t -> tf.count(_._3.contains(t)).toLong).toMap
    val expected = queryDefs.flatMap { case (qid, terms) =>
      val scored = tf.flatMap { case (id, dl, m) =>
        val s = terms.filter(m.contains).map { t =>
          math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
            (m(t) * 2.2) / (m(t) + 1.2 * (0.25 + 0.75 * dl * nDocs / sumDl))
        }.sum
        if (terms.exists(m.contains))
          Some((id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1L, id, s) }
    }
    val got = SparkEntry.queries("q273_bm25_topk")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
  }

  test("bradleyTerry: count-scale invariance, dominance order, " +
      "symmetric equality, bound guards") {
    import graft.operators.Preference.bradleyTerry
    // dominance chain: 0 beats 1 beats 2, transitively consistent
    val chain = Seq((0L, 1L, 8L), (0L, 2L, 9L), (1L, 2L, 7L),
      (1L, 0L, 2L), (2L, 0L, 1L), (2L, 1L, 3L))
      .toDF("winner", "loser", "n")
    val s1 = bradleyTerry(chain, "winner", "loser", "n")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s1.map(_._1) === Seq(0L, 1L, 2L))
    val strengths = s1.map(r => r._1 -> r._4).toMap
    assert(strengths(0L) > strengths(1L) && strengths(1L) > strengths(2L))
    assert(s1.map(_._2) === Seq(20L, 20L, 20L)) // games per player
    assert(s1.map(_._3) === Seq(17L, 9L, 4L))   // wins
    // MM is invariant to scaling every count (W and n scale together) —
    // exactly in the reals; the fixed-point floor divides commute with
    // the scaling only to ±1 micro-unit per player per iteration's
    // final normalization, so the law is a tight band, not equality.
    val doubled = chain.withColumn("n", $"n" * 2)
    val s2 = bradleyTerry(doubled, "winner", "loser", "n")
      .as[(Long, Long, Long, Long)].collect().toSeq
    s2.foreach { r =>
      assert(math.abs(r._4 - strengths(r._1)) <= 2L,
        s"player ${r._1}: ${r._4} vs ${strengths(r._1)}")
    }
    // perfectly symmetric round-robin ⇒ equal strengths (the prior S)
    val sym = Seq((0L, 1L, 5L), (1L, 0L, 5L), (0L, 2L, 5L), (2L, 0L, 5L),
      (1L, 2L, 5L), (2L, 1L, 5L)).toDF("winner", "loser", "n")
    val s3 = bradleyTerry(sym, "winner", "loser", "n")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s3.map(_._4).distinct === Seq(1000000L))
    // loud bound: too many players refuses
    val big = (0L until 70L).map(i => (i, i + 100L, 1L))
      .toDF("winner", "loser", "n")
    val e = intercept[IllegalArgumentException] {
      bradleyTerry(big, "winner", "loser", "n", maxPlayers = 8)
    }
    assert(e.getMessage.contains("census exceeds"))
  }

  test("q275 advantage: brute-force integer z-scores match; " +
      "group sums stay near zero") {
    import graft.functions.TextFunctions.markerHits
    val scored = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id",
        (lit(1000L) * markerHits($"text", Seq("the", "a", "of", "and", "to"))
          .cast("bigint")
          + size(split($"text", " ")).cast("bigint")).as("reward"))
      .as[(Long, Long)].collect().toSeq
    def isqrt(v: BigInt): Long = {
      if (v <= 0) 0L
      else {
        val r0 = math.floor(math.sqrt(v.toDouble)).toLong
        if (BigInt(r0 + 1) * (r0 + 1) <= v) r0 + 1
        else if (BigInt(r0) * r0 > v) r0 - 1 else r0
      }
    }
    val expected = scored.groupBy(_._1 / 8).toSeq.flatMap { case (p, cs) =>
      val n = cs.size.toLong
      val sr = cs.map(_._2).sum
      val sr2 = cs.map(c => c._2 * c._2).sum
      val s = isqrt(BigInt(n) * sr2 - BigInt(sr) * sr)
      cs.map { case (id, r) =>
        val num = n * r - sr
        val adv = if (s > 0) num.sign * (math.abs(num) * 1000L / s) else 0L
        (p, id, r, n, adv)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q275_grpo_advantage")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // floor rounding loses < 1 milli per row, so each group sums near 0
    got.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._5).sum) <= g.size.toLong)
    }
  }

  test("q284 best-of-n curve: brute-force prefix maxima match; " +
      "curve is monotone in n") {
    import graft.functions.TextFunctions.markerHits
    val scored = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id",
        (lit(1000L) * markerHits($"text", Seq("the", "a", "of", "and", "to"))
          .cast("bigint")
          + size(split($"text", " ")).cast("bigint")).as("reward"))
      .as[(Long, Long)].collect().toSeq
    val expected = Seq(1L, 2L, 4L, 8L).map { n =>
      val bests = scored.filter(c => c._1 % 8 < n)
        .groupBy(_._1 / 8).values.map(_.map(_._2).max).toSeq
      (n, bests.size.toLong, bests.sum, 1000L * bests.sum / bests.size)
    }
    val got = SparkEntry.queries("q284_bon_scaling")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // more samples can only help: mean best reward is non-decreasing
    got.map(_._4).sliding(2).foreach(p => assert(p(0) <= p(1)))
  }

  test("q285 prefix sharing: brute-force group LCP matches; " +
      "planted prompt prefix makes every group share") {
    val corpus = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val expected = corpus
      .map { case (id, t) => (id / 8, s"prompt ${id / 8} : $t".take(200)) }
      .groupBy(_._1).toSeq.map { case (p, rs) =>
        val texts = rs.map(_._2)
        val lcp = texts.reduce { (a, b) =>
          a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1).mkString
        }.length.toLong
        (p, rs.size.toLong, lcp, (rs.size - 1) * lcp)
      }.sortBy(_._1)
    val got = SparkEntry.queries("q285_prefix_sharing")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // the planted "prompt <id> : " prefix is shared by construction
    got.foreach { r =>
      assert(r._3 >= s"prompt ${r._1} : ".length,
        s"group ${r._1} lost its planted prefix")
    }
  }

  test("q283 hybrid RRF: internal consistency — scores recompute from " +
      "ranks, every fused doc appears in at least one run") {
    val got = SparkEntry.queries("q283_hybrid_rrf")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, rLex, rDense, rrf) =>
      assert(rLex > 0 || rDense > 0)
      val expect = (if (rLex > 0) 1000000L / (60 + rLex) else 0L) +
        (if (rDense > 0) 1000000L / (60 + rDense) else 0L)
      assert(rrf === expect)
    }
    // within each query: ranks strictly ordered by (rrf desc, doc asc)
    got.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach { p =>
        if (p.size == 2)
          assert(p(0)._6 > p(1)._6 ||
            (p(0)._6 == p(1)._6 && p(0)._3 < p(1)._3))
      }
    }
  }

  test("q295 merge sweep is non-vacuous: the 12-merge model genuinely " +
      "compresses past the 3-merge model") {
    import graft.operators.Bpe
    val d = Tables.load(spark, sfDir, "documents")
    val merges = Bpe.learnMerges(d, "text", numMerges = 12)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size === 12)
    def total(p: Int): Long =
      Bpe.subwordStats(d, "doc_id", "text", merges.take(p))
        .agg(sum("n_subwords")).as[Long].head()
    val t3 = total(3)
    val t12 = total(12)
    assert(t12 < t3, s"sweep vacuous: c3 total $t3, c12 total $t12")
  }

  test("q296 late-data audit: two-phase running max equals the " +
      "sequential brute force") {
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    var run = Long.MinValue
    val rows = ev.map { case (_, t, us) =>
      val dis = if (run == Long.MinValue || run < us) 0L else run - us
      run = math.max(run, us)
      (t, dis)
    }
    val hr = 3600L * 1000000L
    val expected = rows.groupBy(_._1).toSeq.map { case (t, ds) =>
      (t, ds.size.toLong,
        ds.count(_._2 > hr).toLong, ds.count(_._2 > 6 * hr).toLong,
        ds.count(_._2 > 24 * hr).toLong, ds.map(_._2).max / 1000000L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q296_late_data_audit")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("q298 scorecard: flags recompute from the published values; " +
      "signal columns agree with q278/q279") {
    val got = SparkEntry.queries("q298_corpus_scorecard")(spark, sfDir)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7), r.getBoolean(8), r.getBoolean(9), r.getBoolean(10))
      }.toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, vocab, normEnt, slope, fd, fe, fz, adm) =>
      assert(fd === (vocab < 16L))
      assert(fe === (normEnt < 0.55))
      assert(fz === (slope > -0.35))
      assert(adm === (!fd && !fe && !fz))
    }
    // signals match the standalone monitors
    val ent = SparkEntry.queries("q278_entropy_profile")(spark, sfDir)
      .select("source", "entropy").as[(String, Double)].collect().toMap
    val zipf = SparkEntry.queries("q279_zipf_slope")(spark, sfDir)
      .select("source", "slope").as[(String, Double)].collect().toMap
    val card = SparkEntry.queries("q298_corpus_scorecard")(spark, sfDir)
      .select("source", "entropy", "slope")
      .as[(String, Double, Double)].collect().toSeq
    card.foreach { case (s0, e, z) =>
      assert(e === ent(s0) && z === zipf(s0), s"source $s0 drifted")
    }
  }

  test("q276 self-overlap: brute-force set Jaccard matches") {
    val corpus = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Set.empty
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val expected = corpus.map { case (id, t) => (id / 8, id, grams(t)) }
      .groupBy(_._1).toSeq.flatMap { case (p, ds) =>
        val pairs = for {
          a <- ds; b <- ds if a._2 < b._2
        } yield {
          val inter = (a._3 & b._3).size.toLong
          val uni = a._3.size.toLong + b._3.size - inter
          if (uni > 0) 1000000L * inter / uni else 0L
        }
        if (pairs.isEmpty) None
        else Some((p, pairs.size.toLong, pairs.sum / pairs.size))
      }.sortBy(_._1)
    val got = SparkEntry.queries("q276_group_self_overlap")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }
}
