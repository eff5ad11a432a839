package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Semantics of the dedup family on tiny synthetic corpora where the
  * expected answers are computable by hand, plus the planted-pair recall
  * contract on the sf0.001 documents table (rows-only-checked operators
  * like SimHash get their real guarantee pinned here, not by the oracle).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "en", "the quick brown fox jumps over the lazy dog today"),  // near-dup of 1
    (3L, "en", "completely different words in this unrelated sentence here now"),
    (4L, "de", "der schnelle braune fuchs springt ueber den faulen hund heute")
  ).toDF("doc_id", "lang", "text")

  test("exactDuplicates: representative + multiplicity") {
    val out = Dedup.exactDuplicates(docsDf, "doc_id", Seq("lang"))
      .orderBy("lang").as[(String, Long, Long)].collect()
    assert(out === Array(("de", 4L, 1L), ("en", 1L, 3L)))
  }

  test("dropDuplicatesOrdered keeps the pinned row, deterministically") {
    val out = Dedup.dropDuplicatesOrdered(docsDf, Seq("lang"),
        Seq(col("doc_id").desc))
      .select("lang", "doc_id").orderBy("lang").as[(String, Long)].collect()
    assert(out === Array(("de", 4L), ("en", 3L)))
  }

  test("LSH near-dup pairs find the planted pair and nothing else (tiny corpus)") {
    // Docs 1/2 are 10 words differing only in the last → 8 shingles each,
    // 7 shared, union 9 ⇒ j = 7/9 ≈ 0.778. The default 8×8 banding targets
    // ~0.77 where recall at 0.778 is probabilistic, so pin bands=32
    // (rows=2): miss probability (1-j²)^32 ≈ 7e-13.
    val pairs = Dedup.lshNearDupPairs(docsDf, "doc_id", "text",
        threshold = 0.5, numPerm = 64, bands = 32)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(math.abs(pairs.head._3 - 7.0 / 9.0) < 1e-6)
  }

  test("LshLayout: probe reads the persisted model (not caller params), " +
      "catches the planted near-dup, admits the novel doc, and a " +
      "non-layout dir is loud") {
    import graft.operators.LshLayout
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_layout_spec").toString
    val history = docsDf.toDF("doc_id", "lang", "text")
    LshLayout.writeLshLayout(history, "doc_id", "text", dir,
      nlist = 8, nparts = 4)
    val batch = Seq(
      (10L, "en", "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "en", "completely unrelated novel content with fresh words")
    ).toDF("doc_id", "lang", "text")
    val kept = LshLayout.dedupAgainstLayout(dir, batch, "doc_id", "text",
      threshold = 0.8).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L),
      s"expected only the novel doc to survive, got $kept")
    // append the survivor; re-probing it finds its own stored copy
    LshLayout.appendLshLayout(dir,
      batch.filter($"doc_id" === 11L), "doc_id", "text")
    assert(LshLayout.dedupAgainstLayout(dir, batch.filter($"doc_id" === 11L),
      "doc_id", "text", threshold = 0.8).isEmpty,
      "appended survivor not found by the incremental probe")
    val e = intercept[IllegalArgumentException] {
      LshLayout.dedupAgainstLayout(dir + "/nope", batch, "doc_id", "text",
        0.8)
    }
    assert(e.getMessage.contains("not an LSH layout"))
  }

  test("LshLayout.purge: every victim trace gone, survivors still " +
      "indexed, untouched partitions bit-identical") {
    import graft.operators.LshLayout
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_purge_spec").toString
    val nparts = 4
    LshLayout.writeLshLayout(docsDf, "doc_id", "text", dir,
      nlist = 8, nparts = nparts)
    def crcs: Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map { p =>
          val c = new java.util.zip.CRC32()
          c.update(java.nio.file.Files.readAllBytes(p))
          p.toString -> c.getValue
        }.toMap
    }
    val victims = Seq(1L, 2L) // the near-dup pair — both forgotten
    val victimBuckets = spark.read.parquet(s"$dir/keys")
      .filter($"id".isin(victims: _*))
      .select("bucket").distinct().as[Int].collect().toSet
    val victimParts = victims.map(_ % nparts).toSet
    val before = crcs
    LshLayout.purge(spark, dir, victims)
    assert(spark.read.parquet(s"$dir/keys")
      .filter($"id".isin(victims: _*)).count() === 0L,
      "band keys of a purged doc survive in keys/")
    assert(spark.read.parquet(s"$dir/sets")
      .filter($"id".isin(victims: _*)).count() === 0L,
      "shingle-hash set of a purged doc survives in sets/")
    val after = crcs
    before.foreach { case (p, c) =>
      val touched =
        victimBuckets.exists(b => p.contains(s"/keys/bucket=$b/")) ||
          victimParts.exists(x => p.contains(s"/sets/part=$x/"))
      if (!touched)
        assert(after.get(p).contains(c),
          s"untouched partition file $p was rewritten by the purge")
    }
    // the forgotten pair probes as NEW (their only near-dups — each
    // other — are gone too); the survivors still self-match
    val admitted = LshLayout.dedupAgainstLayout(dir, docsDf, "doc_id",
        "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(1L, 2L),
      s"post-purge admission drifted: $admitted (expected the purged " +
        "pair admitted as new, the survivors still caught)")
  }

  test("LshLayout.purge: the key-relation overload equals the id-list path") {
    import graft.operators.LshLayout
    def build() = {
      val d = java.nio.file.Files
        .createTempDirectory("graft_lsh_purge_eq").toString
      LshLayout.writeLshLayout(docsDf, "doc_id", "text", d,
        nlist = 8, nparts = 4)
      d
    }
    def stores(d: String) = Seq("keys", "sets").map { sub =>
      spark.read.parquet(s"$d/$sub").collect().map(_.toString).sorted.toSeq
    }
    val (a, b) = (build(), build())
    LshLayout.purge(spark, a, Seq(1L, 2L))
    LshLayout.purge(spark, b, Seq((1L), (2L)).toDF("forget_id"))
    assert(stores(a) === stores(b),
      "key-relation purge diverged from the id-list purge")
  }

  test("blockedJaccardPairs never crosses blocks") {
    val exact = Dedup.blockedJaccardPairs(docsDf, "doc_id", "text",
        Seq("lang"), threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(exact.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
  }

  test("LSH output equals unblocked exact Jaccard pairs on sf0.001 planted near-dups") {
    val docs = Tables.load(spark, sfDir, "documents")
    // Empty blockCols ⇒ pure salted all-pairs (the exact ground truth).
    val exact = Dedup.blockedJaccardPairs(docs, "doc_id", "text",
        Seq.empty, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dup pairs")
    assert(lsh === exact,
      s"LSH missed ${(exact -- lsh).size}, hallucinated ${(lsh -- exact).size}")
  }

  test("lshNearDupPairs: salting-invariant under a forced hot-band re-salt") {
    // maxBandRows=2 forces the proportional re-salt path on essentially
    // every band key (each signature band groups many docs at sf0.001);
    // the a-salted/b-replicated scheme meets each pair exactly once, so
    // the verified output cannot move.
    val docs = Tables.load(spark, sfDir, "documents")
    val cold = Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val hot = Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.8,
        saltBuckets = 4, maxBandRows = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(cold.nonEmpty)
    assert(cold === hot)
  }

  test("repeatedGramProfile: hand-checked shared/unique gram counts") {
    // a/b share their first 8-gram (identical first 9 words except the
    // last differs → grams: a has [w1..w8],[w2..w9a]; b has
    // [w1..w8],[w2..w9b]) ⇒ each doc: 2 grams, 1 shared. c is short
    // (<8 words) ⇒ whole-text gram, unique ⇒ 0 shared. d duplicates c
    // exactly ⇒ both whole-text grams become shared.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 end1"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 end2"),
      (3L, "short doc here"),
      (4L, "short doc here")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedGramProfile(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 1.0), (4L, 1L, 1L, 1.0)))
  }

  test("simhash ranks a near-dup closer than an unrelated doc") {
    val fp = Dedup.simhash(docsDf, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)))
  }

  test("simhashPairs pigeonhole: identical docs always found, unrelated never at <=3") {
    val withCopy = docsDf.union(Seq(
      (5L, "en", "the quick brown fox jumps over the lazy dog tonight")).toDF())
    val atZero = Dedup.simhashPairs(withCopy, "doc_id", "text", maxHamming = 0)
      .as[(Long, Long, Long)].collect()
    assert(atZero.exists(p => p._1 == 1L && p._2 == 5L))
    val strict = Dedup.simhashPairs(docsDf, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(!strict.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearDupComponents: chains collapse to the min-id representative") {
    // 1-2, 2-3 chain plus isolated pair 10-11: components {1,2,3}, {10,11}.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.nearDupComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("nearDupComponents: driver union-find and distributed loop agree") {
    // chain 1-2-3-4 + isolated pair (10,11): two components, min reps.
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expected = Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L))
    val driver = Dedup.nearDupComponents(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val distributed = Dedup.nearDupComponents(pairs, maxDriverEdges = 0L)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(driver === expected)
    assert(distributed === expected)
  }

  test("nearDupComponents under a reliable checkpoint dir ≡ the localCheckpoint fast path") {
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val local = Dedup.nearDupComponents(pairs, maxDriverEdges = 0L)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_dedup").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = Dedup.nearDupComponents(pairs, maxDriverEdges = 0L)
        .orderBy("doc_id").as[(Long, Long)].collect()
      assert(reliable === local)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("contaminationHits finds exactly the docs sharing an n-gram with the benchmark") {
    // doc 1 (bench) and doc 2 (corpus) are 10 words differing only in
    // the last → their first two 8-grams coincide; docs 3/4 share none.
    val bench = docsDf.filter(col("doc_id") === 1)
    val corpus = docsDf.filter(col("doc_id") =!= 1)
    val out = Dedup.contaminationHits(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(out === Array((2L, 2L)))
    // A doc shorter than n words participates as one whole-text gram:
    // an exact copy of it in the corpus is flagged with one hit.
    val shortDocs = Seq((10L, "tiny doc"), (11L, "tiny doc"), (12L, "other words"))
      .toDF("doc_id", "text")
    val shortOut = Dedup.contaminationHits(
        shortDocs.filter(col("doc_id") =!= 10), shortDocs.filter(col("doc_id") === 10),
        "doc_id", "text", n = 8)
      .as[(Long, Long)].collect()
    assert(shortOut === Array((11L, 1L)))
  }

  test("sortedNeighborhoodPairs: same-block neighbors within distance, blocking bounds recall") {
    val docs = Seq(
      // Same 16-char block, 1 edit apart within the probe → found.
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fax jumps over the lazy dog tonight"),
      // Same block but far beyond maxDist → suppressed.
      (3L, "the quick brown cat completely different tail text zzzz"),
      // Near-dup of doc 1 that diverges INSIDE the block prefix →
      // different block, missed by design (the documented SNM tradeoff).
      (4L, "teh quick brown fox jumps over the lazy dog tonight"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        blockLen = 16, probeLen = 60, window = 4, maxDist = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1)))
    // Wider blocking (shorter block prefix) recovers the cross-block pair.
    val wide = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        blockLen = 1, probeLen = 60, window = 4, maxDist = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(wide.contains((1L, 4L, 2)) && wide.contains((1L, 2L, 1)))
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text", window = 1)
    }
  }

  test("salting does not change blockedJaccardPairs results") {
    val r1 = Dedup.blockedJaccardPairs(docsDf, "doc_id", "text", Seq("lang"),
      threshold = 0.1, saltBuckets = 1).as[(Long, Long, Double)].collect().toSet
    val r16 = Dedup.blockedJaccardPairs(docsDf, "doc_id", "text", Seq("lang"),
      threshold = 0.1, saltBuckets = 16).as[(Long, Long, Double)].collect().toSet
    assert(r1 === r16 && r1.nonEmpty)
  }

  test("skew guard re-salts oversized blocks proportionally without changing results") {
    // One dominant block (200 'en' docs built from the sf0.001 corpus) vs
    // a 4-row 'de' block; cap 50 forces the en block to 4× the base salt.
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
      .select(col("doc_id"), lit("en").as("lang"), col("text"))
      .union(docsDf.filter(col("lang") === "de").select("doc_id", "lang", "text"))
    val salts = Dedup.blockSalts(docs, Seq("lang"), saltBuckets = 8, maxBlockRows = 50)
      .as[(String, Long)].collect().toMap
    assert(salts("en") === 32L && salts("de") === 8L) // ceil(200/50)*8, ceil(4/50)*8
    // A-side slices respect the cap: rows per (block, salt) stay near
    // blockSize/saltN — the whole point of the guard (hash-uniformity
    // slack of 2× on the expected ~6 rows/slice).
    val sliced = docs.join(
        broadcast(Dedup.blockSalts(docs, Seq("lang"), 8, 50)), Seq("lang"))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), col("__salt_n")))
      .groupBy("lang", "salt").count()
      .agg(max("count")).as[Long].head()
    assert(sliced <= 50, s"largest salted slice $sliced exceeds the 50-row cap")
    val guarded = Dedup.blockedJaccardPairs(docs, "doc_id", "text", Seq("lang"),
      threshold = 0.8, maxBlockRows = 50).as[(Long, Long, Double)].collect().toSet
    val baseline = Dedup.blockedJaccardPairs(docs, "doc_id", "text", Seq("lang"),
      threshold = 0.8, maxBlockRows = Int.MaxValue).as[(Long, Long, Double)].collect().toSet
    assert(guarded === baseline && guarded.nonEmpty)
  }

  test("newAgainstHistory: exact NOT-EXISTS semantics, NULL text never matches") {
    val history = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha"), (11L, "gamma"), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.newAgainstHistory(history, batch, "text")
      .select("doc_id").as[Long].collect().toSet
    // "alpha" already exists; NULL text equals nothing (SQL semantics),
    // so the NULL batch row is new even though history also has a NULL.
    assert(out === Set(11L, 12L))
    // helper column must not leak into the output schema
    assert(!Dedup.newAgainstHistory(history, batch, "text").columns.contains("__fp"))
  }

  test("lshNewAgainstHistory: drops near-dups of history, keeps novel + NULL text") {
    // History holds doc 1; the batch carries its near-dup (j = 7/9, far
    // above the bands=32 S-curve at threshold 0.5), a novel doc, and a
    // NULL text. The near-dup is dropped; the novel doc survives; NULL
    // text has no shingles, so — like newAgainstHistory's SQL-equality
    // semantics — it can never match history and is kept as new.
    val history = docsDf.filter(col("doc_id") === 1L)
    val batch = Seq(
      (10L, "en", "the quick brown fox jumps over the lazy dog today"),
      (11L, "en", "completely different words in this unrelated sentence here now"),
      (12L, "en", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.lshNewAgainstHistory(history, batch, "doc_id", "text",
        threshold = 0.5, bands = 32)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(11L, 12L))
    // Output schema is the batch's own — no helper columns leak.
    assert(Dedup.lshNewAgainstHistory(history, batch, "doc_id", "text",
      threshold = 0.5, bands = 32).columns.toSeq === batch.columns.toSeq)
  }

  test("lshNewAgainstHistory: salting-invariant under a forced hot-band re-salt") {
    // maxBandRows=2 pushes essentially every history band through the
    // proportional re-salt path; the salted/replicated scheme meets each
    // (batch, history) candidate exactly once, so the verified survivor
    // set cannot move.
    val docs = Tables.load(spark, sfDir, "documents")
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 2 === 0)
    def run(salts: Int, cap: Int) =
      Dedup.lshNewAgainstHistory(history, batch, "doc_id", "text",
          threshold = 0.8, saltBuckets = salts, maxBandRows = cap)
        .select("doc_id").as[Long].collect().toSet
    val cold = run(8, 4096)
    assert(cold.nonEmpty && cold.size < batch.count())
    assert(cold === run(4, 2))
  }

  private def spanCorpus = {
    // Doc 1 embeds a 12-word run shared with doc 2 at offset 4; with
    // n=8 the duplicated grams start at positions 4..8 (doc 1) / 0..4
    // (doc 2), merging to exactly the shared run: [4,16) / [0,12).
    // Docs 5/6 are identical 5-word shorties (whole-text gram, span
    // [0,5)); doc 7 repeats an 8-gram WITHIN itself only (distinct-doc
    // frequency 1 — not boilerplate); doc 3 is novel, doc 4 NULL.
    val run = (0 until 12).map(i => s"r$i").mkString(" ")
    Seq(
      (1L, s"a0 a1 a2 a3 $run a4 a5 a6 a7"),
      (2L, s"$run b0 b1 b2 b3 b4 b5 b6 b7"),
      (3L, "novel words only here nothing shared with anyone else at all"),
      (4L, null.asInstanceOf[String]),
      (5L, "tiny dup doc case x"),
      (6L, "tiny dup doc case x"),
      (7L, ((0 until 8) ++ (0 until 8)).map(i => s"g$i").mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("duplicateSpans: merged cross-doc spans; intra-doc repeats don't count") {
    val out = Dedup.duplicateSpans(spanCorpus, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 16L, 12L), (2L, 0L, 12L, 12L),
      (5L, 0L, 5L, 5L), (6L, 0L, 5L, 5L)))
  }

  test("exciseDuplicateSpans: scrubs spans, keeps novel text, '' distinct from NULL") {
    val out = Dedup.exciseDuplicateSpans(spanCorpus, "doc_id", "text", n = 8)
      .select("doc_id", "clean_text", "n_kept")
      .orderBy("doc_id")
      .as[(Long, String, java.lang.Long)].collect().toSeq
    assert(out === Seq(
      (1L, "a0 a1 a2 a3 a4 a5 a6 a7", 8L: java.lang.Long),
      (2L, "b0 b1 b2 b3 b4 b5 b6 b7", 8L: java.lang.Long),
      (3L, "novel words only here nothing shared with anyone else at all",
        11L: java.lang.Long),
      (4L, null, null),
      (5L, "", 0L: java.lang.Long),
      (6L, "", 0L: java.lang.Long),
      (7L, "g0 g1 g2 g3 g4 g5 g6 g7 g0 g1 g2 g3 g4 g5 g6 g7",
        16L: java.lang.Long)))
  }

  test("bloomNewAgainstHistory ≡ newAgainstHistory; NULL text survives; fpp-invariant") {
    val d = Tables.load(spark, sfDir, "documents")
    val history = d.filter(col("doc_id") % 3 =!= 0)
    val batch = Seq(
      (9000L, "en", "brand new words never seen in any history document"),
      (9001L, "en", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
      .unionByName(d.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "text"))
    val exact = Dedup.newAgainstHistory(history, batch, "text")
      .select("doc_id").as[Long].collect().toSet
    // A deliberately under-sized sketch (high fpp) forces many batch
    // rows through the verify join: the OUTPUT cannot move.
    for (items <- Seq(1L << 4, 1L << 16)) {
      val out = Dedup.bloomNewAgainstHistory(history, batch, "text",
          expectedItems = items)
        .select("doc_id").as[Long].collect().toSet
      assert(out === exact, s"expectedItems=$items")
    }
    assert(exact.contains(9000L) && exact.contains(9001L))
  }

  test("crossCorpusOverlap: hand-computed Jaccard, disjoint and NULL sources absent") {
    // Short texts are whole-text grams: A={x,y}, B={y,z}, C={q}; the
    // NULL text contributes nothing to B's set size. Only (A,B) share:
    // n_common 1, jaccard 1/(2+2-1) = 1/3.
    val corpus = Seq(
      (1L, "A", "x"), (2L, "A", "y"),
      (3L, "B", "y"), (4L, "B", "z"), (5L, "B", null.asInstanceOf[String]),
      (6L, "C", "q")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.crossCorpusOverlap(corpus, "source", "text", n = 8)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("A", "B", 1L, 0.333333)))
  }

  test("saltCensus fails loudly (names the block) instead of wrapping past the cap") {
    // 100 rows in one block, cap 1 row/slice, 16 base salts -> 1600
    // slices, over the deliberately tiny 512 cap: must throw with the
    // offending block named, never int-wrap into silently dropped pairs.
    val docs = (1 to 100).map(i => (i.toLong, "en", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.saltCensus(docs, Seq("lang"), saltBuckets = 16, maxBlockRows = 1,
        maxSaltsPerBlock = 512L)
    }
    assert(ex.getMessage.contains("lang=en") && ex.getMessage.contains("1600"))
    // census values stay LONG (no int cast anywhere on the salt path)
    val (census, rows) = Dedup.saltCensus(docs, Seq("lang"), 16, 1)
    assert(census.schema("__salt_n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(rows.head.getLong(1) === 1600L)
  }

  test("q292 band sweep is non-vacuous: more bands genuinely widen the " +
      "candidate net at a low threshold, and nesting still holds") {
    val d = Tables.load(spark, sfDir, "documents")
    def pairsAt(bands: Int, thr: Double): Set[(Long, Long)] =
      Dedup.lshNearDupPairs(d, "doc_id", "text", threshold = thr,
          numPerm = 64, bands = bands)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // At a threshold low enough that banding recall bites, the sweep's
    // inclusion must be STRICT somewhere — otherwise the q292 gate
    // could pass on three identical (even empty) sets forever.
    val p4 = pairsAt(4, 0.15)
    val p8 = pairsAt(8, 0.15)
    val p16 = pairsAt(16, 0.15)
    assert(p16.nonEmpty)
    assert(p4.subsetOf(p8) && p8.subsetOf(p16))
    assert(p16.size > p4.size,
      s"sweep vacuous: |p4|=${p4.size} |p8|=${p8.size} |p16|=${p16.size}")
  }

  test("q297 contamination sweep is non-vacuous: shorter n-grams " +
      "genuinely flag more docs; nesting holds") {
    import graft.functions.TextFunctions.words
    val d = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).filter(size(words($"text")) >= 13)
    val corpus = d.filter($"doc_id" % 10 =!= 0)
    val bench = d.filter($"doc_id" % 10 === 0)
    def hitsAt(n: Int): Set[Long] =
      Dedup.contaminationHits(corpus, bench, "doc_id", "text", n)
        .select("doc_id").as[Long].collect().toSet
    val h4 = hitsAt(4)
    val h8 = hitsAt(8)
    val h13 = hitsAt(13)
    assert(h13.subsetOf(h8) && h8.subsetOf(h4))
    assert(h4.nonEmpty)
    assert(h4.size > h13.size,
      s"sweep vacuous: |h4|=${h4.size} |h8|=${h8.size} |h13|=${h13.size}")
  }
}
