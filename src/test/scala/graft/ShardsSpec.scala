package graft

import graft.operators.Shards
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_shards_test").toString

  test("tar round trip: empty, block-aligned, and odd-size payloads") {
    val out = tmpDir()
    // payload sizes 0, 512 (exact block), 513 (one past), 100
    val docs = Seq(
      (1L, ""), (2L, "x" * 512), (3L, "y" * 513), (4L, "z" * 100))
      .toDF("doc_id", "text")
    Shards.writeTarShards(docs, "doc_id", "text", out, nShards = 1)
    val back = Shards.readTarShards(spark, out)
      .select($"doc_id", $"payload".cast("string").as("t"))
      .as[(Long, String)].collect().toMap
    assert(back === Map(1L -> "", 2L -> "x" * 512, 3L -> "y" * 513,
      4L -> "z" * 100))
  }

  test("written shards parse strictly; corruption fails loudly") {
    val out = tmpDir()
    val docs = (1L to 40L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    Shards.writeTarShards(docs, "doc_id", "text", out, nShards = 4)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).filter(_.endsWith(".tar")).sorted
    assert(files.nonEmpty && files.length <= 4)
    // every entry validates (checksum-checked parse), ids ascend in-shard
    files.foreach { f =>
      val entries = Shards.untar(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
      val ids = entries.map(_._1.stripSuffix(".txt").toLong)
      assert(ids === ids.sorted, s"entries out of order in $f")
    }
    // flip a payload byte inside the first entry -> checksum still ok
    // (payload is not checksummed by tar) but flip a HEADER byte ->
    // the strict parser rejects the archive instead of dropping samples
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(files.head))
    bytes(125) = (bytes(125) ^ 0x01).toByte // inside the size field
    intercept[IllegalArgumentException] { Shards.untar(bytes) }
    // truncation (lost terminator blocks) also fails loudly
    val whole = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(files.head))
    intercept[IllegalArgumentException] {
      Shards.untar(whole.take(whole.length - 1024))
    }
  }

  test("untar round-trips a full 100-byte entry name (no NUL terminator)") {
    // A 100-byte name legally fills the whole ustar name field with no
    // NUL; a parser that scans past byte 99 for the terminator would
    // silently absorb the mode field ("name0000644") into the name.
    val name100 = "d" * 96 + ".txt"
    assert(name100.length === 100)
    val short = "e.txt"
    val bos = new java.io.ByteArrayOutputStream()
    Shards.writeEntry(bos, name100, "payload A".getBytes("UTF-8"))
    Shards.writeEntry(bos, short, "payload B".getBytes("UTF-8"))
    bos.write(new Array[Byte](2 * 512)) // tar terminator
    val entries = Shards.untar(bos.toByteArray)
    assert(entries.map(_._1) === Seq(name100, short))
    assert(entries.map(e => new String(e._2, "UTF-8")) ===
      Seq("payload A", "payload B"))
  }

  test("two attempts of the same partition get distinct tmp shard paths") {
    // Speculative execution / zombie-attempt-plus-retry run the same
    // partition twice in one executor JVM. Same (outDir, shard) but a
    // different attempt id must never share a tmp file, or interleaved
    // writes publish corrupt bytes under a valid shard name.
    val a = Shards.tmpShardPath("/data/out", shard = 3L, attempt = 41L)
    val b = Shards.tmpShardPath("/data/out", shard = 3L, attempt = 42L)
    assert(a !== b)
    // same attempt is stable (the task reopens nothing mid-partition)
    assert(a === Shards.tmpShardPath("/data/out", 3L, 41L))
    // both resolve to the final name via the writer's rename rule
    assert(a.resolveSibling("shard-00003.tar") ===
      b.resolveSibling("shard-00003.tar"))
    // hidden from the *.tar reader glob while in flight
    assert(a.getFileName.toString.startsWith(".") &&
      !a.getFileName.toString.endsWith(".tar"))
  }

  test("generation layout: batches union as one corpus; replay is idempotent") {
    // The q223 streaming export writes one generation dir per micro-batch
    // (`batch=<id>/`). Pin the two laws the sink relies on: (a) the
    // recursive read unions generations into one corpus, and (b) a
    // REPLAYED batch (Structured Streaming re-runs foreachBatch with the
    // same rows after a failure) rewrites its own generation in place —
    // REPLACE_EXISTING publish — so the corpus has no duplicates.
    val out = tmpDir()
    val gen0 = (1L to 20L).map(i => (i, s"g0 doc $i")).toDF("doc_id", "text")
    val gen1 = (21L to 40L).map(i => (i, s"g1 doc $i")).toDF("doc_id", "text")
    Shards.writeTarShards(gen0, "doc_id", "text", s"$out/batch=0", nShards = 4)
    Shards.writeTarShards(gen1, "doc_id", "text", s"$out/batch=1", nShards = 4)
    // replay batch 1 (identical rows — the streaming contract)
    Shards.writeTarShards(gen1, "doc_id", "text", s"$out/batch=1", nShards = 4)
    val back = Shards.readTarShards(spark, out)
      .select($"doc_id", $"payload".cast("string").as("t"))
      .as[(Long, String)].collect()
    assert(back.length === 40, "replayed generation duplicated rows")
    assert(back.toMap === (1L to 40L).map(i =>
      i -> s"g${if (i <= 20) 0 else 1} doc $i").toMap)
  }

  test("token shards: ids round-trip in document order; empties kept; " +
      "half-published and truncated shards fail loudly") {
    import graft.operators.TokenShards
    val out = tmpDir()
    // trailing/double spaces exercise the empties-kept split contract
    val docs = Seq((1L, "alpha beta gamma"), (2L, "one  two "),
      (3L, ""), (4L, "solo")).toDF("doc_id", "text")
    TokenShards.writeTokenShards(docs, "doc_id", "text", out, nShards = 2)
    val back = TokenShards.readTokenShards(spark, out)
      .select($"doc_id", $"ids").as[(Long, Array[Long])].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def ids(s: String): Seq[Long] =
      s.split(" ", -1).toSeq.map(TokenShards.tokenId(md, _))
    assert(back(1L).toSeq === ids("alpha beta gamma"))
    assert(back(2L).toSeq === ids("one  two ") && back(2L).length === 4)
    assert(back(3L).toSeq === ids("") && back(3L).length === 1)
    assert(back(4L).toSeq === ids("solo"))
    // ids match the oracle's hex discipline: first 32 md5 bits
    assert(TokenShards.tokenId(md, "hello") ===
      java.lang.Long.parseLong("5d41402a", 16))
    // orphan .idx (its .bin removed) -> loud failure, not missing docs
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).sorted
    val aBin = files.find(_.endsWith(".bin")).get
    java.nio.file.Files.delete(java.nio.file.Paths.get(aBin))
    intercept[org.apache.spark.SparkException] {
      TokenShards.readTokenShards(spark, out).collect()
    }
    // truncated .bin -> the overrun check fails loudly
    val out2 = tmpDir()
    TokenShards.writeTokenShards(docs, "doc_id", "text", out2, nShards = 1)
    val bin2 = java.nio.file.Files.list(java.nio.file.Paths.get(out2))
      .toArray.map(_.toString).find(_.endsWith(".bin")).get
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(bin2))
    java.nio.file.Files.write(java.nio.file.Paths.get(bin2),
      bytes.take(bytes.length - 4))
    intercept[org.apache.spark.SparkException] {
      TokenShards.readTokenShards(spark, out2).collect()
    }
  }

  test("token shards generation layout: batches union; replay is idempotent") {
    import graft.operators.TokenShards
    val out = tmpDir()
    val gen0 = (1L to 20L).map(i => (i, s"g0 doc $i")).toDF("doc_id", "text")
    val gen1 = (21L to 40L).map(i => (i, s"g1 doc $i")).toDF("doc_id", "text")
    TokenShards.writeTokenShards(gen0, "doc_id", "text", s"$out/batch=0", 4)
    TokenShards.writeTokenShards(gen1, "doc_id", "text", s"$out/batch=1", 4)
    // replay batch 1 (identical rows — the streaming replay contract)
    TokenShards.writeTokenShards(gen1, "doc_id", "text", s"$out/batch=1", 4)
    val back = TokenShards.readTokenShards(spark, out)
      .select($"doc_id", $"ids").as[(Long, Array[Long])].collect()
    assert(back.length === 40, "replayed generation duplicated rows")
    assert(back.forall(_._2.length === 3)) // "gN doc i" = 3 tokens
  }

  test("sample shards: a sample's entries are adjacent and ordered; " +
      "half-samples are dropped whole") {
    val out = tmpDir()
    val docs = Seq(
      (1L, "caption one", Array[Byte](1, 2, 3)),
      (2L, "caption two", Array[Byte](4, 5)),
      (3L, null.asInstanceOf[String], Array[Byte](6)), // half-sample
      (4L, "caption four", null.asInstanceOf[Array[Byte]])) // half-sample
      .toDF("doc_id", "txt", "img")
    Shards.writeTarSampleShards(docs, "doc_id",
      Seq("txt" -> "txt", "png" -> "img"), out, nShards = 1)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).filter(_.endsWith(".tar"))
    assert(files.length === 1)
    val names = Shards.untar(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(files.head))).map(_._1)
    // whole samples only, each sample's modalities adjacent, txt first
    assert(names === Seq("1.txt", "1.png", "2.txt", "2.png"))
    val back = Shards.readTarSampleShards(spark, out)
      .select($"doc_id", $"ext", $"payload")
      .as[(Long, String, Array[Byte])].collect()
    assert(back.map(r => (r._1, r._2)).toSet ===
      Set((1L, "txt"), (1L, "png"), (2L, "txt"), (2L, "png")))
    assert(back.find(r => r._1 == 1L && r._2 == "png").get._3.toSeq ===
      Seq[Byte](1, 2, 3))
    assert(new String(back.find(r => r._1 == 2L && r._2 == "txt").get._3,
      "UTF-8") === "caption two")
  }

  test("export round trip over the corpus: lossless and shard-stable") {
    val out = tmpDir()
    val docs = Tables.load(spark, sfDir, "documents")
    Shards.writeTarShards(docs, "doc_id", "text", out, nShards = 8)
    val back = Shards.readTarShards(spark, out)
    val orig = docs.where($"text".isNotNull)
      .select($"doc_id", md5($"text".cast("binary")).as("m"))
    val joined = back
      .select($"doc_id", $"shard", md5($"payload").as("m2"))
      .join(orig, Seq("doc_id"), "full")
    assert(joined.filter($"m".isNull || $"m2".isNull || $"m" =!= $"m2")
      .count() === 0L)
    // shard assignment matches the multiplicative-hash rule
    assert(back.filter($"shard" =!=
      Shards.shardOf($"doc_id", 8)).count() === 0L)
  }
}
