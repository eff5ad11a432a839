package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenized binary shards — the memmap artifact LLM pretraining
  * actually consumes (the Megatron-LM `.bin`/`.idx` layout, nanoGPT's
  * flat token file): per shard, a `.bin` of concatenated fixed-width
  * token ids in document order plus an `.idx` of fixed-width
  * (doc_id, token_offset, n_tokens) records, so a trainer memory-maps
  * the `.bin` and slices any document without parsing anything.
  *
  * Token ids here are the first 32 bits of MD5(token) — a
  * vocabulary-free id the DuckDB oracle restates exactly
  * (`CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)`, the q219 hex
  * discipline); a production deployment drops a learned BPE/unigram
  * vocab (q194/q205) into the same id slot without touching the
  * container. Tokenization is the repo's single-space split with
  * empties kept (`split(text, ' ', -1)` ≡ DuckDB `string_split`),
  * matching q226's accounting.
  *
  * Scale shape (the `Shards` tar-writer discipline): ONE keyed
  * exchange on the multiplicative-hash shard key, in-partition sort,
  * then a streaming per-partition walk appending to the open shard's
  * two files with O(1) task memory; tmp names carry pid + task attempt
  * id so speculative/retried attempts never interleave; files publish
  * by atomic rename, `.bin` before `.idx`, and the strict reader
  * treats a half-published pair (idx without bin or vice versa) as a
  * loud failure, not missing training data.
  */
object TokenShards {

  /** First 32 bits of MD5(token UTF-8) as an unsigned value in a Long —
    * bit-identical to `'0x' || substr(md5(tok), 1, 8)` in DuckDB and
    * `conv(substring(md5(c), 1, 8), 16, 10)` in Spark SQL.
    */
  private[graft] def tokenId(md: java.security.MessageDigest,
                             tok: String): Long = {
    md.reset()
    val d = md.digest(tok.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def putU32le(out: java.io.OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def putI64le(out: java.io.OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Export `docs` as `nShards` token shards under `outDir`
    * (`shard-NNNNN.bin` + `shard-NNNNN.idx`, docs in ascending id
    * order within a shard). A shard with no rows writes no files.
    */
  def writeTokenShards(docs: DataFrame, idCol: String, textCol: String,
                       outDir: String, nShards: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"),
        Shards.shardOf(col(idCol).cast("long"), nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, String, Long)]
      .foreachPartition { (it: Iterator[(Long, String, Long)]) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(
              0L, Long.MaxValue))
        val pid = ProcessHandle.current().pid()
        var cur = -1L
        var offset = 0L // token offset within the open shard's .bin
        var bin: java.io.OutputStream = null
        var idx: java.io.OutputStream = null
        var binTmp: java.nio.file.Path = null
        var idxTmp: java.nio.file.Path = null
        def close(): Unit = if (bin != null) {
          bin.close(); idx.close()
          // .bin first: a visible .idx implies its .bin is in place
          java.nio.file.Files.move(binTmp,
            binTmp.resolveSibling(f"shard-$cur%05d.bin"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.move(idxTmp,
            idxTmp.resolveSibling(f"shard-$cur%05d.idx"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          bin = null; idx = null
        }
        it.foreach { case (id, text, shard) =>
          if (shard != cur) {
            close()
            cur = shard
            offset = 0L
            binTmp = java.nio.file.Paths.get(outDir,
              f".shard-$cur%05d.bin.tmp-$pid-$attempt")
            idxTmp = java.nio.file.Paths.get(outDir,
              f".shard-$cur%05d.idx.tmp-$pid-$attempt")
            bin = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(binTmp))
            idx = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(idxTmp))
          }
          val toks = text.split(" ", -1)
          putI64le(idx, id); putI64le(idx, offset)
          putI64le(idx, toks.length.toLong)
          var i = 0
          while (i < toks.length) { putU32le(bin, tokenId(md, toks(i))); i += 1 }
          offset += toks.length
        }
        close()
      }
  }

  /** Strict read-back: (shard, doc_id, ids). Each shard's `.idx` and
    * `.bin` pair up by a per-shard join (two binaryFile scans, one
    * tiny shard-keyed exchange); a half-published pair or an index
    * entry that overruns its `.bin` fails loudly.
    */
  def readTokenShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Pairing: the `.idx` is the manifest; each task side-opens its
    // shard's `.bin` through the Hadoop FS (the side-file pattern).
    // The `.bin` BYTES never enter an exchange — at 100 TB they are
    // the whole tokenized corpus, and the naive alternative (binaryFile
    // both extensions, join on stem) shuffles every token through one
    // exchange. What DOES join is metadata: the `.bin` listing projects
    // only its path (binaryFile prunes content for unselected columns),
    // full-joined on the path STEM so BOTH orphan kinds fail loudly —
    // an idx whose bin is missing and a bin whose idx never published.
    // The stem, not the shard number, is the key: generation layouts
    // (batch=<id>/ dirs) repeat shard numbers across generations.
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bconf = spark.sparkContext.broadcast(conf)
    def files(ext: String) = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$ext")
      .option("recursiveFileLookup", "true")
      .load(dir)
    val idx = files("idx")
      .select(regexp_replace(col("path"), "\\.idx$", "").as("stem"),
        col("content").as("idx"))
    val binStems = files("bin")
      .select(regexp_replace(col("path"), "\\.bin$", "").as("stem"),
        lit(true).as("has_bin"))
    idx.join(binStems, Seq("stem"), "full")
      .select(regexp_extract(col("stem"), "shard-(\\d+)$", 1)
        .cast("bigint").as("shard"), col("stem"), col("idx"),
        col("has_bin"))
      .as[(Long, String, Array[Byte], Option[Boolean])]
      .flatMap { case (shard, stem, ix, hasBin) =>
        require(ix != null && hasBin.isDefined,
          s"readTokenShards: half-published shard pair at $stem " +
            s"(idx=${ix != null}, bin=${hasBin.isDefined})")
        require(ix.length % 24 == 0,
          s"readTokenShards: ragged idx for shard $shard (${ix.length} bytes)")
        val p = new org.apache.hadoop.fs.Path(s"$stem.bin")
        val fs = p.getFileSystem(bconf.value.value)
        val binLen = fs.getFileStatus(p).getLen
        val in = fs.open(p)
        val entries =
          try {
            val ib = java.nio.ByteBuffer.wrap(ix)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            (0 until ix.length / 24).map { _ =>
              val id = ib.getLong; val off = ib.getLong; val n = ib.getLong
              // Bounds in UNmultiplied form: 4*(off+n) can wrap Long on a
              // corrupt idx and 4*n wraps Int past ~536M tokens — divide
              // the known-good binLen instead so the failure stays a
              // descriptive require, never a NegativeArraySizeException.
              require(off >= 0 && n >= 0 && n <= Int.MaxValue / 4 &&
                  off <= binLen / 4 && n <= binLen / 4 - off,
                s"readTokenShards: doc $id overruns shard $shard's bin " +
                  s"(off=$off, n=$n, binLen=$binLen)")
              val raw = new Array[Byte](4 * n.toInt)
              in.readFully(4 * off, raw)
              val bb = java.nio.ByteBuffer.wrap(raw)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              (shard, id, Array.fill(n.toInt)(bb.getInt.toLong & 0xffffffffL))
            }
          } finally in.close()
        entries
      }
      .toDF("shard", "doc_id", "ids")
  }
}
