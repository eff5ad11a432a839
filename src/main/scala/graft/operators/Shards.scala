package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar sharding — the interchange format large-scale
  * multimodal training actually reads (one tar per shard, samples as
  * named entries, sequential I/O). The engine both WRITES shards from a
  * corpus and READS them back through the `binaryFile` source, and the
  * q216 round-trip gate proves byte-lossless export: every document's
  * payload and its deterministic shard assignment restated by the
  * oracle from the original table.
  *
  * Scale shape: shard assignment is the repo's multiplicative hash
  * (stable under appends, join-consistent with q106/q196/q201), the
  * write is ONE keyed exchange + in-partition sort + a streaming
  * per-partition walk that appends entries to the open shard file with
  * O(1) task memory (never materializing a whole tar in RAM), and each
  * shard file publishes by atomic temp→rename — a crashed task leaves
  * no half-shard visible. Reads parallelize per shard file and the
  * strict ustar parser validates every header checksum — a silently
  * truncated shard fails loudly, not as missing training data.
  *
  * The tar writer emits plain POSIX ustar (mode 0644, uid/gid 0,
  * mtime 0 — deterministic bytes for a given entry sequence), readable
  * by any tar implementation.
  */
object Shards {

  private val BlockSize = 512

  /** One ustar header block for a regular file entry. */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name too long: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000")            // mode
    put(108, "0000000\u0000")            // uid
    put(116, "0000000\u0000")            // gid
    put(124, f"$size%011o" + "\u0000") // size, octal
    put(136, "00000000000\u0000")        // mtime 0: deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = '0'                         // typeflag: regular file
    put(257, "ustar\u0000" + "00")       // magic + version
    put(329, "0000000\u0000")            // devmajor
    put(337, "0000000\u0000")            // devminor
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o" + "\u0000 ")
    h
  }

  private def padTo(n: Long): Int =
    ((BlockSize - n % BlockSize) % BlockSize).toInt

  /** Append one entry to an open tar stream. */
  private[graft] def writeEntry(out: java.io.OutputStream, name: String,
                         payload: Array[Byte]): Unit = {
    out.write(tarHeader(name, payload.length.toLong))
    out.write(payload)
    out.write(new Array[Byte](padTo(payload.length.toLong)))
  }

  /** Strict ustar parse: (name, payload) entries. Validates magic and
    * the header checksum of every entry and requires the terminating
    * zero blocks to be reachable — truncation and corruption fail
    * loudly instead of dropping samples.
    */
  def untar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done) {
      require(off + BlockSize <= bytes.length,
        s"untar: truncated archive at offset $off")
      if (bytes.slice(off, off + BlockSize).forall(_ == 0)) done = true
      else {
        val h = bytes.slice(off, off + BlockSize)
        require(new String(h, 257, 5, "US-ASCII") == "ustar",
          s"untar: bad magic at offset $off")
        val stored = java.lang.Long.parseLong(
          new String(h, 148, 6, "US-ASCII").trim, 8)
        val sum = h.zipWithIndex.foldLeft(0L) { case (a, (b, i)) =>
          a + (if (i >= 148 && i < 156) ' '.toInt else b & 0xff)
        }
        require(sum == stored,
          s"untar: checksum mismatch at offset $off ($sum != $stored)")
        // NUL search bounded to the 100-byte name field: a full-length
        // name has no terminator, and scanning the whole header would
        // silently absorb the mode field into the entry name.
        var nameEnd = 0
        while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
        val name = new String(h, 0, nameEnd, "UTF-8")
        val size = java.lang.Long.parseLong(
          new String(h, 124, 11, "US-ASCII").trim, 8)
        require(off + BlockSize + size <= bytes.length,
          s"untar: entry $name overruns the archive")
        out += name -> bytes.slice(off + BlockSize,
          (off + BlockSize + size).toInt)
        off += BlockSize + size.toInt + padTo(size)
      }
    }
    out.result()
  }

  /** The deterministic shard of `id` — the q106/q196/q201 multiplicative
    * hash, so shard membership is stable under appends and restatable
    * in SQL: (id · 2654435761) mod 2³² mod nShards.
    */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int) =
    pmod(id * lit(2654435761L), lit(4294967296L)) % nShards

  /** Tmp path for one in-flight shard file. Carries pid AND a
    * per-attempt token so two attempts of the same partition in one
    * executor JVM (speculative execution, a zombie attempt racing its
    * retry) never share a tmp file — interleaved writes would publish
    * corrupt bytes under a valid shard name. Exposed for ShardsSpec.
    */
  private[graft] def tmpShardPath(outDir: String, shard: Long,
                                      attempt: Long): java.nio.file.Path =
    java.nio.file.Paths.get(outDir,
      f".shard-$shard%05d.tar.tmp-${ProcessHandle.current().pid()}-$attempt")

  /** Export (id, payload) rows as `nShards` tar shards under `outDir`
    * (`shard-NNNNN.tar`, entries `<id>.txt` in ascending id order).
    * One exchange on the shard key; rows stream through each task into
    * the open shard file (O(1) memory); files publish by atomic rename.
    * A shard with no rows writes no file — readers glob what exists.
    */
  def writeTarShards(docs: DataFrame, idCol: String, textCol: String,
                     outDir: String, nShards: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(textCol).cast("binary").as("payload"),
        shardOf(col(idCol).cast("long"), nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Array[Byte], Long)]
      .foreachPartition { (it: Iterator[(Long, Array[Byte], Long)]) =>
        var cur = -1L
        var out: java.io.OutputStream = null
        var tmp: java.nio.file.Path = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // tar terminator
          out.close()
          java.nio.file.Files.move(tmp,
            tmp.resolveSibling(f"shard-$cur%05d.tar"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          out = null
        }
        // See tmpShardPath: attempt-unique tmp names keep speculative /
        // retried attempts from interleaving writes in one file. The
        // rename itself stays last-writer-wins atomic.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(
              0L, Long.MaxValue))
        it.foreach { case (id, payload, shard) =>
          if (shard != cur) {
            close()
            cur = shard
            tmp = tmpShardPath(outDir, cur, attempt)
            out = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(tmp))
          }
          writeEntry(out, s"$id.txt", payload)
        }
        close()
      }
  }

  /** Multi-entry WebDataset samples: ALL of a sample's modalities
    * written ADJACENT in the same shard tar — `<id>.<suffix>` per
    * payload column, in the given order — which is the actual
    * WebDataset contract: a trainer streams a sample's text and image
    * together with sequential I/O, no seeks, no cross-file join at
    * read time. `entries` maps entry-name suffix → payload column
    * (binary). Rows with any NULL payload are dropped (a sample is
    * whole or absent — half-samples are how multimodal corpora rot).
    * Same scale shape and attempt-safe publish as `writeTarShards`.
    */
  def writeTarSampleShards(docs: DataFrame, idCol: String,
                           entries: Seq[(String, String)],
                           outDir: String, nShards: Int): Unit = {
    require(entries.nonEmpty, "writeTarSampleShards: no entries")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = docs.sparkSession
    import spark.implicits._
    val payloadCols = entries.map { case (_, c) => col(c).cast("binary") }
    docs.filter(payloadCols.map(_.isNotNull).reduce(_ && _))
      .select(col(idCol).cast("long").as("id"),
        array(payloadCols: _*).as("payloads"),
        shardOf(col(idCol).cast("long"), nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Seq[Array[Byte]], Long)]
      .foreachPartition { (it: Iterator[(Long, Seq[Array[Byte]], Long)]) =>
        val suffixes = entries.map(_._1)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(
              0L, Long.MaxValue))
        var cur = -1L
        var out: java.io.OutputStream = null
        var tmp: java.nio.file.Path = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize))
          out.close()
          java.nio.file.Files.move(tmp,
            tmp.resolveSibling(f"shard-$cur%05d.tar"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          out = null
        }
        it.foreach { case (id, payloads, shard) =>
          if (shard != cur) {
            close()
            cur = shard
            tmp = tmpShardPath(outDir, cur, attempt)
            out = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(tmp))
          }
          suffixes.zip(payloads).foreach { case (sfx, payload) =>
            writeEntry(out, s"$id.$sfx", payload)
          }
        }
        close()
      }
  }

  /** Read multi-entry sample shards back as (shard, doc_id, ext,
    * payload) — entry names parse as `<id>.<ext>`; adjacency inside
    * the tar is the writer's contract, the relational surface exposes
    * one row per modality.
    */
  def readTarSampleShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar$", 1)
        .cast("bigint").as("shard"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        untar(bytes).map { case (name, payload) =>
          val dot = name.lastIndexOf('.')
          require(dot > 0, s"readTarSampleShards: unparseable entry $name")
          (shard, name.take(dot).toLong, name.drop(dot + 1), payload)
        }
      }
      .toDF("shard", "doc_id", "ext", "payload")
  }

  /** Read tar shards back as (shard, doc_id, payload) — `binaryFile`
    * parallelizes per shard file; the strict parser runs in the same
    * batched boundary style as the media decoders.
    */
  def readTarShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      // generation layouts (streaming export writes batch=<id>/ dirs)
      // read as one corpus
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar$", 1)
        .cast("bigint").as("shard"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        untar(bytes).map { case (name, payload) =>
          (shard, name.stripSuffix(".txt").toLong, payload)
        }
      }
      .toDF("shard", "doc_id", "payload")
  }
}
