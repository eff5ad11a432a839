package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with feature extraction as a batched `mapPartitions` (the Scala
  * analogue of `mapInPandas` — rows are processed in fixed-size batches
  * so a decoder can amortize codec/library setup per batch).
  *
  * Two feature families ride this boundary:
  *  - byte-level features (size, sha256, mean byte value) for payloads
  *    treated as opaque blobs — these also have pure codegen column
  *    forms (`featureColumns`), which is what the benched q35 runs;
  *  - REAL image decode (`decodeImageFeatures` / `resizeImage`) via the
  *    JDK's `javax.imageio` PNG codec — width/height/channel sums read
  *    from actually-decoded pixels, and a nearest-neighbor resize that
  *    re-encodes losslessly. q204 gates the decode against a DuckDB
  *    oracle that restates the planted pixel rule arithmetically
  *    (`Tables.documentsPngFilesLayout`), so a decode bug cannot hide.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, sha256_hex: String,
                           brightness: Double)
  case class ImageFeatures(doc_id: Long, width: Long, height: Long,
                           r_sum: Long, g_sum: Long, b_sum: Long,
                           rz_hash: Long)

  /** Wrap a text corpus as binary media rows (payload = UTF-8 bytes). */
  def toMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }

  /** Byte-level features of an opaque payload (no codec needed). */
  def byteFeatures(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
    val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    MediaFeatures(row.doc_id, bytes.length.toLong, hex,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Frame sampling over an opaque binary payload: chunk the bytes into
    * fixed-size "frames" (byte-level proxy for video/audio frame
    * boundaries) and keep every `stride`-th one.
    * Pure column expressions: sequence → transform(substring) → explode,
    * so the UDTF-shaped op stays inside the optimizer and parallelizes
    * per input row. Frame numbering is the position BEFORE striding.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(nFrames, lit(1)) - 1)))
      .filter(col("frame_no") % stride === 0)
      .select(col("doc_id"), col("frame_no").cast("bigint").as("frame_no"),
        col("payload").substr(col("frame_no") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** Deterministic nearest-neighbor byte subsampling by `factor` — the
    * opaque-payload downsampling shape (map-side binary→binary
    * transform, metadata carried alongside). For decoded pixel-space
    * resizing of real images, use `resizeImage`.
    */
  def subsampleBytes(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val out = r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }
      r.copy(payload = out.toArray)
    }
  }

  /** The deterministic planted image for `doc_id` — dimensions and every
    * RGB value are exact-integer functions of (doc_id, x, y), see
    * `Tables.documentsPngFilesLayout`. Shared by the fixture writer, the
    * decode spec, and (arithmetically restated) the q204 oracle.
    */
  def plantedImage(id: Long): java.awt.image.BufferedImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
        val b = ((id * 23 + x * 3 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Strict PNG chunk walk: (type, whole chunk incl length/type/CRC)
    * in file order. Validates the signature, every chunk's CRC32, that
    * IEND terminates the stream, and that nothing trails it — a
    * corrupted image fails loudly here, never propagates half-parsed
    * (the untar contract, applied to the image container).
    */
  private[graft] def pngChunks(id: Long,
                               bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes.length >= 8 &&
      (0 until 8).forall(i => bytes(i) == PngSignature(i)),
      s"pngChunks: bad PNG signature for doc $id")
    def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 8
    var sawEnd = false
    while (!sawEnd) {
      require(off + 12 <= bytes.length,
        s"pngChunks: truncated PNG at offset $off (doc $id)")
      val len = be32(off)
      require(off + 12 + len <= bytes.length,
        s"pngChunks: chunk overruns PNG at offset $off (doc $id)")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len.toInt)
      require(crc.getValue == be32(off + 8 + len.toInt),
        s"pngChunks: CRC mismatch in $typ chunk (doc $id)")
      out += typ -> java.util.Arrays.copyOfRange(bytes, off,
        off + 12 + len.toInt)
      if (typ == "IEND") sawEnd = true
      off += 12 + len.toInt
    }
    require(off == bytes.length,
      s"pngChunks: trailing bytes after IEND (doc $id)")
    out.result()
  }

  /** One serialized PNG chunk (length + type + data + CRC32). */
  private[graft] def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"pngChunk: bad type $typ")
    val bb = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    bb.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** The chunk types `scrubPngMetadata` strips by default: the
    * pure-annotation set (text comments, timestamps, raw EXIF — where
    * camera serials, GPS fixes, and author names live). Deliberately
    * NOT "all ancillary chunks": tRNS/gAMA/etc. change how pixels
    * decode, and the scrub contract is pixel-losslessness.
    */
  val PngMetaChunkTypes: Set[String] = Set("tEXt", "zTXt", "iTXt", "tIME",
    "eXIf")

  /** Metadata scrubbing for PNG payloads — the image-side sibling of
    * the q104 text PII scrub: drop the annotation chunks, keep every
    * other chunk BYTE-IDENTICAL (no re-encode, no pixel risk), re-emit
    * signature + survivors. One map-side pass; payloads never shuffle.
    */
  def scrubPngMetadata(media: Dataset[MediaRow],
                       strip: Set[String] = PngMetaChunkTypes,
                       batchSize: Int = 64): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map(row =>
          row.copy(payload = scrubPngBytes(row.doc_id, row.payload, strip)))
      }
    }
  }

  private def scrubPngBytes(id: Long, bytes: Array[Byte],
                            strip: Set[String]): Array[Byte] = {
    val kept = pngChunks(id, bytes)
      .filterNot { case (typ, _) => strip.contains(typ) }
    val bos = new java.io.ByteArrayOutputStream(bytes.length)
    bos.write(PngSignature, 0, 8)
    kept.foreach { case (_, raw) => bos.write(raw, 0, raw.length) }
    bos.toByteArray
  }

  /** Fixture side of the q228 gate: plant `1 + id % 3` tEXt comment
    * chunks after IHDR (keyword "Comment", 8-digit zero-padded value ⇒
    * exactly 28 bytes per chunk), CRC-correct so both the strict walk
    * and any standard decoder accept them.
    */
  def plantPngText(id: Long, payload: Array[Byte]): Array[Byte] = {
    val injected = (0 until (1 + id % 3).toInt).map { i =>
      val v = f"${(id * 7919 + i) % 100000000}%08d"
      pngChunk("tEXt", ("Comment".getBytes("US-ASCII") :+ 0.toByte) ++
        v.getBytes("US-ASCII"))
    }
    val bos = new java.io.ByteArrayOutputStream(payload.length + 28 * 3)
    bos.write(PngSignature, 0, 8)
    pngChunks(id, payload).foreach { case (typ, raw) =>
      bos.write(raw, 0, raw.length)
      if (typ == "IHDR") injected.foreach(c => bos.write(c, 0, c.length))
    }
    bos.toByteArray
  }

  case class ScrubbedImage(doc_id: Long, width: Long, height: Long,
                           r_sum: Long, g_sum: Long, b_sum: Long,
                           n_meta_before: Long, n_meta_after: Long,
                           bytes_removed: Long)

  /** The q228 gate harness: plant metadata → scrub → re-decode, all in
    * one map-side pass per payload. Emits the decoded pixel sums OF THE
    * SCRUBBED BYTES (pixel-losslessness is the contract — the oracle
    * restates them from the planted rule) plus the metadata accounting
    * (chunks before/after, bytes removed) the oracle restates
    * arithmetically from the deterministic plant.
    */
  def pngScrubGate(media: Dataset[MediaRow],
                   batchSize: Int = 64): Dataset[ScrubbedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val dirty = plantPngText(row.doc_id, row.payload)
          val before = pngChunks(row.doc_id, dirty)
            .count { case (t, _) => PngMetaChunkTypes.contains(t) }
          val clean = scrubPngBytes(row.doc_id, dirty, PngMetaChunkTypes)
          val after = pngChunks(row.doc_id, clean)
            .count { case (t, _) => PngMetaChunkTypes.contains(t) }
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(clean))
          require(img != null,
            s"pngScrubGate: scrubbed payload undecodable for doc ${row.doc_id}")
          val w = img.getWidth; val h = img.getHeight
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              x += 1
            }
            y += 1
          }
          ScrubbedImage(row.doc_id, w.toLong, h.toLong, rs, gs, bs,
            before.toLong, after.toLong, (dirty.length - clean.length).toLong)
        }
      }
    }
  }

  /** REAL image decode + feature extraction through the batched
    * `mapPartitions` codec boundary: `javax.imageio.ImageIO` (in the
    * JDK — no external codec dependency) parses each payload, and the
    * features come from the DECODED pixel grid, not the bytes:
    * width/height, exact per-channel BIGINT sums, and a rolling hash of
    * the nearest-neighbor `rz`×`rz` resize (source pixel for resized
    * (i, j) is (i·w/rz, j·h/rz), integer division — the resize audit
    * without shipping pixels). All outputs are exact integers, so the
    * q204 oracle restates them in SQL from the planted-pixel rule and
    * the gate is a FULL hash gate even though DuckDB cannot decode PNG.
    * Undecodable payloads fail loudly — silently skipping a corrupt
    * image is how a multimodal corpus rots.
    */
  def decodeImageFeatures(media: Dataset[MediaRow], rz: Int = 4,
                          batchSize: Int = 64): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // codec/library setup would amortize here, once per batch
        batch.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null,
            s"decodeImageFeatures: undecodable payload for doc ${row.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              x += 1
            }
            y += 1
          }
          var hsh = 0L
          var j = 0
          while (j < rz) {
            var i = 0
            while (i < rz) {
              val p = img.getRGB(i * w / rz, j * h / rz)
              hsh = (hsh * 1000003L + ((p >> 16) & 0xff)) % 1000000007L
              hsh = (hsh * 1000003L + ((p >> 8) & 0xff)) % 1000000007L
              hsh = (hsh * 1000003L + (p & 0xff)) % 1000000007L
              i += 1
            }
            j += 1
          }
          ImageFeatures(row.doc_id, w.toLong, h.toLong, rs, gs, bs, hsh)
        }
      }
    }
  }

  /** REAL-decode image signature for cross-modal matching: decode →
    * nearest-neighbor `rz`×`rz` sample → the red-channel values as a
    * dense double vector (row-major). The "image encoder" of the
    * cross-modal stack (q208): at 100 TB this slot holds a trained
    * vision encoder behind the same batched boundary — the signature
    * contract (decoded pixels in, fixed-dim vector out, map-side, no
    * shuffle) is what the pairing machinery consumes either way.
    *
    * The vector carries the decoded WIDTH and HEIGHT and a trailing
    * constant BIAS element (255). All three are load-bearing for
    * discrimination: the floor-sampled rz-grid maps adjacent dims to
    * the same pixels (h=8 and h=9 sample identical rows at rz=4), so
    * dimensions must enter the vector explicitly, and cosine is
    * scale-blind — linear pixel patterns from different images can be
    * exact scalings/shifts of each other — so the bias pins the scale.
    * Only the identical image scores 1.0.
    */
  def imageSignature(media: Dataset[MediaRow], rz: Int = 4,
                     batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null,
            s"imageSignature: undecodable payload for doc ${row.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          val sig = new Array[Double](rz * rz + 3)
          var j = 0
          while (j < rz) {
            var i = 0
            while (i < rz) {
              sig(j * rz + i) =
                ((img.getRGB(i * w / rz, j * h / rz) >> 16) & 0xff).toDouble
              i += 1
            }
            j += 1
          }
          sig(rz * rz) = w.toDouble
          sig(rz * rz + 1) = h.toDouble
          sig(rz * rz + 2) = 255.0
          (row.doc_id, sig)
        }
      }
    }.toDF("doc_id", "sig")
  }

  /** Decoded-pixel-space resize: decode → nearest-neighbor sample to
    * `w`×`h` → losslessly re-encode as PNG. Same batched boundary as
    * `decodeImageFeatures`; MultimodalSpec pins the round trip by
    * decoding the output again and checking the pixels against the
    * nearest-neighbor rule.
    */
  def resizeImage(media: Dataset[MediaRow], w: Int, h: Int,
                  batchSize: Int = 64): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null,
            s"resizeImage: undecodable payload for doc ${row.doc_id}")
          val sw = img.getWidth
          val sh = img.getHeight
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              out.setRGB(i, j, img.getRGB(i * sw / w, j * sh / h) & 0xffffff)
              i += 1
            }
            j += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          row.copy(payload = bos.toByteArray, mime = "image/png")
        }
      }
    }
  }

  /** Batched partition-parallel byte-feature extraction — the same
    * codec boundary `decodeImageFeatures` uses, for opaque payloads:
    * rows arrive in fixed-size batches exactly like a `mapInPandas`
    * UDF's. This path deserializes rows out of Tungsten, so it is NOT
    * the default — `featureColumns` computes the same byte features as
    * pure codegen'd column expressions and is what the benched q35
    * runs; MultimodalSpec pins the two paths equal.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map(byteFeatures)
      }
    }
  }

  /** Decode-free near-dup PAIRS at corpus scale: 256-bin byte histograms
    * (the `ByteHistogram` codegen kernel — one map-side pass over the
    * payload, no media codec) treated as dense vectors and fed to the
    * banded RHP-LSH pair machinery (`Similarity.rhpCosinePairs`, hot
    * bands salted, every candidate exact-cosine verified). This is the
    * scale path that q138's fixture-bounded exact cross join stands in
    * for: the histogram pass never shuffles, and pairs come from the
    * band join instead of O(n²). Identical payloads produce identical
    * histograms, which agree on every sign bit and collide in every
    * band — so recall on exact duplicates is 1.0 (the q152 planted
    * gate); near-identical payloads are found with the usual banded
    * probability. Output: (id_a, id_b, sim), sim 6dp-rounded.
    */
  def histogramNearDupPairs(media: DataFrame, threshold: Double,
                            bands: Int = 24, rowsPerBand: Int = 4,
                            seed: Long = 7L): DataFrame = {
    val h = media.select(col("doc_id"),
      transform(graft.expressions.ArrayOps.byteHistogram(col("payload")),
        x => x.cast("double")).as("hv"))
    Similarity.rhpCosinePairs(h, "doc_id", "hv", threshold,
      bands = bands, rowsPerBand = rowsPerBand, seed = seed)
  }

  case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Long,
                           sum_s: Long, energy: Long, zero_x: Long,
                           s_hash: Long)
  case class AudioTrim(doc_id: Long, n_frames: Long, n_silent: Long,
                       lead_trim: Long, tail_trim: Long, n_kept: Long)

  /** The deterministic planted PCM track for `doc_id` — length and every
    * 16-bit sample are exact-integer functions of (doc_id, t), with
    * silence planted in whole frames so the trim operator has real work:
    *
    *   n   = 64 + doc_id % 97
    *   s_t = 0                                     if ⌊t/16⌋ < doc_id % 3
    *                                               or ⌊t/16⌋ % 3 == 2
    *       = ((doc_id·37 + t²·13 + t·29) % 65536) − 32768   otherwise
    *
    * Shared by the fixture writer (`Tables.documentsWavFilesLayout`),
    * the decode spec, and (arithmetically restated) the q213/q214
    * oracles — the audio analogue of `plantedImage`.
    */
  def plantedSamples(id: Long): Array[Int] = {
    val n = (64 + id % 97).toInt
    Array.tabulate(n) { t =>
      val f = t / 16
      if (f < id % 3 || f % 3 == 2) 0
      else (((id * 37 + t.toLong * t * 13 + t * 29L) % 65536L) - 32768L).toInt
    }
  }

  /** The planted track serialized as a REAL RIFF/WAVE file (PCM_SIGNED,
    * 16-bit little-endian, mono, 8 kHz) — what `javax.sound.sampled`
    * must parse back bit-exactly (PCM is lossless).
    */
  def plantedWavBytes(id: Long): Array[Byte] = {
    val samples = plantedSamples(id)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000).putInt(16000) // sample rate, byte rate
      .putShort(2).putShort(16)   // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** ONE-open WAV decode to (sampleRate, samples). Canonical 44-byte
    * RIFF/PCM16-mono-LE headers parse DIRECTLY — `AudioSystem`'s
    * provider lookup synchronizes globally, and the sf1 stress measured
    * it serializing the 32 decode threads (q221 made 4 opens per track
    * and cost 46 s at 50k tracks); the direct path is lock-free and the
    * planted fixture is exactly this shape. Any other WAV layout
    * (extra chunks, multichannel, other encodings) falls back to
    * `javax.sound.sampled` — the general-format codec slot — and still
    * fails loudly on anything but 16-bit little-endian signed PCM.
    * AudioSpec pins the two paths sample-identical.
    */
  private[graft] def decodeWav(docId: Long,
                               payload: Array[Byte]): (Long, Array[Int]) = {
    def ascii(off: Int, s: String): Boolean =
      (0 until s.length).forall(i => payload(off + i) == s.charAt(i).toByte)
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val canonical = payload.length >= 44 &&
      ascii(0, "RIFF") && ascii(8, "WAVE") && ascii(12, "fmt ") &&
      bb.getInt(16) == 16 && bb.getShort(20) == 1 && // PCM
      bb.getShort(22) == 1 && bb.getShort(34) == 16 && // mono, 16-bit
      ascii(36, "data")
    if (canonical) {
      val dataLen = bb.getInt(40)
      require(dataLen >= 0 && 44 + dataLen <= payload.length,
        s"decodeWav: doc $docId data chunk overruns the payload")
      (bb.getInt(24).toLong,
        Array.tabulate(dataLen / 2)(i => bb.getShort(44 + 2 * i).toInt))
    } else {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"decodeWav: doc $docId is not 16-bit LE signed PCM ($fmt)")
      val bytes = in.readAllBytes()
      val n = bytes.length / (2 * fmt.getChannels)
      val db = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // multichannel keeps channel 0 (feature contract: one track/doc)
      val step = fmt.getChannels
      (fmt.getSampleRate.toLong,
        Array.tabulate(n)(i => db.getShort(i * 2 * step).toInt))
    }
  }

  private def decodePcm16(docId: Long, payload: Array[Byte]): Array[Int] =
    decodeWav(docId, payload)._2

  /** REAL audio decode + feature extraction — the audio sibling of
    * `decodeImageFeatures`, same batched `mapPartitions` codec boundary:
    * `javax.sound.sampled` parses each WAV payload and every feature
    * comes from the DECODED samples. All outputs are exact integers
    * (sums, an energy Σs², sign-change counts, a rolling hash of the
    * full track), so the q213 oracle restates the planted-sample rule
    * arithmetically and the gate is a FULL hash gate even though DuckDB
    * cannot decode WAV. Undecodable payloads fail loudly.
    */
  def decodeAudioFeatures(media: Dataset[MediaRow],
                          batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val (rate, s) = decodeWav(row.doc_id, row.payload)
          var sum = 0L; var energy = 0L; var zx = 0L; var h = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sum += v
            energy += v * v
            if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zx += 1
            h = (h * 1000003L + (v + 32768L)) % 1000000007L
            i += 1
          }
          AudioFeatures(row.doc_id, s.length.toLong, rate, sum, energy, zx, h)
        }
      }
    }
  }

  /** Silence trimming — the lead/tail-silence cut an audio training
    * pipeline runs before feature extraction (whole frames of
    * `frameLen` samples; a frame is silent iff its energy is exactly 0,
    * the only silence definition that is codec-exact and therefore
    * refereeable). Emits the per-doc trim profile: frame counts, lead
    * and tail trims, and the surviving sample count. Decode + trim are
    * one map-side pass over the payloads — no shuffle anywhere.
    */
  def trimSilence(media: Dataset[MediaRow], frameLen: Int = 16,
                  batchSize: Int = 64): Dataset[AudioTrim] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val s = decodePcm16(row.doc_id, row.payload)
          val nf = (s.length + frameLen - 1) / frameLen
          val silent = Array.tabulate(nf) { f =>
            var e = 0L
            var t = f * frameLen
            val end = math.min((f + 1) * frameLen, s.length)
            while (t < end) { e += s(t).toLong * s(t); t += 1 }
            e == 0L
          }
          val firstLoud = silent.indexWhere(!_)
          val lastLoud = silent.lastIndexWhere(!_)
          val lead = if (firstLoud < 0) nf.toLong else firstLoud.toLong
          val tail = if (lastLoud < 0) 0L else (nf - 1 - lastLoud).toLong
          val kept =
            if (firstLoud < 0) 0L
            else (math.min((lastLoud + 1) * frameLen, s.length) -
              firstLoud * frameLen).toLong
          AudioTrim(row.doc_id, nf.toLong, silent.count(identity).toLong,
            lead, tail, kept)
        }
      }
    }
  }

  case class ImageDHash(doc_id: Long, dhash_hi: Long, dhash_lo: Long,
                        n_bits_set: Long)

  /** Perceptual difference hash (dHash) from REAL decodes — the
    * image-dedup primitive production crawls actually use (LAION-class
    * pipelines bucket on perceptual hashes, not byte hashes, because
    * re-encodes and resizes change bytes but not gradients): sample a
    * 9×8 luma grid by nearest neighbor (source point (i·w/9, j·h/8),
    * integer division — the `resizeImage` convention), and bit
    * k = j·8+i is set iff luma(i+1, j) > luma(i, j). Luma is the raw
    * channel SUM (monotone-equivalent to the mean for comparisons —
    * no division, no rounding ambiguity), so every bit is an
    * exact-integer decision the q233 oracle restates in SQL. The
    * 64-bit hash ships as two 32-bit halves (`dhash_hi`/`dhash_lo`) so
    * neither side ever touches the sign bit; `n_bits_set` is the
    * popcount. One map-side pass; pixels never shuffle.
    */
  def imageDHash(media: Dataset[MediaRow],
                 batchSize: Int = 64): Dataset[ImageDHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null,
            s"imageDHash: undecodable payload for doc ${row.doc_id}")
          val (hi, lo, set) = dhashOf(img)
          ImageDHash(row.doc_id, hi, lo, set)
        }
      }
    }
  }

  private def dhashOf(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    def luma(i: Int, j: Int): Long = {
      val p = img.getRGB(i * w / 9, j * h / 8)
      ((p >> 16) & 0xff).toLong + ((p >> 8) & 0xff) + (p & 0xff)
    }
    var hi = 0L; var lo = 0L; var set = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (luma(i + 1, j) > luma(i, j)) {
          val k = j * 8 + i
          if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
          set += 1
        }
        i += 1
      }
      j += 1
    }
    (hi, lo, set)
  }

  case class ImageProfile(doc_id: Long, width: Long, height: Long,
                          dhash_hi: Long, dhash_lo: Long)

  /** Dims + perceptual hash in ONE decode per payload — the admission
    * profile an image-curation pass needs (size/aspect filters key on
    * dims, dedup keys on the dHash; paying two decodes for them would
    * double the dominant cost of the scan). Same dHash definition as
    * [[imageDHash]].
    */
  def imageProfile(media: Dataset[MediaRow],
                   batchSize: Int = 64): Dataset[ImageProfile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null,
            s"imageProfile: undecodable payload for doc ${row.doc_id}")
          val (hi, lo, _) = dhashOf(img)
          ImageProfile(row.doc_id, img.getWidth.toLong, img.getHeight.toLong,
            hi, lo)
        }
      }
    }
  }

  case class VideoFrame(doc_id: Long, frame_no: Long, width: Long,
                        height: Long, r_sum: Long, g_sum: Long, b_sum: Long)

  /** The deterministic planted "video" for `doc_id`: a length-prefixed
    * frame container (magic `GFTV`, LE int32 frame count, then per
    * frame LE int32 byte length + a REAL PNG) — the structure every
    * real container format shares (an index plus per-frame codec
    * payloads), with the JDK's PNG codec standing in the per-frame
    * codec slot. Frame k's image is `plantedImage(doc_id·131 + k·17)`
    * and the frame count is 2 + doc_id % 4, so the q222 oracle can
    * restate every sampled frame's pixel sums arithmetically.
    */
  def plantedVideoBytes(id: Long): Array[Byte] = {
    val nF = (2 + id % 4).toInt
    val frames = (0 until nF).map { k =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(plantedImage(id * 131 + k * 17), "png", bos)
      bos.toByteArray
    }
    val bb = java.nio.ByteBuffer
      .allocate(8 + frames.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GFTV".getBytes("US-ASCII")).putInt(nF)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Frame sampling with REAL per-frame decode — the video leg of the
    * modality stack: parse the container index, decode every
    * `stride`-th frame with the PNG codec, and emit per-frame features
    * from the DECODED pixels (the byte-level `sampleFrames` is the
    * decode-free sibling). Strict parse — a bad magic or a frame
    * overrunning the payload fails loudly, never yields partial
    * frames. One map-side pass; frames of one video never shuffle.
    * Frame numbering is the position BEFORE striding (the
    * `sampleFrames` contract).
    */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int,
                        batchSize: Int = 64): Dataset[VideoFrame] = {
    require(stride >= 1, s"sampleVideoFrames: stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val bb = java.nio.ByteBuffer.wrap(row.payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4)
          bb.get(magic)
          require(new String(magic, "US-ASCII") == "GFTV",
            s"sampleVideoFrames: bad container magic for doc ${row.doc_id}")
          val nF = bb.getInt
          (0 until nF).flatMap { k =>
            val len = bb.getInt
            require(len >= 0 && len <= bb.remaining(),
              s"sampleVideoFrames: frame $k overruns doc ${row.doc_id}")
            val frame = new Array[Byte](len)
            bb.get(frame)
            if (k % stride != 0) None
            else {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frame))
              require(img != null,
                s"sampleVideoFrames: undecodable frame $k of doc ${row.doc_id}")
              val w = img.getWidth; val h = img.getHeight
              var rs = 0L; var gs = 0L; var bs = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                  x += 1
                }
                y += 1
              }
              Some(VideoFrame(row.doc_id, k.toLong, w.toLong, h.toLong,
                rs, gs, bs))
            }
          }
        }
      }
    }
  }

  case class ShotSegment(doc_id: Long, shot_no: Long, start_frame: Long,
                         n_frames: Long, cut_score_ppm: Long)

  /** Shot-boundary detection — the classic mean-color-difference cut
    * detector (Zhang/Kankanhalli/Smoliar's histogram-difference family)
    * over REALLY decoded frames: a cut opens a new shot between frames
    * k-1 and k when the summed per-channel mean difference exceeds
    * `thrPermille`/1000 of the 3·255 maximum. All arithmetic is
    * exact-integer via cross-multiplication (means never materialize
    * as doubles): with A_k = w_k·h_k and per-channel sums c_k,
    *   dist_num(k) = Σ_c |c_k·A_{k-1} − c_{k-1}·A_k|
    *   cut  ⇔  1000·dist_num(k) > thrPermille·765·A_k·A_{k-1}
    * so the q227 oracle restates the decision bit-for-bit from the
    * planted pixel rule. `cut_score_ppm` = ⌊10⁶·dist/765⌋ for the
    * shot's OPENING cut (0 for shot 1) gives the gate teeth beyond the
    * boolean. One map-side pass per video (container walk + per-frame
    * PNG decode + the islands fold) — a video's frames already live
    * together in its payload, so like `segmentBySilence` this needs NO
    * shuffle at all; at 100 TB the only exchange is whatever
    * presentation ordering the caller asks for.
    */
  def detectShots(media: Dataset[MediaRow], thrPermille: Int,
                  batchSize: Int = 64): Dataset[ShotSegment] = {
    require(thrPermille >= 0 && thrPermille <= 1000,
      s"detectShots: thrPermille must be in [0, 1000], got $thrPermille")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val bb = java.nio.ByteBuffer.wrap(row.payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4)
          bb.get(magic)
          require(new String(magic, "US-ASCII") == "GFTV",
            s"detectShots: bad container magic for doc ${row.doc_id}")
          val nF = bb.getInt
          // (area, r, g, b) per frame from the real PNG decode
          val feats = (0 until nF).map { k =>
            val len = bb.getInt
            require(len >= 0 && len <= bb.remaining(),
              s"detectShots: frame $k overruns doc ${row.doc_id}")
            val frame = new Array[Byte](len)
            bb.get(frame)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frame))
            require(img != null,
              s"detectShots: undecodable frame $k of doc ${row.doc_id}")
            val w = img.getWidth; val h = img.getHeight
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                x += 1
              }
              y += 1
            }
            (w.toLong * h, rs, gs, bs)
          }
          // islands fold: a cut between k-1 and k closes the open shot
          val shots = Seq.newBuilder[ShotSegment]
          var shotNo = 0L
          var start = 0
          var score = 0L // opening-cut score of the currently open shot
          (1 until nF).foreach { k =>
            val (a1, r1, g1, b1) = feats(k - 1)
            val (a2, r2, g2, b2) = feats(k)
            val num = math.abs(r2 * a1 - r1 * a2) +
              math.abs(g2 * a1 - g1 * a2) + math.abs(b2 * a1 - b1 * a2)
            if (1000L * num > thrPermille.toLong * 765L * a1 * a2) {
              shotNo += 1
              shots += ShotSegment(row.doc_id, shotNo, start.toLong,
                (k - start).toLong, score)
              start = k
              score = 1000000L * num / (765L * a1 * a2)
            }
          }
          if (nF > 0) {
            shotNo += 1
            shots += ShotSegment(row.doc_id, shotNo, start.toLong,
              (nF - start).toLong, score)
          }
          shots.result()
        }
      }
    }
  }

  case class AudioSegment(doc_id: Long, seg_no: Long, start_frame: Long,
                          n_frames: Long, n_samples: Long, energy: Long)

  /** Silence-delimited segmentation — the audio analogue of
    * sessionization: maximal runs of non-silent frames become numbered
    * segments (what a speech pipeline feeds to per-utterance
    * transcription/embedding). Decode + the gaps-and-islands walk run
    * in ONE map-side pass per track — unlike event sessionization no
    * shuffle is needed, because a track's frames already live together
    * in its payload. Exact-integer outputs (frame spans, sample
    * counts, Σs² energies) so the q220 oracle restates the walk over
    * the planted rule with SQL window islands.
    */
  def segmentBySilence(media: Dataset[MediaRow], frameLen: Int = 16,
                       batchSize: Int = 64): Dataset[AudioSegment] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val s = decodePcm16(row.doc_id, row.payload)
          val nf = (s.length + frameLen - 1) / frameLen
          val segs = Seq.newBuilder[AudioSegment]
          var f = 0
          var segNo = 0L
          while (f < nf) {
            var e = 0L
            var t = f * frameLen
            val end = math.min((f + 1) * frameLen, s.length)
            while (t < end) { e += s(t).toLong * s(t); t += 1 }
            if (e == 0L) f += 1
            else {
              // extend the non-silent run
              val start = f
              var energy = 0L
              var samples = 0L
              var loud = true
              while (f < nf && loud) {
                var fe = 0L
                var u = f * frameLen
                val fEnd = math.min((f + 1) * frameLen, s.length)
                while (u < fEnd) { fe += s(u).toLong * s(u); u += 1 }
                if (fe == 0L) loud = false
                else {
                  energy += fe; samples += fEnd - f * frameLen; f += 1
                }
              }
              segNo += 1
              segs += AudioSegment(row.doc_id, segNo, start.toLong,
                (f - start).toLong, samples, energy)
            }
          }
          segs.result()
        }
      }
    }
  }

  /** Sample-rate downconversion by an integer `factor` (keep every
    * factor-th sample, rate divides) with lossless re-encode — the
    * audio sibling of `resizeImage`, same decode → transform → encode
    * chain through the batched boundary. The q221 gate decodes the
    * OUTPUT again and must reproduce the planted rule at stride
    * `factor` — any bug in decode, stride arithmetic, or the re-encoded
    * RIFF header breaks the downstream feature hash.
    */
  def resampleAudio(media: Dataset[MediaRow], factor: Int,
                    batchSize: Int = 64): Dataset[MediaRow] = {
    require(factor >= 1, s"resampleAudio: factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val (srcRate, s) = decodeWav(row.doc_id, row.payload)
          val rate = srcRate.toInt
          // "rate divides" is a CONTRACT, not a hint: truncating
          // rate/factor would re-encode with a wrong sample-rate header
          // (8 kHz at factor 3 → 2666 Hz) instead of failing loudly
          // like the rest of the codec boundary.
          require(rate % factor == 0,
            s"resampleAudio: factor $factor does not divide sample rate " +
              s"$rate (doc ${row.doc_id})")
          val out = Array.tabulate((s.length + factor - 1) / factor)(
            t => s(t * factor))
          val dataLen = out.length * 2
          val newRate = rate / factor
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)
            .putInt(newRate).putInt(newRate * 2)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          out.foreach(v => bb.putShort(v.toShort))
          row.copy(payload = bb.array())
        }
      }
    }
  }

  /** Decoded ENERGY ENVELOPE as a fixed-dim vector — the audio
    * signature for near-dup mining (the envelope is what survives
    * re-encoding and small edits; raw bytes do not): sample t's s²
    * accumulates into bin ⌊t·bins/n⌋, so tracks of any length map to
    * the same `bins`-dim space. Exact integer sums cast to double;
    * identical tracks produce identical envelopes, which agree on
    * every RHP sign bit — banded recall on exact duplicates is 1.0
    * (the q152 law, third modality). One map-side pass, no shuffle.
    */
  def audioEnvelope(media: Dataset[MediaRow], bins: Int = 16,
                    batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val s = decodePcm16(row.doc_id, row.payload)
          val env = new Array[Double](bins)
          var t = 0
          while (t < s.length) {
            env((t.toLong * bins / s.length).toInt) += s(t).toDouble * s(t)
            t += 1
          }
          (row.doc_id, env)
        }
      }
    }.toDF("doc_id", "env")
  }

  /** Column-expression twin of `extractFeatures` for the byte features:
    * every one has a codegen form (`octet_length`, `sha2`, the fused
    * `ByteMean` kernel), so the whole projection stays inside
    * whole-stage codegen with no Tungsten→JVM-object round trip. A real
    * decoder can't be expressed this way — that's what the
    * `mapPartitions` boundary above is for — but byte features shouldn't
    * pay its deserialization tax.
    */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("payload")).cast("bigint").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256_hex"),
      graft.expressions.ArrayOps.byteMean(col("payload")).as("brightness"))
}
