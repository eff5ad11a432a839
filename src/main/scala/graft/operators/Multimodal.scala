package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with feature extraction as a batched `mapPartitions` (the Scala
  * analogue of `mapInPandas` — rows are processed in fixed-size batches
  * so a real decoder could amortize model/library setup per batch).
  *
  * The decode step itself is a DETERMINISTIC STUB (`decodeStub`): real
  * image/audio codecs are not available in this container, so it computes
  * cheap byte-level features (size, sha256, mean byte value standing in
  * for "brightness"). The Spark-side plumbing — schema, encoders, batch
  * shape, partition-parallel execution — is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, sha256_hex: String,
                           brightness: Double)

  /** Wrap a text corpus as binary media rows (payload = UTF-8 bytes). */
  def toMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }

  /** Deterministic fake decoder — stands in for an image/audio codec. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
    val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    MediaFeatures(row.doc_id, bytes.length.toLong, hex,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Frame sampling over an opaque binary payload: chunk the bytes into
    * fixed-size "frames" (stub for video/audio frame boundaries — real
    * codecs are not in this container) and keep every `stride`-th one.
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

  /** Resize stub: deterministic nearest-neighbor byte subsampling by
    * `factor` — stands in for an image resize (no codecs in this
    * container); the Spark-side shape (map-side binary→binary transform,
    * metadata carried alongside) is the real part.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val out = r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }
      r.copy(payload = out.toArray)
    }
  }

  /** Batched partition-parallel feature extraction — the documented
    * boundary for a REAL codec: rows arrive in fixed-size batches so a
    * decoder can amortize library/model setup per batch, exactly like a
    * `mapInPandas` UDF would. This path deserializes rows out of
    * Tungsten, so it is NOT the default — `featureColumns` computes the
    * same stub features as pure codegen'd column expressions and is what
    * the benched q35 runs; MultimodalSpec pins the two paths equal.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would init the codec once per batch here
        batch.map(decodeStub)
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

  /** Column-expression twin of `extractFeatures` for the stub features:
    * every one has a codegen form (`octet_length`, `sha2`, the fused
    * `ByteMean` kernel), so the whole projection stays inside
    * whole-stage codegen with no Tungsten→JVM-object round trip. A real
    * decoder can't be expressed this way — that's what the
    * `mapPartitions` boundary above is for — but stub features shouldn't
    * pay its deserialization tax.
    */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("payload")).cast("bigint").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256_hex"),
      graft.expressions.ArrayOps.byteMean(col("payload")).as("brightness"))
}
