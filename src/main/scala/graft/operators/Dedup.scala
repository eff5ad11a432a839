package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale design (100 TB): every variant is shuffle-bounded —
  *  - exact dedup: one hash shuffle on the dedup key;
  *  - MinHash-LSH: signatures are computed map-side in one pass; the only
  *    wide stages are the band-bucket self-join (keys are 64-bit hashes,
  *    heavily partitionable) and the candidate verification join. Bucket
  *    explosion from degenerate shingles is bounded because candidate
  *    pairs are verified with exact Jaccard before being emitted;
  *  - SimHash: one explode+agg to build 64-bit fingerprints, then a
  *    4-chunk pigeonhole join (guarantees recall for hamming ≤ 3).
  */
object Dedup {

  /** Exact dedup: representative (min id) + multiplicity per key. */
  def exactDuplicates(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deterministic dropDuplicates: keep the first row per key under an
    * explicit ordering (the reference's dropDuplicates keeps an arbitrary
    * row — at scale "arbitrary" is non-reproducible, so we pin it).
    */
  def dropDuplicatesOrdered(df: DataFrame, keyCols: Seq[String], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Shingle + minhash + band columns for a document frame. */
  def minhashed(docs: DataFrame, idCol: String, textCol: String,
                n: Int, numPerm: Int, bands: Int): DataFrame = {
    val rows = numPerm / bands
    docs
      .select(col(idCol), shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(shingleHashes(col("sh")), numPerm))
      .withColumn("bands", bandKeys(col("sig"), bands, rows))
  }

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def lshNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3,
                      numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val mh = minhashed(docs, idCol, textCol, n, numPerm, bands)
      .select(col(idCol).as("id"), col("sh"), posexplode(col("bands")).as(Seq("band", "key")))
    val a = mh.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = mh.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact blocked n-gram Jaccard: all pairs within the same blocking
    * key (e.g. language) — the exact-answer counterpart to LSH.
    */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], threshold: Double,
                          n: Int = 3): DataFrame = {
    val t = docs.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ shingles(col(textCol), n).as("sh"): _*)
    val a = t.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("sh").as("sh_a"): _*)
    val b = t.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("sh").as("sh_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash fingerprints: explode shingle hashes once, aggregate
    * 64 signed bit-sums per doc (one shuffle), fold into a long.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(shingleHashes(shingles(col(textCol), n))).as("h"))
    val bitSums = (0 until 64).map(k =>
      sum(shiftright(col("h"), k).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$k"))
    val agged = exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(k =>
      shiftleft(when(col(s"b$k") > 0, lit(1L)).otherwise(lit(0L)), k))
      .reduce((x, y) => x.bitwiseOR(y))
    agged.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found via
    * 16-bit chunk pigeonhole (4 chunks ⇒ guaranteed recall for ≤ 3).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, n: Int = 3): DataFrame = {
    val fp = simhash(docs, idCol, textCol, n)
    val chunked = fp.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), 16 * i).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("bigint").as("hamming"))
  }
}
