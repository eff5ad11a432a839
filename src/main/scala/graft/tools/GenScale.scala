package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from an existing testdata
  * dir by deterministic replication — the fixture for the sf1 guard
  * stress (PLANS "sf1 stress" section). NOT a gate input: the driver's
  * oracle battery stays on the generated sf dirs; this exists to
  * exercise the salted/banded/census guards at ~10× document volume and
  * record timings.
  *
  * Scaling rules (replica r of `factor`, id stride = max_id + 1):
  *  - documents: odd replicas keep the text VERBATIM (planting real
  *    exact/near duplicates at scale — the dedup family's stress);
  *    even replicas append a replica marker (distinct text, same
  *    vocabulary mass). n_chars recomputed.
  *  - embeddings: replica r rotates the vector left by r positions —
  *    norm-preserving decorrelation so pair spaces grow ~linearly, with
  *    replica 1 kept VERBATIM (10% exact clones for the planted-pair
  *    machinery and the per-cluster skew guards).
  *  - events: pure id-shifted replicas — every user key carries
  *    factor× rows (the skew/salting stress).
  *  - TPC-H dims/facts copy through unchanged.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get("graft-genscale")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }

    val docs = Tables.load(spark, src, "documents")
    val docStride = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val docsScaled = docs
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1L))))
      .withColumn("doc_id", col("doc_id") + col("r") * docStride)
      .withColumn("text",
        when(col("r") === 0 || col("r") % 2 === 1, col("text"))
          .otherwise(concat(col("text"), lit(" replica"),
            col("r").cast("string"))))
      .withColumn("n_chars", length(col("text")))
      .drop("r")
    write(docsScaled, "documents")

    val emb = Tables.load(spark, src, "embeddings")
    val vecStride = emb.agg(max("vec_id")).head.getLong(0) + 1L
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val embScaled = emb
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1L))))
      .withColumn("vec_id", col("vec_id") + col("r") * vecStride)
      .withColumn("embedding",
        when(col("r") <= 1, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("r").cast("int") + 1,
              lit(dim) - col("r").cast("int")),
            slice(col("embedding"), lit(1), col("r").cast("int")))))
      .drop("r")
    write(embScaled, "embeddings")

    val ev = Tables.load(spark, src, "events")
    val evStride = ev.agg(max("event_id")).head.getLong(0) + 1L
    val evScaled = ev
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1L))))
      .withColumn("event_id", col("event_id") + col("r") * evStride)
      .drop("r")
    write(evScaled, "events")

    println(s"[genscale] wrote $out at ${factor}x from $src: " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"emb=${spark.read.parquet(s"$out/embeddings.parquet").count()} " +
      s"events=${spark.read.parquet(s"$out/events.parquet").count()}")
    spark.stop()
  }
}
