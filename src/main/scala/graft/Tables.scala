package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * At 100 TB these would be partitioned external tables; the parquet
  * scan path (column pruning + predicate pushdown) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Streaming read of table `name`, layout-aware: the driver's testdata
    * stores each table as a SINGLE parquet file (`<sfDir>/<name>.parquet`),
    * but any real lake table — and the GenScale sf1 stress corpus — is a
    * DIRECTORY of part files under that path. The file-stream source
    * needs a directory to list, so: single-file layout → list `sfDir`
    * glob-filtered to the one table file (never sibling tables);
    * directory layout → list the table directory itself (part files;
    * `_SUCCESS`/dot-files are excluded by the source's default filter).
    * Matching on only one layout silently streams 0 rows on the other —
    * and 0 rows is exactly what a drain≡batch gate CANNOT distinguish
    * from "nothing to do" without its non-vacuity pin.
    */
  private[graft] def readTableStream(spark: SparkSession, sfDir: String,
                                     name: String): DataFrame = {
    GraftSession.tune(spark)
    val path = s"$sfDir/$name.parquet"
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
    val df =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
        reader.parquet(path)
      else reader.option("pathGlobFilter", s"$name.parquet").parquet(sfDir)
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Adapt `events.ts` to session-zoned TimestampType (µs) regardless of
    * how the generator encoded it: TIMESTAMP(NANOS) parquet arrives as
    * long nanos (see GraftSession.tune) and converts losslessly with
    * integer `div` (values are µs-aligned; double division would lose
    * precision past 2^53); TIMESTAMP_NTZ relabels to TimestampType — the
    * session is pinned UTC, so the micros value is unchanged and every
    * downstream consumer (watermarks, window(), unix_micros, the DuckDB
    * oracle's naive timestamps) sees one type across generator versions.
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Fingerprint of a source table file (size + mtime) — the staleness
    * token for derived layouts: a cached layout must be rebuilt when the
    * source it was derived from changes, even at the same path.
    */
  def sourceToken(sfDir: String, name: String): String = {
    val p = java.nio.file.Paths.get(sfDir, s"$name.parquet")
    s"${java.nio.file.Files.size(p)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Hive-style date-partitioned copy of `events` (partition column
    * `dt`, read back as DATE by partition-type inference) — the layout a
    * 100 TB event table would actually ship with, and the precondition
    * for dynamic partition pruning (q65): a runtime-only dim filter can
    * then skip whole day directories instead of scanning the full
    * history. Built once per sf dir under the system temp root and
    * reused while the source fingerprint matches (a regenerated
    * events.parquet at the same path forces a rebuild).
    */
  def eventsDayLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, to_date}
    derivedLayout(sfDir, "events", "events_by_day") { out =>
      load(spark, sfDir, "events")
        .withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
    }
  }

  /** Embeddings persisted as an IVF-bucket-partitioned layout — the
    * durable ANN index (see `Similarity.writeIvfLayout`). Built once per
    * sf and reused across JVMs like the other derived layouts.
    */
  def embeddingsIvfLayout(spark: SparkSession, sfDir: String,
                          nlist: Int = 16, nassign: Int = 3): String =
    // v2: the layout carries its centroids file — the name bump rebuilds
    // any cached pre-centroids layout from older builds.
    derivedLayout(sfDir, "embeddings", s"embeddings_ivf2_${nlist}_$nassign") { out =>
      operators.Similarity.writeIvfLayout(load(spark, sfDir, "embeddings"),
        "vec_id", "embedding", out, nlist, nassign)
    }

  /** Incrementally-maintained IVF layout for the q107 append gate: the
    * index is built over the base slice (vec_id % 5 != 4), then the
    * held-out slice is APPENDED with the persisted centroids — no
    * retrain, no rewrite. Built once per sf like the other layouts.
    */
  def embeddingsIvfAppendLayout(spark: SparkSession, sfDir: String,
                                nlist: Int = 16, nassign: Int = 3): String =
    derivedLayout(sfDir, "embeddings",
        s"embeddings_ivf_app_${nlist}_$nassign") { out =>
      import org.apache.spark.sql.functions.col
      val e = load(spark, sfDir, "embeddings")
      operators.Similarity.writeIvfLayout(e.filter(col("vec_id") % 5 =!= 4),
        "vec_id", "embedding", out, nlist, nassign)
      operators.Similarity.appendIvfLayout(out,
        e.filter(col("vec_id") % 5 === 4), "vec_id", "embedding", nassign)
    }

  /** Persisted k-NN-graph layout over the full embeddings table
    * (rounds=0 bucket graph — the deterministic lifecycle base; the
    * NN-descent refinement is gated separately in-flight). Build-once
    * per sf like the other derived layouts.
    */
  def embeddingsKnnLayout(spark: SparkSession, sfDir: String, k: Int = 5,
                          nlist: Int = 16, nassign: Int = 3): String =
    derivedLayout(sfDir, "embeddings",
        s"embeddings_knn_${k}_${nlist}_$nassign") { out =>
      operators.KnnGraph.writeKnnGraphLayout(load(spark, sfDir, "embeddings"),
        "vec_id", "embedding", out, k, nlist, nassign, rounds = 0)
    }

  /** Incrementally-maintained k-NN-graph layout for the q315 append
    * gate: built over the base slice (vec_id % 5 != 4), then the
    * held-out slice is APPENDED — new lists from the frozen-centroid
    * buckets, reverse edges merged into affected old lists, only
    * touched graph partitions rewritten.
    */
  def embeddingsKnnAppendLayout(spark: SparkSession, sfDir: String,
                                k: Int = 5, nlist: Int = 16,
                                nassign: Int = 3): String =
    derivedLayout(sfDir, "embeddings",
        s"embeddings_knn_app_${k}_${nlist}_$nassign") { out =>
      import org.apache.spark.sql.functions.col
      val e = load(spark, sfDir, "embeddings")
      operators.KnnGraph.writeKnnGraphLayout(e.filter(col("vec_id") % 5 =!= 4),
        "vec_id", "embedding", out, k, nlist, nassign, rounds = 0)
      operators.KnnGraph.appendKnnGraphLayout(out,
        e.filter(col("vec_id") % 5 === 4), "vec_id", "embedding")
    }

  /** Z-ordered (Morton-clustered) parquet copy of `orders` on
    * (o_custkey, o_orderdate) — the multi-column range-pruning layout
    * (q121). Build-once like the other derived layouts; at 100 TB this
    * is the compaction job's output.
    */
  def ordersZOrderLayout(spark: SparkSession, sfDir: String,
                         numFiles: Int = 16): String =
    derivedLayout(sfDir, "orders", s"orders_zorder_$numFiles") { out =>
      operators.ZOrder.writeZOrdered(load(spark, sfDir, "orders"), out,
        "o_custkey", "o_orderdate", numFiles)
    }

  /** Day-partitioned events copy with one day BACKFILLED through
    * `ChangeData.overwritePartitions` (partitionOverwriteMode=dynamic):
    * the layout is written once, then 2024-01-05 is rewritten with
    * doubled values — only that partition's files change, which is the
    * whole point of dynamic overwrite on a 100 TB table (a static
    * overwrite deletes the dataset; a full rewrite pays the table for a
    * one-day fix). Built once per sf; q140 hash-gates the resulting
    * content against the arithmetic statement of the backfill.
    */
  def eventsBackfillLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, lit, to_date}
    derivedLayout(sfDir, "events", "events_backfill") { out =>
      val ev = load(spark, sfDir, "events").withColumn("dt", to_date(col("ts")))
      ev.write.mode("overwrite").partitionBy("dt").parquet(out)
      operators.ChangeData.overwritePartitions(
        ev.filter(col("dt") === lit("2024-01-05").cast("date"))
          .withColumn("value", col("value") * 2),
        out, "dt")
    }
  }

  /** Day-partitioned events copy with users 3 and 7 purged via
    * `ChangeData.purgeRows` — only their days' partitions rewritten,
    * the rest byte-identical (ChangeDataSpec pins both). Built once
    * per sf; q177 gates the surviving content.
    */
  def eventsPurgeLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, to_date}
    derivedLayout(sfDir, "events", "events_purged") { out =>
      load(spark, sfDir, "events").withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
      operators.ChangeData.purgeRows(spark, out, "dt",
        col("user_id").isin(3L, 7L))
    }
  }

  /** Two-generation documents layout for the schema-evolution path: the
    * v1 batch lacks the `quality` column the v2 batch adds (a
    * deterministic n_chars-derived score, so the oracle can restate
    * it) — the lakehouse reality that a 100 TB table's early files
    * predate later columns, and readers must widen with NULLs instead
    * of rewriting history. Built once per sf.
    */
  def documentsEvolvedLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, lit}
    derivedLayout(sfDir, "documents", "documents_evolved") { out =>
      val d = load(spark, sfDir, "documents")
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("batch", lit("v1"))
        .write.partitionBy("batch").mode("overwrite").parquet(out)
      d.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") % 7).cast("double").as("quality"))
        .withColumn("batch", lit("v2"))
        .write.partitionBy("batch").mode("append").parquet(out)
    }
  }

  /** Documents shattered into 64 tiny files — the accreted-micro-batch
    * shape the q170 compaction pass exists to repair. Built once per sf.
    */
  def documentsSmallFilesLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "documents", "documents_small_files") { out =>
      load(spark, sfDir, "documents")
        .repartition(64)
        .write.mode("overwrite").parquet(out)
    }

  /** The small-files layout compacted by `operators.Compaction` to a
    * handful of size-targeted files. Built once per sf; q170 gates the
    * content, CompactionSpec the file counts.
    */
  def documentsCompactedLayout(spark: SparkSession, sfDir: String): String = {
    val small = documentsSmallFilesLayout(spark, sfDir)
    derivedLayout(sfDir, "documents", "documents_compacted") { out =>
      operators.Compaction.compact(spark, small, out,
        targetBytes = 512L * 1024)
    }
  }

  /** One raw binary file per document (payload = UTF-8 text bytes,
    * named <doc_id>.bin) — the on-disk shape an image/audio corpus
    * arrives in before any tabular ingestion, feeding the `binaryFile`
    * source (q184). NULL-text docs have no file (nothing to write).
    * The collect is fixture-building over the bounded testdata table,
    * not a query path. Built once per sf.
    */
  def documentsBinFilesLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "documents", "documents_binfiles") { out =>
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.functions.col
      val dir = Paths.get(out)
      Files.createDirectories(dir)
      load(spark, sfDir, "documents").select("doc_id", "text")
        .where(col("text").isNotNull)
        .collect().foreach { r =>
          Files.write(dir.resolve(s"${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
    }

  /** One REAL PNG per document, named <doc_id>.png — the image-corpus
    * on-disk shape feeding the real-decode path (q204). Dimensions and
    * every pixel derive from (doc_id, x, y) by an exact-integer rule:
    *
    *   w = 8 + doc_id % 9,  h = 8 + doc_id % 7
    *   r = (doc_id·31 + x·7  + y·13) % 256
    *   g = (doc_id·17 + x·11 + y·5 ) % 256
    *   b = (doc_id·23 + x·3  + y·19) % 256
    *
    * PNG is lossless, so `ImageIO.read` must reproduce these values
    * bit-exactly — which is what makes a FULL DuckDB gate possible for
    * a codec operator: the oracle restates the rule arithmetically
    * while the engine's numbers come from actually decoding the bytes.
    * The collect is fixture-building over the bounded testdata table,
    * not a query path. Built once per sf.
    */
  def documentsPngFilesLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "documents", "documents_pngfiles") { out =>
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.functions.col
      val dir = Paths.get(out)
      Files.createDirectories(dir)
      load(spark, sfDir, "documents").select("doc_id")
        .where(col("doc_id").isNotNull)
        .collect().foreach { r =>
          val id = r.getLong(0)
          val img = operators.Multimodal.plantedImage(id)
          javax.imageio.ImageIO.write(img, "png",
            dir.resolve(s"$id.png").toFile)
        }
      Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
    }

  /** One REAL WAV per document, named <doc_id>.wav — the audio-corpus
    * on-disk shape feeding the real audio-decode path (q213/q214).
    * Track length and every 16-bit PCM sample derive from (doc_id, t)
    * by the exact-integer rule in `Multimodal.plantedSamples`, with
    * silence planted in whole frames so the trim operator has real
    * work. PCM is lossless, so `javax.sound.sampled` must read the
    * values back bit-exactly — which is what makes a FULL DuckDB gate
    * possible for an audio codec operator (the q204 move, second
    * modality). The collect is fixture-building over the bounded
    * testdata table, not a query path. Built once per sf.
    */
  def documentsWavFilesLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "documents", "documents_wavfiles") { out =>
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.functions.col
      val dir = Paths.get(out)
      Files.createDirectories(dir)
      load(spark, sfDir, "documents").select("doc_id")
        .where(col("doc_id").isNotNull)
        .collect().foreach { r =>
          val id = r.getLong(0)
          Files.write(dir.resolve(s"$id.wav"),
            operators.Multimodal.plantedWavBytes(id))
        }
      Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
    }

  /** The documents corpus exported as WebDataset-style tar shards
    * (`operators.Shards.writeTarShards`) — the interchange layout
    * multimodal training jobs stream. Built once per sf; the q216
    * round-trip gate reads the shards back through the strict ustar
    * parser and hashes every payload against the original table.
    */
  def documentsTarShardsLayout(spark: SparkSession, sfDir: String,
                               nShards: Int = 8): String =
    derivedLayout(sfDir, "documents", s"documents_tarshards_$nShards") { out =>
      operators.Shards.writeTarShards(
        load(spark, sfDir, "documents"), "doc_id", "text", out, nShards)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "_SUCCESS"), Array.empty[Byte])
    }

  /** WebDataset paired-modality shards: each document's text and its
    * planted PNG written as ADJACENT tar entries (`<id>.txt` +
    * `<id>.png`) — built by the cross-modal join of the table with the
    * media directory, which is exactly how a production corpus pairs
    * captions with images before export. Built once per sf.
    */
  def documentsWdsShardsLayout(spark: SparkSession, sfDir: String,
                               nShards: Int = 8): String =
    derivedLayout(sfDir, "documents", s"documents_wdsshards_$nShards") { out =>
      import org.apache.spark.sql.functions.{col, regexp_extract}
      val pngs = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(documentsPngFilesLayout(spark, sfDir))
        .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"), col("content").as("img"))
      val docs = load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("txt"))
      operators.Shards.writeTarSampleShards(
        docs.join(pngs, Seq("doc_id")), "doc_id",
        Seq("txt" -> "txt", "png" -> "img"), out, nShards)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "_SUCCESS"), Array.empty[Byte])
    }

  /** Token-id binary shards of `documents` (`TokenShards` — the
    * memmap `.bin`/`.idx` pretraining artifact). Built once per sf.
    */
  def documentsTokenShardsLayout(spark: SparkSession, sfDir: String,
                                 nShards: Int = 8): String =
    derivedLayout(sfDir, "documents", s"documents_tokenshards_$nShards") { out =>
      operators.TokenShards.writeTokenShards(
        load(spark, sfDir, "documents"), "doc_id", "text", out, nShards)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "_SUCCESS"), Array.empty[Byte])
    }

  /** One planted frame-container "video" per document, named
    * <doc_id>.gftv (`Multimodal.plantedVideoBytes` — length-prefixed
    * REAL PNG frames behind a container index, the structure every real
    * container shares). Feeds the frame-sampling decode path (q222).
    * Built once per sf.
    */
  def documentsVidFilesLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "documents", "documents_vidfiles") { out =>
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.functions.col
      val dir = Paths.get(out)
      Files.createDirectories(dir)
      load(spark, sfDir, "documents").select("doc_id")
        .where(col("doc_id").isNotNull)
        .collect().foreach { r =>
          val id = r.getLong(0)
          Files.write(dir.resolve(s"$id.gftv"),
            operators.Multimodal.plantedVideoBytes(id))
        }
      Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
    }

  /** ORC copy of `orders` — the second columnar source format (same
    * pushdown/pruning path as parquet through the ORC reader).
    */
  def ordersOrcLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "orders", "orders_orc") { out =>
      load(spark, sfDir, "orders").write.mode("overwrite").orc(out)
    }

  /** JSON-lines copy of `events` (timestamps as epoch-µs longs — JSON
    * has no timestamp type; a lossless long beats ISO-string parsing).
    * Readers must supply the schema explicitly: schema inference is a
    * full extra pass over the data, which at 100 TB doubles the scan.
    */
  def eventsJsonLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    derivedLayout(sfDir, "events", "events_json") { out =>
      load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
        .write.mode("overwrite").json(out)
    }
  }

  /** JSON-lines copy of `events` with PLANTED corrupt lines: every
    * event_id % 13 == 0 row becomes the non-JSON line "BAD <id>" — the
    * fixture for PERMISSIVE-mode quarantine (q307). The corruption is
    * CONTENT-derived (the id rule), so the fixture is deterministic
    * under any file/line order the writer produces.
    */
  def eventsDirtyJsonLayout(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    derivedLayout(sfDir, "events", "events_dirty_json") { out =>
      load(spark, sfDir, "events")
        .select(when(col("event_id") % 13 === 0,
            concat(lit("BAD "), col("event_id").cast("string")))
          .otherwise(to_json(struct(col("event_id"), col("user_id"),
            col("event_type"), col("value"),
            unix_micros(col("ts")).as("ts_us")))).as("value"))
        .write.mode("overwrite").text(out)
    }
  }

  /** Spark 4 bundles the Avro source inside spark-sql, but this
    * deployment's unmanaged-jar classpath has no service registration
    * for the "avro" short name (`format("avro")` throws the
    * deploy-the-module error), so readers and writers address the
    * format by class name.
    */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Avro copy of `lineitem` — the row-major format a Kafka-adjacent
    * training-data ingest actually meets. Unlike JSON-lines, Avro files
    * embed their writer schema, so reading needs no inference pass and
    * no explicit schema; logical types carry timestamps losslessly
    * (timestamp-micros, exactly the session's µs precision).
    */
  def lineitemAvroLayout(spark: SparkSession, sfDir: String): String =
    derivedLayout(sfDir, "lineitem", "lineitem_avro") { out =>
      load(spark, sfDir, "lineitem")
        .write.mode("overwrite").format(AvroFormat).save(out)
    }

  /** Build-once derived copy of a source table under the system temp
    * root, keyed by the source fingerprint: a regenerated source at the
    * same path forces a rebuild, an unchanged one is reused as-is.
    *
    * Concurrency-safe across JVMs sharing one java.io.tmpdir (bench and
    * verify can overlap): the check-and-build runs under an exclusive
    * OS file lock, the layout is built into a process-unique staging
    * directory with its token written BEFORE publication, and
    * publication is one directory rename — a reader never observes a
    * half-written layout or a token ahead of its data.
    */
  private def derivedLayout(sfDir: String, source: String,
                            layoutName: String)(build: String => Unit): String =
    synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val sfName = Paths.get(sfDir).getFileName.toString
      val root = Paths.get(sys.props("java.io.tmpdir"), "graft_layout", sfName)
      Files.createDirectories(root)
      val out = root.resolve(layoutName)
      val token = sourceToken(sfDir, source)
      val lockPath = root.resolve(s"$layoutName.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = ch.lock() // blocks until the other JVM's build finishes
      try {
        val tokenFile = out.resolve("_graft_source_token")
        val current =
          if (Files.exists(tokenFile)) Files.readString(tokenFile) else ""
        if (current != token || !Files.exists(out.resolve("_SUCCESS"))) {
          val staging = root.resolve(
            s"$layoutName.stage-${ProcessHandle.current().pid()}")
          pipeline.Ingest.deleteRecursively(staging)
          build(staging.toString)
          Files.writeString(staging.resolve("_graft_source_token"), token)
          pipeline.Ingest.deleteRecursively(out)
          Files.move(staging, out, StandardCopyOption.ATOMIC_MOVE)
        }
      } finally {
        lock.release()
        ch.close()
      }
      out.toString
    }
}
