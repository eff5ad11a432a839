package graft.pipeline

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end retail pipeline orchestrator (reference lifecycle §3:
  * acquire → scan → quality gate → transform → sink; reference
  * src/pipeline_orchestrator.py:106-171, minus the Py4J / Kaggle /
  * SQLite process boundaries — one JVM, local acquisition, pluggable
  * sink).
  *
  * Run: sbt "runMain graft.pipeline.RetailPipeline [configPath]"
  */
object RetailPipeline {

  final case class Result(
      reports: Seq[QualityReport],
      curated: Map[String, DataFrame],
      writtenRows: Seq[(String, Long)])

  def run(spark: SparkSession, cfg: PipelineConfig): Result = {
    GraftSession.tune(spark)
    val files = Ingest.acquire(cfg.ingest)
    def fileFor(key: String): Option[String] =
      files.find(_.getFileName.toString == s"$key.csv").map(_.toString)

    // Scan + quality-gate each configured dataset (typed views registered
    // as typed_<key> for downstream consumers, mirroring the reference's
    // session-catalog handoff).
    val gated: Seq[(String, DataFrame, QualityReport)] = cfg.datasets.flatMap {
      case (key, spec) =>
        fileFor(key).map { path =>
          val raw = Ingest.readCsv(spark, Seq(path), cfg.ingest.multiLine)
          val (typed, report) = Quality.run(raw, key, spec, cfg.quality)
          (key, typed, report)
        }
    }
    val byKey = gated.map { case (k, df, _) => k -> df }.toMap

    val curated = Transform.buildCuratedTables(
      byKey("train"), byKey("features"), byKey("stores"),
      cfg.datasets.toMap)

    val sink = TableSink.from(cfg.sink)
    val written = cfg.sink.tables.flatMap { case (logical, physical) =>
      curated.get(logical).map { df =>
        sink.write(physical, df)
        physical -> df.count()
      }
    }

    Result(gated.map(_._3), curated, written)
  }

  def main(args: Array[String]): Unit = {
    val cfgPath = args.headOption.getOrElse("conf/retail_pipeline.yaml")
    val cfg = PipelineConfig.load(cfgPath)
    val spark = GraftSession.get(cfg.appName)
    try {
      val result = run(spark, cfg)
      result.reports.foreach { r =>
        println(s"[qc] ${r.datasetKey}: rows=${r.rowCount} dup=${r.duplicateCount} " +
          s"schemaOk=${r.schemaOk} issues=${r.issues.mkString("; ")}")
      }
      result.writtenRows.foreach { case (t, n) => println(s"[sink] $t: $n rows") }
    } finally spark.stop()
  }
}
