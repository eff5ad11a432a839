package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** End-to-end golden test against the reference's own published outputs:
  * the committed run log (reference logs/pipeline.log:88-107) and the
  * verification notebook (reference testing/sql_queries.ipynb cells 6-9).
  * This is the reference-parity contract: same raw bytes in, same
  * numbers out.
  */
class RetailPipelineSpec extends SparkSpec {

  private lazy val cfg = PipelineConfig.load("conf/retail_pipeline.yaml")
  private lazy val result = RetailPipeline.run(spark, cfg.copy(
    sink = cfg.sink.copy(path = "/tmp/graft_retail_test/curated"),
    ingest = cfg.ingest.copy(workDir = "/tmp/graft_retail_test/raw")))

  test("quality gate reproduces the reference's row counts and findings") {
    val byKey = result.reports.map(r => r.datasetKey -> r).toMap
    assert(byKey("train").rowCount === 421570L)     // logs/pipeline.log:89
    assert(byKey("features").rowCount === 8190L)    // logs/pipeline.log:91
    assert(byKey("stores").rowCount === 45L)        // logs/pipeline.log:94
    assert(result.reports.forall(_.duplicateCount === 0L))
    assert(result.reports.forall(_.schemaOk))
    // "High null fraction in MarkDown2: 64.33%" (logs/pipeline.log:92)
    val md2 = byKey("features").nullFractions.toMap.apply("MarkDown2")
    assert(math.abs(md2 - 0.6433) < 0.0005)
    assert(byKey("features").issues.exists(_.contains("MarkDown2")))
  }

  test("sales_curated is 421,570 rows x 19 columns (notebook cell 9)") {
    val curated = result.curated("sales_curated")
    assert(curated.columns.length === 19)
    assert(curated.count() === 421570L)
  }

  test("aggregate tables match the reference's logged row counts") {
    assert(result.curated("agg_store_dept").count() === 100181L)
    assert(result.curated("agg_store_type_year").count() === 9L)
    assert(result.curated("holidays_vs_normal").count() === 6L)
  }

  test("notebook Q2 golden: average weekly sales by store type") {
    val avgs = spark.sql(
      """SELECT store_type, AVG(weekly_sales) AS avg_sales
        |FROM curated_sales GROUP BY store_type ORDER BY store_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(avgs("A") - 20099.568043) < 1e-4)
    assert(math.abs(avgs("B") - 12237.075977) < 1e-4)
    assert(math.abs(avgs("C") - 9519.532538) < 1e-4)
  }

  test("notebook Q1 golden: top stores by total sales") {
    val top = spark.sql(
      """SELECT store_id, SUM(weekly_sales) AS total_sales
        |FROM curated_sales GROUP BY store_id
        |ORDER BY total_sales DESC LIMIT 10""".stripMargin).collect()
    assert(top.head.getInt(0) === 20)
    assert(math.abs(top.head.getDouble(1) - 3.013978e8) < 1e3)
    assert(top(1).getInt(0) === 4)
    assert(math.abs(top(1).getDouble(1) - 2.995440e8) < 1e3)
  }

  test("left-join semantics: every train row survives J1/J2 (no fan-out, no loss)") {
    assert(result.curated("sales_curated").count() === 421570L)
    // USING-join collapsed store_id: exactly one store_id column.
    assert(result.curated("sales_curated").columns.count(_ == "store_id") === 1)
  }

  test("parquet sink round-trips the curated tables") {
    val written = result.writtenRows.toMap
    assert(written("sales_curated") === 421570L)
    val back = spark.read.parquet("/tmp/graft_retail_test/curated/sales_curated")
    assert(back.count() === 421570L && back.columns.length === 19)
  }

  test("run log mirrors the reference's file+console format") {
    assert(result.reports.nonEmpty) // force the run
    val log = java.nio.file.Paths.get(cfg.logFile.get)
    assert(java.nio.file.Files.exists(log), s"no run log at $log")
    val text = java.nio.file.Files.readString(log)
    // reference format: `%(asctime)s [%(levelname)s] %(name)s - %(message)s`
    assert(text.linesIterator.exists(
      _.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} \[INFO\] graft\.pipeline - QC train: rows=421570 .*""")),
      text.take(500))
    assert(text.contains("[INFO] graft.pipeline - Pipeline complete"))
    assert(text.contains("[WARNING] graft.pipeline - QC features: High null fraction"))
  }

  test("multiLine parse handles quoted embedded newlines (S4) and both modes agree on newline-free data") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createDirectories(Paths.get("/tmp/graft_retail_test/csv"))
    val quoted = dir.resolve("quoted.csv")
    Files.writeString(quoted, "id,note\n1,\"line one\nline two\"\n2,plain\n")
    val ml = Ingest.readCsv(spark, Seq(quoted.toString), multiLine = true)
    assert(ml.count() === 2L)
    assert(ml.filter(col("id") === "1").head().getString(1) === "line one\nline two")

    // On the real (newline-free) retail CSV the splittable parse is
    // row-identical to the multiLine one — the equivalence that makes
    // multi_line:false safe in the retail config.
    assert(result.reports.nonEmpty) // forces the extraction below to exist
    val train = "/tmp/graft_retail_test/raw/train.csv"
    val a = Ingest.readCsv(spark, Seq(train), multiLine = true)
    val b = Ingest.readCsv(spark, Seq(train), multiLine = false)
    assert(b.rdd.getNumPartitions >= 1 && a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("NA markdown strings became real nulls via cast (ANSI off)") {
    val curated = result.curated("sales_curated")
    val nulls = curated.filter(col("markdown_1").isNull).count()
    assert(nulls > 200000L, s"expected most markdown_1 null, got $nulls")
    assert(curated.schema("markdown_1").dataType.typeName === "double")
  }
}
