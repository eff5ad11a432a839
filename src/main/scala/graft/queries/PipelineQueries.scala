package graft.queries

import graft.pipeline._
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The reference-parity ETL as an oracle-checked query: q44 runs the
  * WHOLE pipeline (zip extraction → CSV scan → schema enforcement →
  * quality gate → joins → curated aggregates → sink) and returns the
  * store_type×year aggregate; the DuckDB oracle recomputes it straight
  * from the extracted CSVs with the same permissive-cast semantics
  * (TRY_CAST ≙ ANSI-off cast). This puts the end-to-end BASELINE
  * workload itself under the per-round correctness and bench gates, not
  * just its operators. (`sfDir` is ignored — the workload is pinned to
  * the reference's raw data, like the baseline it mirrors.)
  */
object PipelineQueries {
  import RelationalQueries.Q

  /** Deterministic work dir — the oracle SQL reads the extracted CSVs
    * from here, so it must be stable across Verify and the oracle run,
    * and the Spark query must run first (Verify does run queries before
    * the oracles execute). Known blind spot: the oracle aggregates the
    * raw CSVs without the quality gate's dropDuplicates — equivalent
    * today because the retail CSVs contain no full-row duplicates; a
    * dedup-affecting change would surface in RetailPipelineSpec's
    * goldens instead.
    */
  private val workDir = "/tmp/graft_retail_q44"

  private def configPath: String =
    if (Files.exists(Paths.get("conf/retail_pipeline.yaml"))) "conf/retail_pipeline.yaml"
    else "/root/repo/conf/retail_pipeline.yaml"

  val queries: Map[String, Q] = Map(
    "q44_retail_agg" -> ((s, _) => {
      val cfg0 = PipelineConfig.load(configPath)
      val cfg = cfg0.copy(
        ingest = cfg0.ingest.copy(workDir = s"$workDir/raw"),
        sink = cfg0.sink.copy(path = s"$workDir/curated"))
      val result = RetailPipeline.run(s, cfg)
      result.curated("agg_store_type_year")
        .select(col("store_type"), col("year"),
          round(col("total_sales"), 2).as("total_sales"),
          round(col("avg_weekly_sales"), 6).as("avg_weekly_sales"),
          col("num_stores").cast("bigint").as("num_stores"))
        .orderBy("store_type", "year")
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_retail_agg" ->
      s"""WITH train AS (
         |  SELECT TRY_CAST("Store" AS INTEGER) AS store_id, "Date" AS date_s,
         |         TRY_CAST("Weekly_Sales" AS DOUBLE) AS weekly_sales
         |  FROM read_csv('$workDir/raw/train.csv', header=true, all_varchar=true)),
         | stores AS (
         |  SELECT TRY_CAST("Store" AS INTEGER) AS store_id, "Type" AS store_type
         |  FROM read_csv('$workDir/raw/stores.csv', header=true, all_varchar=true)),
         | cur AS (
         |  SELECT t.store_id, CAST(YEAR(TRY_CAST(t.date_s AS DATE)) AS INTEGER) AS year,
         |         t.weekly_sales, s.store_type
         |  FROM train t LEFT JOIN stores s USING (store_id))
         |SELECT store_type, year, ROUND(SUM(weekly_sales), 2) AS total_sales,
         |  ROUND(AVG(weekly_sales), 6) AS avg_weekly_sales,
         |  COUNT(DISTINCT store_id) AS num_stores
         |FROM cur GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
