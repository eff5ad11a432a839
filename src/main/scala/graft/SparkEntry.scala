package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ChangeDataQueries, DedupQueries, EventQueries,
  PipelineQueries, RelationalQueries, SimilarityQueries, SourceQueries,
  TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain batteries; each key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (hash-internal dedup, streaming, multimodal stubs),
  * in which case the driver records a rows-only check and the ScalaTest
  * suite pins semantics instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema revenue rollup: fact joined to broadcast dims.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_star_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ DedupQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      TemporalQueries.queries ++ PipelineQueries.queries ++
      ChangeDataQueries.queries ++ SourceQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ DedupQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      TemporalQueries.oracles ++ PipelineQueries.oracles ++
      ChangeDataQueries.oracles ++ SourceQueries.oracles
}
