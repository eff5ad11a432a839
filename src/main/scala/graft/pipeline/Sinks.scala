package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Pluggable curated-table sinks (reference operator S6). The reference
  * writes SQLite via JDBC; sqlite-jdbc isn't on the offline classpath, so
  * the JDBC sink targets embedded Derby (same `df.write.format("jdbc")`
  * surface) and the default sink is parquet — the format a 100 TB
  * deployment would actually use (columnar, splittable, predicate-
  * pushdown-able on re-read; a single-file JDBC funnel is the one
  * reference component that cannot scale).
  *
  * Observable-behavior note from the reference's SQLite output: DateType
  * surfaced as epoch-millis integers and booleans as 0/1 (typeless
  * storage). Parquet/Derby keep real DATE/BOOLEAN types; consumers of the
  * reference DB relying on epoch-ms must cast at query time.
  */
trait TableSink {
  def write(physicalName: String, df: DataFrame): Unit
}

/** `partitionBy` lays the table out as hive-style partition directories —
  * the 100 TB shape: readers prune partitions from predicates on the
  * partition columns without touching data files.
  */
final class ParquetSink(baseDir: String, mode: String,
                        partitionBy: Seq[String] = Nil) extends TableSink {
  def write(name: String, df: DataFrame): Unit = {
    val w = df.write.mode(mode)
    // No existence pre-check: a misconfigured partition column must fail
    // loudly (AnalysisException naming it), not silently write flat.
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$baseDir/$name")
  }
}

final class JdbcSink(url: String, driver: String, mode: String) extends TableSink {
  def write(name: String, df: DataFrame): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", name)
      .option("driver", driver)
      .mode(mode)
      .save()
}

object TableSink {
  def from(cfg: SinkConfig): TableSink = cfg.format match {
    case "jdbc" => new JdbcSink(cfg.jdbcUrl, cfg.jdbcDriver, cfg.mode)
    case _ => new ParquetSink(cfg.path, cfg.mode, cfg.partitionBy)
  }
}
