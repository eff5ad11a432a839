package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, unix_millis, when}
import org.apache.spark.sql.types.{BooleanType, DateType}

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
  * storage). Parquet/Derby keep real DATE/BOOLEAN types by default;
  * `sink.sqlite_compat: true` wraps any sink in `SqliteCompatSink` to
  * reproduce the reference shape bit-for-bit for migrating consumers.
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

/** SQLite-fidelity compatibility wrapper: reproduces the reference DB's
  * observable output shape (reference testing/sql_queries.ipynb cell 6;
  * SURVEY §1 declares it contractual) on top of any sink — DateType
  * columns become epoch-millis BIGINT and booleans become 0/1 — so a
  * consumer of the reference's SQLite tables can point at this engine's
  * output without changing a single query-side cast.
  */
final class SqliteCompatSink(inner: TableSink) extends TableSink {
  private[graft] def compat(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case DateType =>
          // SQLite stored epoch ms of the date at UTC midnight
          acc.withColumn(f.name,
            unix_millis(col(f.name).cast("timestamp")))
        case BooleanType =>
          acc.withColumn(f.name,
            when(col(f.name).isNull, null).otherwise(
              when(col(f.name), 1L).otherwise(0L)))
        case _ => acc
      }
    }

  def write(name: String, df: DataFrame): Unit = inner.write(name, compat(df))
}

object TableSink {
  def from(cfg: SinkConfig): TableSink = {
    val base: TableSink = cfg.format match {
      case "jdbc" => new JdbcSink(cfg.jdbcUrl, cfg.jdbcDriver, cfg.mode)
      case _ => new ParquetSink(cfg.path, cfg.mode, cfg.partitionBy)
    }
    if (cfg.sqliteCompat) new SqliteCompatSink(base) else base
  }
}
