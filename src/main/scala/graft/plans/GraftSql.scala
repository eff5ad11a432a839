package graft.plans

import graft.operators.Manifest
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** SQL WRITE VERBS for the lakehouse layer — the operable-from-SQL-text
  * half the read verbs (`graft_history`/`graft_snapshot`/`graft_detail`/
  * `graft_changes` table functions) left open. Each verb maps 1:1 onto
  * a `Manifest` lifecycle API and returns a one-row result relation
  * (the committed version / deletion counts), so a SQL-only operator
  * can run the whole maintenance lifecycle:
  *
  *   GRAFT CHECKPOINT '<dir>'
  *   GRAFT VACUUM '<dir>'
  *   GRAFT RESTORE '<dir>' TO VERSION <n>
  *   GRAFT OPTIMIZE '<dir>' PARTITION BY <col> [FILES <n>]
  *   GRAFT DELETE FROM '<dir>' WHERE <predicate>        -- merge-on-read
  *   GRAFT APPLY DELETES '<dir>' PARTITION BY <col>     -- fold the DV
  *   GRAFT PURGE '<dir>' PARTITION BY <col> WHERE <predicate>
  *   GRAFT MERGE INTO '<dir>' PARTITION BY <col> USING <view>
  *         ON <k1>[, k2 ...] [DELETE WHEN <boolCol>] [BATCH <id>]
  *   GRAFT BRANCH CREATE '<dir>' <name>   /  GRAFT BRANCH MERGE '<dir>' <name>
  *   GRAFT PURGE KEYS '<dir>' PARTITION BY <col> USING <view>
  *         ON <k1>[, k2 ...]                       -- RTBF forget-list
  *   GRAFT ADD BLOOM INDEX '<dir>' ON <col> [BITS <n>] [K <n>]
  *   GRAFT ADD DISTINCT SKETCH '<dir>' ON <col> [K <n>]
  *   GRAFT TTL SWEEP '<dir>' CLASS <col> TIME <col>
  *         POLICY '<class>'=<days>[, ...] AS OF '<date>'
  *
  * Two front doors, same verbs:
  *   - sessions built with `spark.sql.extensions=graft.GraftExtensions`
  *     parse them straight from `spark.sql(...)` (a `GraftSqlParser`
  *     wraps the session parser; non-GRAFT text delegates untouched);
  *   - `GraftSql.run(spark, text)` executes the same grammar on ANY
  *     session (the extension-less fallback the oracle gates use).
  *
  * Predicates/sources resolve with full Spark SQL power: WHERE text
  * compiles via `functions.expr`, MERGE sources are named temp views or
  * tables — so "operable from SQL" means the real expression language,
  * not a toy subset.
  *
  * Lineage: the reference's whole SQL surface is read-only notebook
  * queries over its SQLite sink (reference `testing/sql_queries.ipynb`
  * cells 5-8 — the S7 operator in SURVEY.md §2); graft's `spark.sql`
  * covers those verbatim (q53), and these verbs extend the surface to
  * the write/maintenance lifecycle the reference has no analogue for.
  */
sealed trait GraftVerb {
  def schema: StructType
  def run(spark: SparkSession): Seq[Row]
  final def execute(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(run(spark).asJava, schema)
  }
}

object GraftVerb {
  private def longs(names: String*): StructType =
    StructType(names.map(n => StructField(n, LongType, nullable = false)))

  case class Checkpoint(dir: String) extends GraftVerb {
    val schema = longs("checkpoint_version")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.checkpoint(spark, dir).toLong))
  }

  case class Vacuum(dir: String) extends GraftVerb {
    val schema =
      longs("data_files_deleted", "manifests_deleted", "dv_deltas_deleted")
    def run(spark: SparkSession): Seq[Row] = {
      val (d, m, v) = Manifest.vacuum(spark, dir)
      Seq(Row(d, m, v))
    }
  }

  case class Restore(dir: String, toVersion: Int) extends GraftVerb {
    val schema = longs("version")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.restore(spark, dir, toVersion).toLong))
  }

  case class Optimize(dir: String, partCol: String,
      filesPerPartition: Int) extends GraftVerb {
    val schema = longs("version")
    def run(spark: SparkSession): Seq[Row] = {
      Manifest.compact(spark, dir, partCol, filesPerPartition)
      Seq(Row(Manifest.latestVersion(dir,
        spark.sparkContext.hadoopConfiguration).toLong))
    }
  }

  case class Delete(dir: String, predicate: String) extends GraftVerb {
    val schema = longs("rows_deleted")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.deleteRows(spark, dir, expr(predicate))))
  }

  case class Purge(dir: String, partCol: String,
      predicate: String) extends GraftVerb {
    val schema = longs("version")
    def run(spark: SparkSession): Seq[Row] = {
      Manifest.purge(spark, dir, partCol, expr(predicate))
      Seq(Row(Manifest.latestVersion(dir,
        spark.sparkContext.hadoopConfiguration).toLong))
    }
  }

  case class Merge(dir: String, partCol: String, source: String,
      keyCols: Seq[String], deleteWhen: Option[String],
      batchId: Long) extends GraftVerb {
    val schema = longs("version")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.merge(spark, dir, partCol, spark.table(source),
        keyCols, deleteWhen.orNull, batchId = batchId).toLong))
  }

  case class ApplyDeletes(dir: String, partCol: String) extends GraftVerb {
    val schema = longs("applied", "version")
    def run(spark: SparkSession): Seq[Row] = {
      val applied = Manifest.applyDeletes(spark, dir, partCol)
      Seq(Row(if (applied) 1L else 0L, Manifest.latestVersion(dir,
        spark.sparkContext.hadoopConfiguration).toLong))
    }
  }

  case class BranchCreate(dir: String, name: String) extends GraftVerb {
    val schema = longs("base_version")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.branchCreate(spark, dir, name).toLong))
  }

  case class BranchMerge(dir: String, name: String) extends GraftVerb {
    val schema = longs("version")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.branchMergeInto(spark, dir, name).toLong))
  }

  /** The RTBF forget-list purge over a PLAIN partitioned layout (the
    * q177 shape — dynamic-overwrite lifecycles, not the manifest
    * protocol): victims arrive as a key RELATION, so a domain-scale
    * forget list rides a join, never an IN-list. Reports the victim
    * row count (a one-pass semi-join census BEFORE the rewrite — the
    * verb's receipt; 0 = nothing matched, layout untouched).
    */
  case class PurgeKeys(dir: String, partCol: String, source: String,
      keyCols: Seq[String]) extends GraftVerb {
    val schema = longs("rows_purged")
    def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val keys = spark.table(source)
      val n = spark.read.parquet(dir)
        .join(keys.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_semi").count()
      graft.operators.ChangeData.purgeRowsKeys(spark, dir, partCol,
        keys, keyCols)
      Seq(Row(n))
    }
  }

  /** Index builds loop their bounded maintenance passes to convergence
    * (the per-pass file cap is `graft.manifest.indexBatchMaxFiles`):
    * `passes` = work done (0 = already fully indexed — the no-op
    * receipt an idempotence referee keys on).
    */
  case class AddBloomIndex(dir: String, column: String, bits: Int,
      k: Int) extends GraftVerb {
    val schema = longs("passes", "version")
    def run(spark: SparkSession): Seq[Row] = {
      var passes = 0L
      while (Manifest.addBloomIndex(spark, dir, column, bits, k))
        passes += 1L
      Seq(Row(passes, Manifest.latestVersion(dir,
        spark.sparkContext.hadoopConfiguration).toLong))
    }
  }

  case class AddDistinctSketch(dir: String, column: String,
      k: Int) extends GraftVerb {
    val schema = longs("passes", "version")
    def run(spark: SparkSession): Seq[Row] = {
      var passes = 0L
      while (Manifest.addDistinctSketch(spark, dir, column, k))
        passes += 1L
      Seq(Row(passes, Manifest.latestVersion(dir,
        spark.sparkContext.hadoopConfiguration).toLong))
    }
  }

  case class TtlSweep(dir: String, classCol: String, timeCol: String,
      policyDays: Seq[(String, Int)], asOf: String) extends GraftVerb {
    val schema = longs("rows_deleted")
    def run(spark: SparkSession): Seq[Row] =
      Seq(Row(Manifest.ttlSweep(spark, dir, classCol, timeCol,
        policyDays.toMap, asOf)))
  }
}

object GraftSql {

  // one regex per verb; (?is) = case-insensitive + WHERE text may span
  // lines. Layout dirs are single-quoted literals (exactly like the
  // read table functions); identifiers are plain words.
  private val CheckpointV =
    """(?is)\s*GRAFT\s+CHECKPOINT\s+'([^']+)'\s*;?\s*""".r
  private val VacuumV =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s*;?\s*""".r
  private val RestoreV =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val OptimizeV =
    ("""(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+PARTITION\s+BY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)(?:\s+FILES\s+(\d+))?\s*;?\s*""").r
  private val DeleteV =
    """(?is)\s*GRAFT\s+DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val PurgeV =
    ("""(?is)\s*GRAFT\s+PURGE\s+'([^']+)'\s+PARTITION\s+BY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val ApplyDeletesV =
    ("""(?is)\s*GRAFT\s+APPLY\s+DELETES\s+'([^']+)'\s+PARTITION\s+BY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val BranchCreateV =
    """(?is)\s*GRAFT\s+BRANCH\s+CREATE\s+'([^']+)'\s+([A-Za-z0-9_\-]+)\s*;?\s*""".r
  private val BranchMergeV =
    """(?is)\s*GRAFT\s+BRANCH\s+MERGE\s+'([^']+)'\s+([A-Za-z0-9_\-]+)\s*;?\s*""".r
  private val MergeV =
    ("""(?is)\s*GRAFT\s+MERGE\s+INTO\s+'([^']+)'\s+PARTITION\s+BY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+USING\s+([A-Za-z_][A-Za-z0-9_.]*)\s+""" +
      """ON\s+([A-Za-z0-9_,\s]+?)(?:\s+DELETE\s+WHEN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*))?(?:\s+BATCH\s+(\d+))?\s*;?\s*""").r
  private val PurgeKeysV =
    ("""(?is)\s*GRAFT\s+PURGE\s+KEYS\s+'([^']+)'\s+PARTITION\s+BY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+USING\s+([A-Za-z_][A-Za-z0-9_.]*)\s+""" +
      """ON\s+([A-Za-z0-9_,\s]+?)\s*;?\s*""").r
  private val AddBloomV =
    ("""(?is)\s*GRAFT\s+ADD\s+BLOOM\s+INDEX\s+'([^']+)'\s+ON\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)(?:\s+BITS\s+(\d+))?""" +
      """(?:\s+K\s+(\d+))?\s*;?\s*""").r
  private val AddSketchV =
    ("""(?is)\s*GRAFT\s+ADD\s+DISTINCT\s+SKETCH\s+'([^']+)'\s+ON\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)(?:\s+K\s+(\d+))?\s*;?\s*""").r
  private val TtlSweepV =
    ("""(?is)\s*GRAFT\s+TTL\s+SWEEP\s+'([^']+)'\s+CLASS\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+TIME\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s+POLICY\s+((?:'[^']+'\s*=\s*\d+\s*,?\s*)+)""" +
      """AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val PolicyEntry = """'([^']+)'\s*=\s*(\d+)""".r

  /** Some(verb) for GRAFT statements, None for everything else; a
    * GRAFT-prefixed statement matching no verb is a LOUD parse error
    * (delegating it would surface a baffling ANTLR message instead).
    */
  def parse(sqlText: String): Option[GraftVerb] = {
    if (!sqlText.trim.toUpperCase(java.util.Locale.ROOT)
        .startsWith("GRAFT ")) return None
    Some(sqlText match {
      case CheckpointV(dir) => GraftVerb.Checkpoint(dir)
      case VacuumV(dir) => GraftVerb.Vacuum(dir)
      case RestoreV(dir, v) => GraftVerb.Restore(dir, v.toInt)
      case OptimizeV(dir, partCol, files) =>
        GraftVerb.Optimize(dir, partCol,
          Option(files).map(_.toInt).getOrElse(1))
      case DeleteV(dir, pred) => GraftVerb.Delete(dir, pred)
      case PurgeKeysV(dir, partCol, source, keys) =>
        GraftVerb.PurgeKeys(dir, partCol, source,
          keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      case PurgeV(dir, partCol, pred) => GraftVerb.Purge(dir, partCol, pred)
      case AddBloomV(dir, column, bits, k) =>
        GraftVerb.AddBloomIndex(dir, column,
          Option(bits).map(_.toInt).getOrElse(8192),
          Option(k).map(_.toInt).getOrElse(6))
      case AddSketchV(dir, column, k) =>
        GraftVerb.AddDistinctSketch(dir, column,
          Option(k).map(_.toInt).getOrElse(1024))
      case TtlSweepV(dir, classCol, timeCol, policy, asOf) =>
        GraftVerb.TtlSweep(dir, classCol, timeCol,
          PolicyEntry.findAllMatchIn(policy)
            .map(m => m.group(1) -> m.group(2).toInt).toSeq, asOf)
      case ApplyDeletesV(dir, partCol) =>
        GraftVerb.ApplyDeletes(dir, partCol)
      case BranchCreateV(dir, name) => GraftVerb.BranchCreate(dir, name)
      case BranchMergeV(dir, name) => GraftVerb.BranchMerge(dir, name)
      case MergeV(dir, partCol, source, keys, delWhen, batch) =>
        GraftVerb.Merge(dir, partCol, source,
          keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          Option(delWhen), Option(batch).map(_.toLong).getOrElse(-1L))
      case other => throw new IllegalArgumentException(
        s"unrecognized GRAFT statement: ${other.trim.take(120)} - " +
          "supported verbs: CHECKPOINT, VACUUM, RESTORE ... TO VERSION n, " +
          "OPTIMIZE ... PARTITION BY c [FILES n], DELETE FROM ... WHERE p, " +
          "PURGE ... PARTITION BY c WHERE p, PURGE KEYS ... PARTITION BY " +
          "c USING v ON k1[,k2], APPLY DELETES ... PARTITION BY c, " +
          "BRANCH CREATE/MERGE ... name, MERGE INTO ... PARTITION BY c " +
          "USING v ON k1[,k2] [DELETE WHEN b], ADD BLOOM INDEX ... ON c " +
          "[BITS n] [K n], ADD DISTINCT SKETCH ... ON c [K n], TTL " +
          "SWEEP ... CLASS c TIME t POLICY 'cls'=days[,...] AS OF 'date'")
    })
  }

  /** Execute `sqlText` on ANY session: GRAFT verbs run directly (no
    * parser injection needed), everything else goes to `spark.sql`.
    * The session-extension route (`spark.sql("GRAFT ...")` on a session
    * built with graft.GraftExtensions) produces the same plans.
    */
  def run(spark: SparkSession, sqlText: String): DataFrame =
    parse(sqlText) match {
      case Some(verb) => verb.execute(spark)
      case None => spark.sql(sqlText)
    }
}

/** The analyzed-plan form of a verb — what the injected parser returns,
  * so `spark.sql("GRAFT ...")` flows through the normal command
  * execution path (and EXPLAIN shows the verb like any DDL command).
  */
case class GraftVerbCommand(verb: GraftVerb) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = verb.schema.fields.toSeq
    .map(f => AttributeReference(f.name, f.dataType, nullable = true)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    verb.run(sparkSession)
}

/** Session parser wrapper: GRAFT statements become `GraftVerbCommand`
  * plans; every other surface delegates verbatim to the session parser.
  * Installed by `graft.GraftExtensions` via `injectParser` (build-time
  * config `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parse(sqlText) match {
      case Some(verb) => GraftVerbCommand(verb)
      case None => delegate.parsePlan(sqlText)
    }
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
