package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSACTIONAL MANIFEST layout — the atomic-publish protocol the
  * dynamic-partition-overwrite lifecycles (q140 backfill, q177 purge,
  * q107/q176 appends) lack. A dynamic overwrite replaces partition
  * directories one rename at a time, so a concurrent reader listing the
  * directory mid-rewrite can see HALF a multi-partition commit (day 3
  * new, day 5 still old) and a crashed writer leaves half its output
  * live. Here data files are IMMUTABLE and invisible until published:
  *
  *   - every write lands in a fresh `data/c{version}/` commit directory;
  *   - a snapshot is a manifest file `_manifests/v{version}.json`
  *     listing exactly the (partition, file) pairs that constitute it;
  *   - commit is ONE atomic rename of the manifest into place (rename
  *     fails loudly if a concurrent committer won the version — no
  *     silent lost update);
  *   - readers pin a manifest version up front and read exactly its
  *     files, so a mid-rewrite read is the OLD snapshot or the NEW one,
  *     never a mix, and a crashed writer's orphan files (data written,
  *     manifest never renamed) are invisible forever;
  *   - old versions stay readable (time travel / audit) until `vacuum`,
  *     which drops every data file the LATEST manifest doesn't
  *     reference plus the superseded manifests.
  *
  * Scale shape: one Spark write job per commit (hive-routed by a COPY
  * of the partition column, so data files keep the real column and
  * snapshot reads need no re-attachment join); the manifest is
  * partition-domain × files-per-partition sized — the same
  * driver-bounded census q140/q177 already ride on — and
  * `readPartitions` prunes to the matching manifest entries so a
  * point lookup reads |hit partitions| worth of bytes, not the table.
  */
object Manifest {

  private val PartDir = "__p"

  /** One snapshot member: partition value, relative file path, and —
    * when the layout tracks a stats column — the file's min/max of it
    * (None when every row's stats value is NULL; such a file is
    * conservatively INCLUDED by every range read).
    */
  private[graft] case class Entry(p: String, file: String,
      lo: Option[Long] = None, hi: Option[Long] = None,
      bloom: Option[String] = None)

  /** Resolve an entry's data-file path: branch manifests reference
    * foreign (source-layout) files by ABSOLUTE path — the zero-copy
    * mechanism; everything else stays dir-relative.
    */
  private def filePath(dir: String, e: Entry): String =
    if (e.file.startsWith("/")) e.file else s"$dir/${e.file}"

  private def fs(dir: String, conf: Configuration) =
    new Path(dir).getFileSystem(conf)

  private def manifestPath(dir: String, version: Int) =
    new Path(s"$dir/_manifests", f"v$version%06d.json")

  /** Largest committed version, or 0 if none. */
  def latestVersion(dir: String, conf: Configuration): Int = {
    val mdir = new Path(s"$dir/_manifests")
    val f = fs(dir, conf)
    if (!f.exists(mdir)) return 0
    f.listStatus(mdir).map(_.getPath.getName)
      .collect { case s if s.matches("v\\d{6}\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  /** One-rename commit: the version is taken or it isn't — a lost race
    * is a loud failure, never a silent overwrite of someone else's
    * snapshot.
    */
  private[graft] def commitManifest(dir: String, version: Int,
      entries: Seq[Entry], conf: Configuration, batch: Long = -1L): Unit = {
    val f = fs(dir, conf)
    val tmp = new Path(s"$dir/_manifests",
      s".tmp-${ProcessHandle.current().pid()}-v$version")
    val out = f.create(tmp, true)
    try {
      val header = if (batch >= 0)
        s"""{"version":$version,"batch":$batch}\n"""
      else s"""{"version":$version}\n"""
      out.write(header.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      entries.sortBy(e => (e.p, e.file)).foreach { e =>
        val stats = (e.lo, e.hi) match {
          case (Some(l), Some(h)) => s""","lo":$l,"hi":$h"""
          case _ => ""
        }
        val bloom = e.bloom.map(b => s""","bloom":"$b"""").getOrElse("")
        out.write(s"""{"p":"${e.p}","file":"${e.file}"$stats$bloom}\n"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    } finally out.close()
    val target = manifestPath(dir, version)
    require(!f.exists(target) && f.rename(tmp, target),
      s"manifest commit v$version lost the race (another writer " +
        s"published it) - rebase on latestVersion and retry")
  }

  private def readManifest(dir: String, version: Int,
      conf: Configuration): Seq[Entry] = {
    val p = manifestPath(dir, version)
    val f = fs(dir, conf)
    require(f.exists(p),
      s"$dir has no manifest v$version - not a Manifest layout, or the " +
        "version was vacuumed")
    val in = f.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    val Line =
      ("""\{"p":"([^"]*)","file":"([^"]*)"(?:,"lo":(-?\d+),"hi":(-?\d+))?""" +
        """(?:,"bloom":"([A-Za-z0-9+/=]*)")?\}""").r
    lines.drop(1).map { case Line(pv, file, lo, hi, bloom) =>
      Entry(pv, file, Option(lo).map(_.toLong), Option(hi).map(_.toLong),
        Option(bloom))
    }
  }

  /** Write `df` as an UNCOMMITTED commit directory and return its
    * manifest entries. Public only through the lifecycle ops below and
    * the crash-simulation gates: files written here are invisible to
    * every reader until a manifest referencing them is renamed in.
    */
  private[graft] def writeCommitFiles(df: DataFrame, dir: String,
      partCol: String, version: Int, statsCol: String = null,
      suffix: String = ""): Seq[Entry] = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val commitRel = f"data/c$version%06d$suffix%s"
    // overwrite: version N's dir can only pre-exist as the debris of a
    // CRASHED attempt at N (a committed N forces later writers to N+1),
    // so a retry reclaims it cleanly. One writer per version — the
    // manifest rename CAS serializes commits, not concurrent file
    // writes into the same uncommitted dir.
    df.withColumn(PartDir, col(partCol).cast("string"))
      .write.mode("overwrite").partitionBy(PartDir)
      .parquet(s"$dir/$commitRel")
    // per-file min/max of the stats column for range skipping: one scan
    // of ONLY the just-written bytes, keyed by physical file
    val stats: Map[String, (Long, Long)] =
      if (statsCol == null) Map.empty
      else spark.read.parquet(s"$dir/$commitRel")
        .groupBy(input_file_name().as("__f"))
        .agg(min(col(statsCol).cast("long")).as("lo"),
          max(col(statsCol).cast("long")).as("hi"))
        .filter(col("lo").isNotNull)
        .collect()
        .map(r => tailKey(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val f = fs(dir, conf)
    val PartSeg = s"$PartDir=(.+)".r
    f.listStatus(new Path(s"$dir/$commitRel")).toSeq
      .filter(_.isDirectory).flatMap { d =>
        val p = d.getPath.getName match {
          case PartSeg(v) => v
          case other => sys.error(s"unexpected commit subdir $other")
        }
        require(p.matches("[-A-Za-z0-9_.:]+"),
          s"partition value '$p' is not hive-path-safe - the manifest " +
            "protocol requires plain date/number/word partition values")
        f.listStatus(d.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map { s =>
            val name = s.getPath.getName
            // a task writing several partitions reuses its part-file
            // name in each __p= dir, so the stats key carries both
            val st = stats.get(s"$PartDir=$p/$name")
            Entry(p, s"$commitRel/$PartDir=$p/$name",
              st.map(_._1), st.map(_._2))
          }
      }
  }

  /** Last two path segments — `__p=<v>/<file>` — the within-commit
    * unique key for a data file.
    */
  private def tailKey(uri: String): String = {
    val i = uri.lastIndexOf('/')
    val j = uri.lastIndexOf('/', i - 1)
    uri.substring(j + 1)
  }

  /** Create a new manifested layout (v1). Loud if one already exists.
    * `statsCol` (optional, a long-castable column) turns on per-file
    * min/max tracking for `readRange` data skipping — every later
    * commit into the layout must pass the same column.
    */
  def create(df: DataFrame, dir: String, partCol: String,
      statsCol: String = null): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    require(latestVersion(dir, conf) == 0,
      s"$dir already holds a manifested layout - use append/overwrite")
    commitManifest(dir, 1, writeCommitFiles(df, dir, partCol, 1, statsCol),
      conf)
  }

  /** Batch ids already committed into this layout (bounded by the
    * version count — one header line per manifest).
    */
  def committedBatches(dir: String, conf: Configuration): Set[Long] = {
    val mdir = new Path(s"$dir/_manifests")
    val f = fs(dir, conf)
    if (!f.exists(mdir)) return Set.empty
    val B = """"batch":(\d+)""".r
    f.listStatus(mdir).toSeq
      .filter(_.getPath.getName.matches("v\\d{6}\\.json"))
      .flatMap { st =>
        val in = f.open(st.getPath)
        val head = try {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(in,
              java.nio.charset.StandardCharsets.UTF_8))
          Option(r.readLine()).getOrElse("")
        } finally in.close()
        B.findFirstMatchIn(head).map(_.group(1).toLong)
      }.toSet
  }

  /** EXACTLY-ONCE streaming sink commit (the foreachBatch contract):
    * append `df` as one atomic commit STAMPED with the micro-batch id.
    * A replayed batch — Structured Streaming re-delivers the same
    * batchId after a crash or rebalance — is detected by the stamp and
    * skipped BEFORE any file is written, so retries cannot duplicate
    * rows or even shed orphans. Returns whether the batch committed
    * (false = replay no-op). The at-least-once foreachBatch delivery
    * plus this idempotent commit is exactly-once publication.
    */
  def commitBatch(df: DataFrame, dir: String, partCol: String,
      batchId: Long, statsCol: String = null): Boolean = {
    require(batchId >= 0, s"commitBatch: batchId must be >= 0, got $batchId")
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    if (committedBatches(dir, conf).contains(batchId)) return false
    // empty micro-batches (streaming engines deliver them) publish
    // nothing; re-skipping an unstamped empty replay is harmless
    if (df.isEmpty) return false
    val base = latestVersion(dir, conf)
    val entries = writeCommitFiles(df, dir, partCol, base + 1, statsCol)
    val prev = if (base >= 1) readManifest(dir, base, conf)
               else Seq.empty[Entry]
    commitManifest(dir, base + 1, prev ++ entries, conf, batch = batchId)
    true
  }

  /** Append-only commit: old entries survive untouched. */
  def append(df: DataFrame, dir: String, partCol: String,
      statsCol: String = null): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val entries = writeCommitFiles(df, dir, partCol, base + 1, statsCol)
    commitManifest(dir, base + 1,
      readManifest(dir, base, conf) ++ entries, conf)
  }

  /** Multi-partition overwrite published as ONE commit: every partition
    * present in `df` swaps to the new files in the same manifest rename
    * — the atomic twin of `ChangeData.overwritePartitions`.
    */
  def overwritePartitions(df: DataFrame, dir: String,
      partCol: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val entries = writeCommitFiles(df, dir, partCol, base + 1)
    val touched = entries.map(_.p).toSet
    commitManifest(dir, base + 1,
      readManifest(dir, base, conf).filterNot(e => touched(e.p)) ++ entries,
      conf)
  }

  /** A prepared-but-unpublished partition overwrite: data files are on
    * disk (in a writer-unique commit dir, so concurrent preparers can
    * never clobber each other) and invisible until `commitPrepared`
    * publishes them. `base` is the snapshot version the writer read
    * its inputs from — the conflict check anchors there.
    */
  case class PreparedCommit(base: Int, entries: Seq[Entry],
      touched: Set[String])

  /** Partitions whose file set differs between versions `from` and `to`
    * — the write-set a snapshot-isolation conflict check compares
    * against. File paths are unique per commit, so ANY rewrite/append/
    * drop in the window surfaces as a set difference.
    */
  private[graft] def changedPartitions(dir: String, from: Int, to: Int,
      conf: Configuration): Set[String] = {
    if (to <= from) return Set.empty
    def byPart(v: Int): Map[String, Set[String]] =
      readManifest(dir, v, conf).groupBy(_.p)
        .view.mapValues(_.map(_.file).toSet).toMap
    val a = byPart(from)
    val b = byPart(to)
    (a.keySet ++ b.keySet)
      .filter(p => a.getOrElse(p, Set.empty) != b.getOrElse(p, Set.empty))
  }

  /** Stage a partition overwrite from the CURRENT snapshot without
    * publishing it — the optimistic-concurrency prepare phase. Files
    * land in a commit dir salted with a writer-unique token, so two
    * writers preparing from the same base cannot collide on disk.
    */
  def prepareOverwrite(df: DataFrame, dir: String,
      partCol: String): PreparedCommit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val token =
      s"-w${ProcessHandle.current().pid()}x${System.nanoTime().toHexString}"
    val entries = writeCommitFiles(df, dir, partCol, base + 1,
      suffix = token)
    PreparedCommit(base, entries, entries.map(_.p).toSet)
  }

  /** Publish a prepared overwrite under SNAPSHOT-ISOLATION optimistic
    * concurrency (the Delta/Iceberg commit protocol): commits that
    * landed after `prep.base` are examined — if any touched one of the
    * writer's partitions, the publish fails LOUDLY (first committer
    * wins; the loser must re-read and re-prepare, because its inputs
    * may be stale); if all are disjoint, the writer's delta REBASES
    * onto the latest manifest and retries the one-rename CAS. Returns
    * the committed version. A writer that loses the rename race itself
    * (two publishes in the same instant) re-reads and retries up to
    * `maxAttempts` times — its data files never move, only the
    * manifest merge is redone, so a retry is census-cheap.
    */
  def commitPrepared(spark: SparkSession, dir: String,
      prep: PreparedCommit, maxAttempts: Int = 5): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    var attempt = 0
    while (true) {
      val latest = latestVersion(dir, conf)
      val conflicts =
        changedPartitions(dir, prep.base, latest, conf)
          .intersect(prep.touched)
      require(conflicts.isEmpty,
        s"write-write conflict on partitions ${conflicts.toSeq.sorted
          .mkString(", ")}: they changed after base v${prep.base} - " +
          "re-read the table and re-prepare")
      val merged = readManifest(dir, latest, conf)
        .filterNot(e => prep.touched(e.p)) ++ prep.entries
      try {
        commitManifest(dir, latest + 1, merged, conf)
        return latest + 1
      } catch {
        case e: IllegalArgumentException if attempt < maxAttempts =>
          attempt += 1 // lost the rename race - re-read and rebase again
      }
    }
    -1 // unreachable
  }

  /** CHANGE DATA FEED between two committed versions: because data
    * files are IMMUTABLE, the row-level delta IS the file-level delta —
    * inserted rows live in files only the newer manifest references,
    * deleted rows in files only the older one does, and NOTHING ELSE is
    * read (an in-place update surfaces as delete+insert, the standard
    * CDF shape without row ids). Cost scales with the changed files,
    * never the table.
    */
  def changesBetween(spark: SparkSession, dir: String, from: Int,
      to: Int): DataFrame = {
    require(from <= to, s"changesBetween: from $from > to $to")
    val conf = spark.sparkContext.hadoopConfiguration
    val eF = readManifest(dir, from, conf)
    val eT = readManifest(dir, to, conf)
    val fSet = eF.map(_.file).toSet
    val tSet = eT.map(_.file).toSet
    def readSide(entries: Seq[Entry], kind: String): Option[DataFrame] =
      if (entries.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(entries.map(e => filePath(dir, e)): _*)
        .withColumn("_change", lit(kind)))
    val sides = Seq(
      readSide(eT.filterNot(e => fSet(e.file)), "insert"),
      readSide(eF.filterNot(e => tSet(e.file)), "delete")).flatten
    if (sides.isEmpty)
      readVersion(spark, dir, to).withColumn("_change", lit("")).limit(0)
    else sides.reduce(_ unionByName (_, allowMissingColumns = true))
  }

  /** CDC REPLICATION consumer: reconstruct the latest snapshot by
    * FOLDING the per-version change feeds onto the v1 snapshot —
    * replica_{v} = replica_{v−1} ∖ deletes_v ∪ inserts_v (multiset
    * semantics; exceptAll). Proves the feed is COMPLETE and COMPOSABLE
    * step by step, which a single from→to diff can't: any version
    * whose feed under- or over-reports rows diverges the replica.
    * Lineage is cut per step, so the fold is #versions shallow plans.
    */
  def replicateFromFeed(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val latest = latestVersion(dir, conf)
    require(latest >= 1, s"$dir is not a manifested layout")
    var replica = readVersion(spark, dir, 1).localCheckpoint(true)
    (2 to latest).foreach { v =>
      val feed = changesBetween(spark, dir, v - 1, v)
        .localCheckpoint(true)
      val dels = feed.filter(col("_change") === "delete").drop("_change")
      val ins = feed.filter(col("_change") === "insert").drop("_change")
      replica = replica.exceptAll(dels).unionAll(ins)
        .localCheckpoint(true)
    }
    replica
  }

  // ---- Zero-copy branches: git-for-data ------------------------------
  //
  // A branch is its own manifest lineage under `$dir/_branches/<name>`
  // whose v1 references the source's data files by ABSOLUTE path — no
  // byte is copied at create time. Branch commits (append / overwrite /
  // purge / delete — every existing op, pointed at the branch dir)
  // write their files under the branch's own data/ root and never touch
  // main; main's commits never touch the branch. Merge-back is the
  // q349 snapshot-isolation rule at partition grain: partitions the
  // branch changed must be untouched on main since the branch's base,
  // or the merge fails loudly. Retention caveat (documented, as in
  // every ref-based lake): vacuuming MAIN drops files branches still
  // reference — vacuum only after merging or deleting branches.

  private def branchRoot(dir: String, name: String) = {
    require(name.matches("[A-Za-z0-9_\\-]+"), s"unsafe branch name '$name'")
    s"$dir/_branches/$name"
  }

  /** Create branch `name` from the source's latest snapshot (zero data
    * copied); records the source base version for the merge conflict
    * check. Returns that base version.
    */
  def branchCreate(spark: SparkSession, dir: String, name: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val bdir = branchRoot(dir, name)
    require(latestVersion(bdir, conf) == 0, s"branch '$name' already exists")
    val absEntries = readManifest(dir, base, conf)
      .map(e => e.copy(file = filePath(dir, e)))
    commitManifest(bdir, 1, absEntries, conf)
    val f = fs(dir, conf)
    val out = f.create(new Path(bdir, "_branch_base"), true)
    try out.write(base.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    base
  }

  /** The branch's layout dir — every Manifest op works on it. */
  def branchDir(dir: String, name: String): String = branchRoot(dir, name)

  private def branchBase(dir: String, name: String,
      conf: Configuration): Int = {
    val p = new Path(branchRoot(dir, name), "_branch_base")
    val f = fs(dir, conf)
    require(f.exists(p), s"branch '$name' has no base marker")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Merge branch `name` back into main under snapshot isolation:
    * partitions the branch changed must be UNTOUCHED on main since the
    * branch's base (first committer wins — a conflicting merge fails
    * loudly and mutates nothing); disjoint changes land as ONE main
    * commit whose entries reference the branch's files absolutely
    * (still zero-copy). Partitions the branch dropped drop on main.
    * Returns the new main version.
    */
  def branchMergeInto(spark: SparkSession, dir: String,
      name: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val bdir = branchRoot(dir, name)
    val bLatest = latestVersion(bdir, conf)
    require(bLatest >= 1, s"no branch '$name' in $dir")
    val base = branchBase(dir, name, conf)
    val mainLatest = latestVersion(dir, conf)
    val branchChanged = changedPartitions(bdir, 1, bLatest, conf)
    val mainChanged = changedPartitions(dir, base, mainLatest, conf)
    val conflicts = branchChanged.intersect(mainChanged)
    require(conflicts.isEmpty,
      s"branch merge conflict on partitions ${conflicts.toSeq.sorted
        .mkString(", ")}: main changed them after the branch's base " +
        s"v$base - rebase the branch")
    val bEntries = readManifest(bdir, bLatest, conf)
      .filter(e => branchChanged(e.p))
      .map(e => e.copy(file = filePath(bdir, e)))
    commitManifest(dir, mainLatest + 1,
      readManifest(dir, mainLatest, conf)
        .filterNot(e => branchChanged(e.p)) ++ bEntries, conf)
    mainLatest + 1
  }

  // ---- File-level Bloom index: point-lookup skipping -----------------
  //
  // `readRange` skips on min/max stats — useless for a point lookup of
  // a high-cardinality UNCLUSTERED key (every file's range covers it).
  // The Delta answer is a per-file Bloom filter: the manifest carries
  // each file's k-hash bitset (bits/8 bytes/file — the same
  // file-census class the manifest lines already are), and a point
  // read lists only files whose Bloom might contain the key. Zero
  // false negatives by construction (files without a Bloom admit
  // conservatively); q359 proves the skip ratio at runtime.

  private def bloomPositions(column: org.apache.spark.sql.Column,
      bits: Int, k: Int): Seq[org.apache.spark.sql.Column] =
    (0 until k).map(i =>
      pmod(xxhash64(lit(i), column), lit(bits.toLong)).cast("int"))

  /** Index-build maintenance pass: compute a per-file Bloom of `column`
    * and commit a new version whose entries carry it. INCREMENTAL by
    * construction: files that already carry a Bloom (immutable bytes ⇒
    * immutable index) are never re-read — an index refresh after an
    * append costs the appended files, not the table. No-op (no commit)
    * when every file is already indexed. Per-file state ≤ `bits`
    * positions.
    */
  def addBloomIndex(spark: SparkSession, dir: String, column: String,
      bits: Int = 8192, k: Int = 6): Boolean = {
    require(bits > 0 && bits % 8 == 0 && k >= 1,
      s"addBloomIndex: bits must be a positive multiple of 8, k >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val all = readManifest(dir, base, conf)
    val todo = all.filter(_.bloom.isEmpty)
    if (todo.isEmpty) return false
    val segs = split(col("_metadata.file_path"), "/")
    val positions = spark.read.option("mergeSchema", "true")
      .parquet(todo.map(e => filePath(dir, e)): _*)
      .withColumn("__file",
        concat_ws("/", element_at(segs, -2), element_at(segs, -1)))
      .filter(col(column).isNotNull)
      .select(col("__file"),
        explode(array(bloomPositions(col(column), bits, k): _*)).as("__b"))
      .distinct()
      .groupBy("__file").agg(collect_list("__b").as("bs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1))
      .toMap
    val entries = all.map { e =>
      if (e.bloom.isDefined) e
      else e.copy(bloom = positions.get(tailKey(e.file)).map { ps =>
        val bytes = new Array[Byte](bits / 8)
        ps.foreach(p => bytes(p / 8) = (bytes(p / 8) | (1 << (p % 8))).toByte)
        java.util.Base64.getEncoder.encodeToString(bytes)
      })
    }
    commitManifest(dir, base + 1, entries, conf)
    true
  }

  /** Point read through the Bloom index: lists only files whose Bloom
    * might contain `value` (no-Bloom files admit conservatively — a
    * file holding only NULLs, or written before the index build).
    * Returns the admitted files' rows; callers apply the exact
    * predicate. Also returns the (listed, total) file counts for
    * skip-ratio gates.
    */
  def readPoint(spark: SparkSession, dir: String, column: String,
      value: Long, bits: Int = 8192, k: Int = 6): (DataFrame, Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = readManifest(dir, latestVersion(dir, conf), conf)
    // the value's k positions via a 1-row Spark plan, so the hash is
    // BIT-IDENTICAL to the index build's xxhash64 kernel
    val ps = spark.range(1)
      .select(bloomPositions(lit(value), bits, k): _*)
      .collect().head
    val want = (0 until k).map(ps.getInt)
    val hit = entries.filter { e =>
      e.bloom match {
        case None => true
        case Some(b64) =>
          val bytes = java.util.Base64.getDecoder.decode(b64)
          want.forall(p => (bytes(p / 8) & (1 << (p % 8))) != 0)
      }
    }
    val df =
      if (hit.isEmpty)
        readVersion(spark, dir, latestVersion(dir, conf)).limit(0)
      else spark.read.option("mergeSchema", "true")
        .parquet(hit.map(e => filePath(dir, e)): _*)
    (df, hit.length, entries.length)
  }

  // ---- Deletion vectors: MERGE-ON-READ row deletes -------------------
  //
  // `purge`/`dedupRepair` are copy-on-write: a delete rewrites whole
  // partitions. Deletion vectors are the Delta/Iceberg merge-on-read
  // alternative — a delete writes ONLY a (file, row position) list and
  // a new manifest version; data files never move, readers anti-filter
  // by position at scan time (the parquet `_metadata.row_index`
  // column). Deletes accumulate per version (the new DV is old DV ∪
  // new victims), time travel keeps each version's DV, and
  // `applyDeletes` is the deferred copy-on-write compaction that folds
  // the DV into rewritten partitions and drops it.

  private def dvPath(dir: String, version: Int) = s"$dir/_dv/v$version"

  private def dvExists(dir: String, version: Int,
      conf: Configuration): Boolean =
    fs(dir, conf).exists(new Path(dvPath(dir, version)))

  /** The (file, row_index) deletion vector of `version` (empty frame if
    * the version carries none).
    */
  def deletionVector(spark: SparkSession, dir: String,
      version: Int): DataFrame = {
    import spark.implicits._
    if (dvExists(dir, version, spark.sparkContext.hadoopConfiguration))
      spark.read.parquet(dvPath(dir, version))
    else Seq.empty[(String, Long)].toDF("__file", "__pos")
  }

  /** Merge-on-read delete: victims become (file, position) rows in the
    * next version's deletion vector — no data file is touched. Returns
    * the number of newly-deleted rows (0 = no commit).
    */
  def deleteRows(spark: SparkSession, dir: String,
      victim: org.apache.spark.sql.Column): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val live = readWithDeletes(spark, dir, base)
    val newVictims = live.filter(coalesce(victim, lit(false)))
      .select(col("__file"), col("__pos"))
    val merged = deletionVector(spark, dir, base)
      .unionByName(newVictims).distinct()
      .localCheckpoint(true)
    val nNew = newVictims.count()
    if (nNew == 0) return 0L
    merged.coalesce(1).write.mode("overwrite")
      .parquet(dvPath(dir, base + 1))
    // single-writer delete path: if the CAS loses anyway, remove the
    // staged DV so the winner's version can't inherit foreign deletes
    try commitManifest(dir, base + 1, readManifest(dir, base, conf), conf)
    catch { case e: Throwable =>
      fs(dir, conf).delete(new Path(dvPath(dir, base + 1)), true)
      throw e
    }
    nNew
  }

  /** TTL retention sweep — policy-driven expiry as a MERGE-ON-READ
    * delete: rows whose class has outlived its max age (relative to
    * `asOfDate`) land in the next deletion vector; no data file moves
    * until a later `applyDeletes`. The policy is model-sized and
    * compiles to a literal predicate (no join); returns the number of
    * newly-expired rows.
    */
  def ttlSweep(spark: SparkSession, dir: String, classCol: String,
      timeCol: String, policyDays: Map[String, Int],
      asOfDate: String): Long = {
    require(policyDays.nonEmpty, "ttlSweep: empty policy")
    val victim = policyDays.foldLeft(lit(false)) {
      case (acc, (cls, days)) =>
        acc || (col(classCol) === cls &&
          col(timeCol) <
            date_sub(lit(asOfDate).cast("date"), days).cast("timestamp"))
    }
    deleteRows(spark, dir, victim)
  }

  /** Snapshot read MINUS the version's deletion vector. Exposes the
    * bookkeeping columns `__file`/`__pos` (callers drop them); the
    * anti-join is keyed on (file tail, row position) — the DV side is
    * deleted-row-sized, never table-sized.
    */
  def readWithDeletes(spark: SparkSession, dir: String,
      version: Int = -1): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val v = if (version > 0) version else latestVersion(dir, conf)
    val segs = split(col("_metadata.file_path"), "/")
    val t = readVersion(spark, dir, v)
      .withColumn("__file",
        concat_ws("/", element_at(segs, -2), element_at(segs, -1)))
      .withColumn("__pos", col("_metadata.row_index"))
    t.join(deletionVector(spark, dir, v), Seq("__file", "__pos"),
      "left_anti")
  }

  /** COPY-ON-WRITE application of the deletion vector: partitions
    * holding deleted rows rewrite without them in one atomic commit;
    * the new version carries no DV. No-op without a DV.
    */
  def applyDeletes(spark: SparkSession, dir: String,
      partCol: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    if (!dvExists(dir, base, conf)) return false
    val live = readWithDeletes(spark, dir, base)
    val dv = deletionVector(spark, dir, base)
    val affectedFiles = dv.select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    val entries = readManifest(dir, base, conf)
    val affectedParts = entries
      .filter(e => affectedFiles(tailKey(e.file))).map(_.p).toSet
    val survivors = live
      .filter(col(partCol).cast("string")
        .isInCollection(affectedParts))
      .drop("__file", "__pos")
    val newEntries = writeCommitFiles(survivors, dir, partCol, base + 1)
    commitManifest(dir, base + 1,
      entries.filterNot(e => affectedParts(e.p)) ++ newEntries, conf)
    true
  }

  /** CONTENT-DEDUP REPAIR — the OPTIMIZE-style maintenance job that
    * removes duplicate rows from a manifested layout in place: rows
    * sharing a content key keep only the minimum-`idCol` row (the
    * keep-first rule of `Dedup.dedupExact`), and ONLY partitions that
    * actually lose a row are rewritten — in one atomic commit, with
    * partitions the repair empties vanishing from the manifest (the
    * purge discipline). NULL keys never dedup. Idempotent: a second
    * run finds no victims and commits nothing.
    *
    * Scale shape: the duplicate census is keyed by the content key
    * (map-side partials collapse the duplicate mass), the victim join
    * is keyed, and the only driver state is the affected partition
    * list (partition-domain-sized).
    */
  def dedupRepair(spark: SparkSession, dir: String, partCol: String,
      keyCol: org.apache.spark.sql.Column, idCol: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val keyed = readVersion(spark, dir, base).withColumn("__k", keyCol)
    val dupGroups = keyed.filter(col("__k").isNotNull)
      .groupBy("__k")
      .agg(min(col(idCol)).as("__keep"), count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("__k", "__keep")
    val victims = keyed.join(dupGroups, Seq("__k"))
      .filter(col(idCol) =!= col("__keep"))
    val affected = victims.select(col(partCol).cast("string").as("__p"))
      .distinct().collect().map(_.getString(0)).toSet
    if (affected.isEmpty) return false
    val survivors = keyed
      .filter(col(partCol).cast("string").isInCollection(affected))
      .join(dupGroups, Seq("__k"), "left")
      .filter(col("__keep").isNull || col(idCol) === col("__keep"))
      .drop("__k", "__keep")
    val entries = writeCommitFiles(survivors, dir, partCol, base + 1)
    commitManifest(dir, base + 1,
      readManifest(dir, base, conf).filterNot(e => affected(e.p)) ++ entries,
      conf)
    true
  }

  // ---- Catalog: an atomic MULTI-TABLE snapshot vector ----------------
  //
  // A training-data release moves several tables together (documents +
  // embeddings + censuses); per-table manifests alone let a reader see
  // table A at the new release and table B at the old one. The catalog
  // is one pointer file naming a consistent (table -> manifest version)
  // vector, published with the same one-rename CAS — so a catalog
  // reader sees ALL tables old or ALL tables new, and a writer that
  // crashes after some per-table commits but before the catalog rename
  // left only unreferenced (invisible) table versions behind.

  private def catalogPath(dir: String, version: Int) =
    new Path(s"$dir/_catalog", f"v$version%06d.json")

  /** Largest committed catalog version, or 0 if none. */
  def catalogLatest(dir: String, conf: Configuration): Int = {
    val cdir = new Path(s"$dir/_catalog")
    val f = fs(dir, conf)
    if (!f.exists(cdir)) return 0
    f.listStatus(cdir).map(_.getPath.getName)
      .collect { case s if s.matches("v\\d{6}\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  /** The (table -> manifest version) vector of catalog `version`. */
  def catalogVector(dir: String, version: Int,
      conf: Configuration): Map[String, Int] = {
    val p = catalogPath(dir, version)
    val f = fs(dir, conf)
    require(f.exists(p), s"$dir has no catalog v$version")
    val in = f.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    val Line = """\{"t":"([^"]*)","v":(\d+)\}""".r
    lines.drop(1).map { case Line(t, v) => t -> v.toInt }.toMap
  }

  /** Publish `writes` — (table, snapshot df, partition column) — as ONE
    * atomic catalog commit: each table's snapshot lands as a fresh
    * per-table manifest (FULL-replace semantics — a release is a
    * snapshot, not a delta), then the catalog pointer naming all the
    * new versions renames in with the CAS. Tables absent from `writes`
    * carry forward at their previous pinned version. Returns the new
    * catalog version.
    */
  def catalogCommit(dir: String,
      writes: Seq[(String, DataFrame, String)]): Int = {
    require(writes.nonEmpty, "catalogCommit: nothing to publish")
    val conf = writes.head._2.sparkSession.sparkContext.hadoopConfiguration
    val cur = catalogLatest(dir, conf)
    val prev = if (cur >= 1) catalogVector(dir, cur, conf)
               else Map.empty[String, Int]
    val newVec = prev ++ writes.map { case (t, df, partCol) =>
      require(t.matches("[A-Za-z0-9_]+"), s"unsafe table name '$t'")
      val tdir = s"$dir/tables/$t"
      val base = latestVersion(tdir, conf)
      val entries = writeCommitFiles(df, tdir, partCol, base + 1)
      commitManifest(tdir, base + 1, entries, conf)
      t -> (base + 1)
    }
    val f = fs(dir, conf)
    val tmp = new Path(s"$dir/_catalog",
      s".tmp-${ProcessHandle.current().pid()}-v${cur + 1}")
    val out = f.create(tmp, true)
    try {
      out.write(s"""{"version":${cur + 1}}\n"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      newVec.toSeq.sortBy(_._1).foreach { case (t, v) =>
        out.write(s"""{"t":"$t","v":$v}\n"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    } finally out.close()
    val target = catalogPath(dir, cur + 1)
    require(!f.exists(target) && f.rename(tmp, target),
      s"catalog commit v${cur + 1} lost the race - retry")
    cur + 1
  }

  /** Read `table` AT the consistent vector of catalog `version`
    * (default: latest) — the only read path that guarantees
    * cross-table consistency.
    */
  def catalogRead(spark: SparkSession, dir: String, table: String,
      version: Int = -1): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val v = if (version > 0) version else catalogLatest(dir, conf)
    val vec = catalogVector(dir, v, conf)
    require(vec.contains(table),
      s"catalog v$v of $dir has no table '$table' " +
        s"(has: ${vec.keys.toSeq.sorted.mkString(", ")})")
    readVersion(spark, s"$dir/tables/$table", vec(table))
  }

  /** Targeted purge (q177's semantics under the manifest protocol):
    * survivors of affected partitions rewrite into a new commit;
    * partitions a purge empties simply VANISH from the manifest — the
    * dynamic-overwrite silent-retention trap cannot exist here, because
    * nothing a manifest doesn't name is readable.
    */
  def purge(spark: SparkSession, dir: String, partCol: String,
      victim: org.apache.spark.sql.Column, maxAffected: Int = 1 << 16): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(dir, conf)
    require(base >= 1, s"$dir is not a manifested layout")
    val t = readVersion(spark, dir, base)
    val isVictim = coalesce(victim, lit(false))
    val parts = t.groupBy(col(partCol).cast("string").as("__pv"))
      .agg(sum(when(isVictim, 1L).otherwise(0L)).as("n_victim"),
        sum(when(!isVictim, 1L).otherwise(0L)).as("n_keep"))
      .filter(col("n_victim") > 0)
      .limit(maxAffected + 1)
      .collect()
    require(parts.length <= maxAffected,
      s"purge: more than $maxAffected affected partitions - batch the purge")
    if (parts.isEmpty) return
    val affected = parts.map(_.getString(0)).toSet
    val live = parts.filter(_.getLong(2) > 0L).map(_.getString(0)).toSet
    val entries =
      if (live.isEmpty) Seq.empty[Entry]
      else writeCommitFiles(
        t.filter(col(partCol).cast("string").isin(live.toSeq: _*) && !isVictim),
        dir, partCol, base + 1)
    commitManifest(dir, base + 1,
      readManifest(dir, base, conf).filterNot(e => affected(e.p)) ++ entries,
      conf)
  }

  /** Snapshot read of a pinned version — exactly that manifest's files,
    * immutable under any concurrent commit (old-or-new, never a mix).
    */
  def readVersion(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val entries = readManifest(dir, version,
      spark.sparkContext.hadoopConfiguration)
    require(entries.nonEmpty,
      s"manifest v$version of $dir is empty - nothing to read")
    // mergeSchema: a widened append (new column on later commits) must
    // surface the union schema — the default footer-sampling read can
    // silently drop the new column depending on file order
    spark.read.option("mergeSchema", "true")
      .parquet(entries.map(e => filePath(dir, e)): _*)
  }

  /** Latest-snapshot read (pins the version at CALL time; lazy execution
    * later still sees this snapshot, because its files never mutate).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, latestVersion(spark, dir))

  private def latestVersion(spark: SparkSession, dir: String): Int = {
    val v = latestVersion(dir, spark.sparkContext.hadoopConfiguration)
    require(v >= 1, s"$dir is not a manifested layout")
    v
  }

  /** Manifest-pruned point read: only the files of matching partitions
    * are listed at all — |hit partitions| of stored bytes, not a table
    * scan with a post-filter.
    */
  def readPartitions(spark: SparkSession, dir: String,
      values: Seq[String]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val want = values.toSet
    val hit = readManifest(dir, latestVersion(spark, dir), conf)
      .filter(e => want(e.p))
    require(hit.nonEmpty,
      s"readPartitions: no manifest entry for any of $values in $dir")
    spark.read.option("mergeSchema", "true")
      .parquet(hit.map(e => filePath(dir, e)): _*)
  }

  /** DATA-SKIPPING range read over the tracked stats column: only
    * files whose [min,max] intersects [lo,hi] — plus stats-less files,
    * conservatively — are LISTED at all, so a selective range over a
    * range-clustered layout reads a file fraction, not the table. The
    * caller still applies the precise row predicate (file stats admit,
    * they don't filter). Loud if the layout never tracked stats: a
    * silent full scan behind a "skipping" API is the trap this require
    * closes.
    */
  def readRange(spark: SparkSession, dir: String, lo: Long,
      hi: Long): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = readManifest(dir, latestVersion(spark, dir), conf)
    require(entries.exists(_.lo.isDefined),
      s"readRange: $dir tracks no file stats (build it with statsCol) - " +
        "a range read here would be a silent full scan")
    val hit = entries.filter(e => (e.lo, e.hi) match {
      case (Some(l), Some(h)) => l <= hi && h >= lo
      case _ => true // all-null stats: range membership unknown, include
    })
    require(hit.nonEmpty,
      s"readRange: no file intersects [$lo,$hi] in $dir")
    spark.read.option("mergeSchema", "true")
      .parquet(hit.map(e => filePath(dir, e)): _*)
  }

  /** Small-file COMPACTION as one atomic commit: each partition's rows
    * rewrite into `filesPerPartition` files (range-clustered on the
    * stats column when tracked, so skipping stats stay tight), and the
    * whole rewrite publishes in a single manifest rename — readers see
    * the fragmented layout or the compacted one, never half of each,
    * and the content is BIT-EQUAL by construction (same rows, new file
    * boundaries). The streaming-ingest accretion path (q319: one file
    * per partition per micro-batch) is exactly what this repairs; until
    * `vacuum`, the pre-compaction snapshot stays readable.
    */
  def compact(spark: SparkSession, dir: String, partCol: String,
      filesPerPartition: Int = 1, statsCol: String = null): Unit = {
    require(filesPerPartition >= 1,
      s"compact: filesPerPartition must be >= 1, got $filesPerPartition")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = latestVersion(spark, dir)
    val t = readVersion(spark, dir, base)
    // partition-domain census (the same bound every lifecycle op rides)
    val nParts = t.select(col(partCol)).distinct().count().toInt
    val clustered =
      if (filesPerPartition == 1) {
        // hash by the partition column: a partition's rows land WHOLE
        // in one task — exactly one file each (a range split could put
        // a task boundary inside a partition); sorting within the task
        // keeps parquet row-group stats tight even though the one
        // file's manifest range is necessarily the partition's full one
        val r = t.repartition(nParts, col(partCol))
        if (statsCol != null)
          r.sortWithinPartitions(col(partCol), col(statsCol))
        else r
      } else if (statsCol != null)
        t.repartitionByRange(nParts * filesPerPartition, col(partCol),
          col(statsCol))
      else t.repartition(nParts * filesPerPartition, col(partCol))
    val entries = writeCommitFiles(clustered, dir, partCol, base + 1,
      statsCol)
    commitManifest(dir, base + 1, entries, conf)
  }

  /** Retention pass: delete every data file the LATEST manifest doesn't
    * reference (crashed-writer orphans, superseded commit files) and
    * every superseded manifest. The latest snapshot is untouched;
    * time-travel reads older than latest die here by design — vacuum IS
    * the retention boundary.
    */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val latest = latestVersion(spark, dir)
    val keep = readManifest(dir, latest, conf).map(_.file).toSet
    val f = fs(dir, conf)
    val dataRoot = new Path(s"$dir/data")
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      val doomed = Iterator.continually(it)
        .takeWhile(_.hasNext).map(_.next())
        .filter(s => s.isFile)
        .map(_.getPath)
        .filterNot { p =>
          val rel = p.toString.stripPrefix(
            f.makeQualified(new Path(dir)).toString).stripPrefix("/")
          keep(rel) || !rel.endsWith(".parquet")
        }.toVector
      doomed.foreach(p => f.delete(p, false))
      // drop commit dirs emptied of data files (routing dirs + markers)
      f.listStatus(dataRoot).filter(_.isDirectory).foreach { c =>
        val files = f.listFiles(c.getPath, true)
        val hasData = Iterator.continually(files)
          .takeWhile(_.hasNext).map(_.next())
          .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        if (!hasData) f.delete(c.getPath, true)
      }
    }
    (1 until latest).foreach { v =>
      val p = manifestPath(dir, v)
      if (f.exists(p)) f.delete(p, false)
    }
  }
}
