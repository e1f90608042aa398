package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.UpsertMerge

/** Sink layer (SURVEY §2.1 S5-S9), re-expressed for a lakehouse:
  *
  *  - S5 delete-section-then-insert (`base.py:90-146` save_sub) and
  *    S8 delete+insert by key (`productivity.py:406-451`) both become
  *    dynamic partition overwrite: rewrite exactly the partitions the
  *    incoming batch touches, leave the rest untouched.
  *  - S7 MERGE upsert (`weather.py:1697-1732`) becomes read-merge-
  *    replace with precedence dedup (UpsertMerge); on a Delta/Iceberg
  *    target this maps to a literal MERGE INTO.
  *  - S6 per-section UPDATE of summary columns (`base.py:148-178`)
  *    disappears: sections join into ONE summary row per farm before a
  *    single write (see SURVEY §2.1 S6 note).
  *  - S9 run-log append (`farm_processor.py:245-344`).
  */
object Sinks {

  /** Overwrite only the partitions present in `df` (S5/S8). */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Keyed upsert into a parquet table (S7): read-if-exists, merge
    * with incoming-wins precedence, write to a staging dir, swap.
    *
    * The swap approximates the reference's completeness gate
    * (weather.py:1460-1478): the new data is fully materialized in
    * `__staging` before the target is touched. It is NOT crash-proof:
    * a failure between rename(target, __old) and rename(__staging,
    * target) leaves the target missing with the old data in `__old` —
    * `recoverOrphan` (called on entry) heals that window on the next
    * run by restoring `__old`. On object stores rename is a non-atomic
    * copy; use a transactional table format (Delta/Iceberg MERGE INTO)
    * there instead of this filesystem swap. */
  def upsertParquet(spark: SparkSession, incoming: DataFrame, path: String,
                    keys: Seq[String]): Unit =
    mergeParquet(spark, incoming, path, keys, UpsertMerge.upsert)

  /** [[upsertParquet]] generalized over the merge rule: `rule` is
    * (old, incoming, keys) => merged — UpsertMerge.upsert (matched
    * rows update) or UpsertMerge.insertIfAbsent (insert-only, the
    * mid-range weather variant). Same staging-swap + crash recovery
    * either way; the MergeSink facade picks the rule that matches
    * its emitted MERGE statement. */
  def mergeParquet(spark: SparkSession, incoming: DataFrame, path: String,
                   keys: Seq[String],
                   rule: (DataFrame, DataFrame, Seq[String]) => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    recoverOrphan(spark, path)
    val merged =
      if (fs.exists(target)) rule(spark.read.parquet(path), incoming, keys)
      else incoming
    val staging = new Path(path + "__staging")
    fs.delete(staging, true)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val backup = new Path(path + "__old")
    fs.delete(backup, true)
    if (fs.exists(target)) fs.rename(target, backup)
    fs.rename(staging, target)
    fs.delete(backup, true)
  }

  /** Crash recovery for `upsertParquet`'s swap window: if a previous
    * run died after moving the live table to `__old` but before
    * promoting `__staging`, restore `__old`; stale `__staging` dirs
    * are discarded (their batch never committed). */
  def recoverOrphan(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val backup = new Path(path + "__old")
    if (!fs.exists(target) && fs.exists(backup)) fs.rename(backup, target)
  }

  /** Marker file for [[migrateToBatchLayout]]'s delete leg: its
    * presence means the batch_id=-1 partition was written from the
    * FULL root-file set and only root deletion remains. */
  private[graft] val MigratedMarker = "_graft_migrated"

  /** Manifest of the root file names a [[migrateToBatchLayout]] run
    * is migrating, written BEFORE the partition write. Two jobs:
    * (a) its presence tells a replay that any batch_id=-1 content is
    * a crashed DERIVED copy of the still-present roots (rewrite
    * wholesale), not previously-migrated data that must be preserved;
    * (b) the delete leg removes only LISTED files, so a root file
    * appended by an old-binary writer inside the crash window is
    * never deleted unmigrated (it migrates on the next call). */
  private[graft] val MigratingManifest = "_graft_migrating"

  /** Backup dir holding a PRE-EXISTING batch_id=-1 partition's files
    * while [[migrateToBatchLayout]] folds reappeared root files into
    * it: the previously-migrated rows stay durable on disk until the
    * union write has committed and the delete leg removes the backup.
    * Underscore-prefixed, so partition discovery ignores it. */
  private[graft] val PremigrateBackup = "_graft_premigrate_backup"

  /** Lock file serializing [[migrateToBatchLayout]] invocations on
    * one dir. */
  private[graft] val MigrateLock = "_graft_migrate_lock"

  /** One-time layout migration for the streaming stores that moved
    * from plain `mode("append")` to batch_id-partitioned dynamic
    * overwrite (nearDupStream / clusterMaintStream): a directory
    * written by the old layout has parquet leaves at the ROOT, and
    * mixing those with `batch_id=N/` partition dirs makes parquet
    * partition discovery throw "Conflicting directory structures".
    * Root-level files are rewritten into the reserved `batch_id=-1`
    * partition and only THEN removed — the root files stay the
    * durable copy until the partition write has committed (write
    * first, delete last; the reverse order had a window where the
    * only copy lived in non-replicated localCheckpoint blocks).
    *
    * Crash protocol, every window replay-safe:
    *  - crash before/during the partition write: roots intact, the
    *    [[MigratingManifest]] present, no marker — the replay
    *    re-reads the FULL root set (plus the [[PremigrateBackup]] if
    *    one was taken) and dynamic overwrite replaces the (possibly
    *    partial) partition wholesale;
    *  - crash after the write but before the [[MigratedMarker]] is
    *    created: same as above (the rewrite is idempotent);
    *  - crash mid-delete: the marker says the partition already holds
    *    the full root set, so the replay must NOT rewrite from the
    *    now-partial roots (that would shrink the partition to the
    *    surviving files) — it finishes deleting the manifest-LISTED
    *    files, drops backup, marker and manifest, and then falls
    *    through: any UNLISTED root that appeared inside the crash
    *    window migrates in the same call (via the reappeared-roots
    *    union below), so the dir is never handed back mixed.
    *
    * Reappeared roots: if batch_id=-1 already holds data and no
    * manifest is present, a PRIOR migration completed and new root
    * files appeared afterwards (an old-binary writer during a mixed
    * deployment). Rewriting the partition from those roots alone
    * would silently drop every previously-migrated row — instead the
    * existing partition files are first RENAMED into
    * [[PremigrateBackup]] (so they stay the durable copy, outside
    * partition discovery) and the rewrite unions backup + roots.
    * Cross-version caveat: a partition left PARTIAL by a crash of the
    * pre-manifest binary is indistinguishable from completed data and
    * will be unioned too (possible duplicates) — run the same binary
    * version for migration replays.
    *
    * No-op on empty, absent, or already-partitioned dirs. CONCURRENT
    * invocation on one dir is rejected mechanically: a [[MigrateLock]]
    * file is created on entry and any second caller that finds a lock
    * younger than `staleLockMs` throws; an older lock is treated as
    * the residue of a crashed run (this function is replay-safe by
    * construction), broken, and re-acquired. Concurrent READERS of
    * the same dir mid-migration remain unsafe (mixed root+partition
    * layouts confuse partition discovery); callers run it at stream
    * (re)start before any read, as the foreachBatch sinks do. */
  def migrateToBatchLayout(spark: SparkSession, path: String,
                           staleLockMs: Long = 10 * 60 * 1000L): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val marker = new Path(p, MigratedMarker)
    val manifest = new Path(p, MigratingManifest)
    val backup = new Path(p, PremigrateBackup)
    def rootFiles() = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // fast path: a fully-migrated (or never-old-layout) dir takes no
    // lock — this is every steady-state micro-batch
    if (rootFiles().isEmpty && !fs.exists(marker) && !fs.exists(manifest) &&
        !fs.exists(backup)) return
    withMigrateLock(fs, p, staleLockMs) {
      migrateLocked(spark, fs, p, marker, manifest, backup, () => rootFiles())
    }
  }

  private def migrateLocked(spark: SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path,
                            marker: org.apache.hadoop.fs.Path,
                            manifest: org.apache.hadoop.fs.Path,
                            backup: org.apache.hadoop.fs.Path,
                            rootFiles: () => Array[org.apache.hadoop.fs.FileStatus]): Unit = {
    import org.apache.hadoop.fs.Path
    // fs.rename reports failure by RETURNING false (HDFS semantics) —
    // a silent false here would strand a file outside the union read
    // and the subsequent delete legs would drop its rows with no
    // error, so every protocol move checks and aborts the migration
    def renameOrThrow(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"migrateToBatchLayout: rename $src -> $dst failed; aborting " +
            "so the source file stays the durable copy")
    def readManifest(): Option[Set[String]] =
      if (!fs.exists(manifest)) None
      else {
        val in = fs.open(manifest)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toSet)
        finally in.close()
      }
    if (fs.exists(marker)) { // delete leg of a crashed prior run
      // only manifest-LISTED files: a root appended by an old-binary
      // writer inside the crash window was never migrated and must
      // survive this delete (no manifest = pre-manifest binary wrote
      // the marker; fall back to deleting all current roots, the old
      // contract). Do NOT return: any surviving unlisted root would
      // leave a mixed root+partition layout that the caller's very
      // next partitioned read trips over — fall through and migrate
      // the survivors in this same call.
      val listed = readManifest()
      rootFiles()
        .filter(s => listed.forall(_.contains(s.getPath.getName)))
        .foreach(s => fs.delete(s.getPath, false))
      fs.delete(backup, true)
      fs.delete(marker, false)
      fs.delete(manifest, false)
    }
    val roots = rootFiles()
    if (roots.isEmpty) {
      // stale manifest without marker: the crashed run never reached
      // its delete leg, so nothing was removed — with no roots left
      // there is nothing to migrate. A backup without roots cannot
      // arise from this protocol (roots outlive the backup until the
      // marker exists); restore it defensively rather than lose data.
      if (fs.exists(backup)) {
        val part = new Path(p, "batch_id=-1")
        fs.mkdirs(part)
        fs.listStatus(backup).foreach(s =>
          renameOrThrow(s.getPath, new Path(part, s.getPath.getName)))
        fs.delete(backup, true)
      }
      fs.delete(manifest, false)
      return
    }
    val part = new Path(p, "batch_id=-1")
    def partHasData = fs.exists(part) &&
      fs.listStatus(part).exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // reappeared-roots detection (see scaladoc): data in the partition
    // with NO manifest means a prior migration committed — preserve it
    // via the backup rename before the rewrite
    if (!fs.exists(manifest) && !fs.exists(backup) && partHasData) {
      fs.mkdirs(backup)
      fs.listStatus(part).filter(_.isFile).foreach(s =>
        renameOrThrow(s.getPath, new Path(backup, s.getPath.getName)))
    }
    // manifest BEFORE the partition write: the replay's evidence that
    // partition content is a derived copy, and the delete leg's list
    val out = fs.create(manifest, true)
    try out.write(roots.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // materialized read (localCheckpoint) only to decouple the write
    // from a concurrent scan of the same dir — durability does NOT
    // depend on it: root files and backup survive until after the write
    val rootsDf = spark.read
      .parquet(roots.map(_.getPath.toString).toIndexedSeq: _*)
    val old = (if (fs.exists(backup) &&
        fs.listStatus(backup).exists(_.getPath.getName.endsWith(".parquet")))
      rootsDf.unionByName(
        spark.read.schema(rootsDf.schema).parquet(backup.toString))
    else rootsDf).localCheckpoint()
    old.withColumn("batch_id", org.apache.spark.sql.functions.lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(p.toString)
    graft.ops.Materialize.release(old)
    fs.create(marker, true).close()
    roots.foreach(s => fs.delete(s.getPath, false))
    fs.delete(backup, true)
    fs.delete(marker, false)
    fs.delete(manifest, false)
  }

  /** Acquire [[MigrateLock]] under `dir`, run `body`, release. A lock
    * younger than `staleMs` means another invocation is live — throw
    * (the mechanical concurrency guard); an older one is a crashed
    * run's residue (migration itself is replay-safe) — break it.
    *
    * Two documented limits of a lock FILE without liveness checks:
    * (a) a crash mid-migration leaves a fresh lock, so a supervisor
    * restarting the stream inside `staleMs` is rejected until the
    * lock ages out — a caller that can PROVE exclusivity at restart
    * (single supervised stream per store, the foreachBatch posture)
    * may pass a small `staleLockMs` to shrink that window, trading
    * against the concurrent-invocation guard; (b) create(overwrite =
    * false) is exists-then-create on RawLocalFileSystem, so on a
    * plain local disk two truly simultaneous first calls can both
    * acquire — HDFS/object stores with atomic create get the real
    * mutual exclusion. The migration body itself stays replay-safe
    * either way; the lock narrows the damage to availability. */
  private def withMigrateLock[A](fs: org.apache.hadoop.fs.FileSystem,
                                 dir: org.apache.hadoop.fs.Path,
                                 staleMs: Long)(body: => A): A = {
    val lock = new org.apache.hadoop.fs.Path(dir, MigrateLock)
    def tryAcquire(): Boolean =
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val age =
        try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age < staleMs)
        throw new IllegalStateException(
          s"migrateToBatchLayout already running on $dir (lock ${age}ms old); " +
            "concurrent migration of one store is not allowed")
      fs.delete(lock, false)
      if (!tryAcquire())
        throw new IllegalStateException(
          s"migrateToBatchLayout lost the lock race on $dir after breaking a stale lock")
    }
    try body finally fs.delete(lock, false)
  }

  /** Bucketed + sorted managed table: co-locates future joins on
    * `bucketCols` (no exchange under the SortMergeJoin, bucket-aware
    * scan pruning — asserted live in PlanQualitySpec). Both sides of
    * a recurring fact-fact join written with the same bucket spec
    * join shuffle-free forever after; THE physical-layout lever for a
    * 100 TB fact table that is joined on the same key every day. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int = 8): Unit =
    df.write.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Range-partitioned, within-file-sorted parquet layout: rows are
    * range-partitioned then sorted on `sortCols` before write, so
    * every output file covers a narrow key range and parquet's
    * row-group min/max stats actually PRUNE on those columns. At
    * 100 TB this layout (or its Z-order cousin) is the difference
    * between a selective date/farm query touching one file or all of
    * them — the write-side half of predicate pushdown. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ordered parquet layout over TWO columns: each column is
    * min-max quantized to 16 bits, the bits interleaved into a
    * 32-bit z-value, and files are range-partitioned + sorted on it.
    * Every output file then covers a small RECTANGLE in (c1, c2)
    * space, so row-group stats prune selective predicates on EITHER
    * column — the multi-dimensional generalization of `writeSorted`
    * (which helps only its leading column). The quantization bounds
    * come from one aggregate pass; at 100 TB those are table
    * statistics. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    nFiles: Int): Unit = {
    // quantize to the 16-bit grid, then delegate the interleave +
    // layout to ops.ZOrder (one implementation of the bit math —
    // writeZOrdered predates it and used to hand-roll the same fold)
    val b = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    val (mn1, mx1, mn2, mx2) = (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    def quant(c: String, mn: Double, mx: Double) =
      if (mx == mn) lit(0L)
      else ((col(c).cast("double") - mn) / (mx - mn) * 65535.0).cast("long")
    graft.ops.ZOrder.layoutByZ(df,
        Seq(quant(c1, mn1, mx1), quant(c2, mn2, mx2)), bits = 16,
        numParts = nFiles)
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet table's small files to ~`targetMb` outputs
    * (the operational fix for the small-files problem every
    * long-running ingest — hourly weather, streaming upsert — creates
    * at scale: a 100 TB table of 1 MB files is unreadable). Sizes from
    * the file system, rewrite via the same staging+swap discipline as
    * upsertParquet; `recoverOrphan` heals an interrupted swap. */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Unit = {
    import org.apache.hadoop.fs.Path
    recoverOrphan(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, (totalBytes / (targetMb * 1024L * 1024L)).toInt +
      (if (totalBytes % (targetMb * 1024L * 1024L) > 0) 1 else 0))
    val staging = new Path(path + "__staging")
    val backup = new Path(path + "__old")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(backup, true)
    fs.rename(new Path(path), backup)
    fs.rename(staging, new Path(path))
    fs.delete(backup, true)
  }

  /** Append run-log rows (S9): job name, status, elapsed ms, ts. */
  def appendJobLog(spark: SparkSession, path: String, job: String,
                   status: String, elapsedMs: Long): Unit = {
    import spark.implicits._
    Seq((job, status, elapsedMs, java.time.Instant.now().toString))
      .toDF("job_name", "status", "elapsed_ms", "logged_at")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Per-section run-log row in the TS_INS_JOB_LOG shape
    * (farm_processor.py:245-344): SUCCESS rows carry the elapsed
    * time, ERROR rows additionally the failing section's message —
    * truncated to 4000 chars exactly like the reference's
    * `error_msg[:4000]` bind. */
  def appendSectionLog(spark: SparkSession, path: String, masterSeq: Int,
                       farmNo: Int, procName: String, year: Int, weekNo: Int,
                       status: String, elapsedMs: Long,
                       errorMsg: Option[String] = None): Unit = {
    import spark.implicits._
    Seq((masterSeq, farmNo, "SPARK_ETL", procName, "WEEK", year, weekNo,
        status, elapsedMs, errorMsg.map(_.take(4000)).orNull,
        java.time.Instant.now().toString))
      .toDF("master_seq", "farm_no", "job_nm", "proc_nm", "day_gb",
        "report_year", "report_week_no", "status_cd", "elapsed_ms",
        "error_msg", "logged_at")
      .write.mode(SaveMode.Append).parquet(path)
  }
}
