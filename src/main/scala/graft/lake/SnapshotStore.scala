package graft.lake

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, when}

/** Versioned table snapshots with an atomic pointer commit — the
  * table-format (Delta/Iceberg) commit protocol in miniature, expressed
  * directly on the engine since no connector jars ship in this offline
  * rig (README "Cluster deployment").
  *
  * Layout:
  * {{{
  *   <root>/v=<n>/part-*.parquet   immutable snapshot data
  *   <root>/_LATEST                one line: the current version number
  * }}}
  *
  * Commit = write the new snapshot dir (invisible to readers — nothing
  * references it yet), then atomically replace `_LATEST` via
  * write-temp + rename. Readers resolve the pointer first, so they see
  * the previous snapshot until the rename lands, and any crash mid-commit
  * leaves the table on the old version with only an orphan directory to
  * garbage-collect — the reference's non-atomic two-append gap
  * (IngestionService.java:62-71) closed by design, not by repair.
  *
  * Old versions stay readable ([[read(version)]] = time travel) until
  * [[vacuum]] drops them. On file:// and HDFS the rename is atomic; on
  * object stores the pointer swap is the one operation to map onto a
  * conditional PUT (same contract Delta's LogStore implements per
  * backend). */
class SnapshotStore(spark: SparkSession, val root: String) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(rootPath, "_LATEST")
  private def versionDir(v: Long) = new Path(rootPath, s"v=$v")
  // merge-on-read markers: underscore names are invisible to the parquet
  // reader, so a marked dir still scans as a plain parquet directory
  private val DeleteBaseMarker = "_DELETE_BASE"
  private val AppendBaseMarker = "_APPEND_BASE"
  // zero-copy fork marker: "<parentRoot>\n<parentVersion>"
  private val ForkBaseMarker = "_FORK_BASE"

  private def readSmall(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).mkString.trim
    finally in.close()
  }

  private def writeSmall(p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Current committed version, or None for an empty store. */
  def latestVersion: Option[Long] = {
    val f = fs
    if (!f.exists(pointer)) None
    else {
      val s = readSmall(pointer)
      if (s.isEmpty) None else Some(s.toLong)
    }
  }

  /** Write `df` as the next snapshot and atomically publish it.
    * Returns the committed version. The expected base version is read
    * at entry, so a writer that interleaves between entry and publish
    * is DETECTED ([[ConcurrentCommitException]]) instead of silently
    * overwritten — see [[commit(df:DataFrame,expectedBase:Option[Long])]]. */
  def commit(df: DataFrame): Long = commit(df, latestVersion)

  /** Optimistic-concurrency commit: publish `df` as version
    * `expectedBase + 1` only if the table is still at `expectedBase`.
    *
    * Data stages into a UNIQUE temp dir (concurrent committers never
    * touch each other's files), then the pointer is re-read immediately
    * before the staging dir renames into its version slot: any
    * committer that landed in between fails with a clean
    * [[ConcurrentCommitException]] (caller recovery = the standard OCC
    * loop: re-read, re-derive, retry) and its staging dir is removed. A
    * pre-existing dir at the target version AFTER the check passed is a
    * crashed commit's unpublished orphan (the pointer invariant says
    * nothing references it) and is recovered by deletion.
    *
    * This is check-then-rename, not a true CAS — interleavings inside
    * the final microseconds can still race; closing that window needs
    * the backend's conditional primitive (conditional PUT on object
    * stores, create-exclusive lock on HDFS — exactly the per-backend
    * LogStore contract table formats implement). The check converts the
    * silent-overwrite failure mode into a visible error for every
    * interleaving wider than that window. */
  def commit(df: DataFrame, expectedBase: Option[Long]): Long =
    publish(expectedBase) { staging =>
      df.write.mode("overwrite").parquet(staging.toString)
    }

  /** The shared OCC publish protocol behind every commit flavor: fill a
    * unique staging dir, re-check the pointer, rename into the version
    * slot, swap the pointer atomically. `fill` receives the staging path
    * and writes whatever the version's directory should hold (full
    * snapshot data, or a merge-on-read marker + sidecar rows). */
  private def publish(expectedBase: Option[Long])(
      fill: Path => Unit): Long = {
    val v = expectedBase.map(_ + 1).getOrElse(0L)
    val staging = new Path(rootPath,
      s"_staging-v$v-${java.util.UUID.randomUUID()}")
    fill(staging)
    val f = fs
    val current = latestVersion
    if (current != expectedBase) {
      f.delete(staging, true) // only ever our own staging files
      throw new ConcurrentCommitException(
        s"commit expected base $expectedBase but found $current at $root")
    }
    if (f.exists(versionDir(v))) f.delete(versionDir(v), true) // orphan
    f.rename(staging, versionDir(v))
    val tmp = new Path(rootPath, s"_LATEST.tmp-$v")
    writeSmall(tmp, v.toString)
    // FileContext.rename(OVERWRITE): the atomic publish (FileSystem's
    // overwriting rename is not part of its public contract)
    FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, pointer, Options.Rename.OVERWRITE)
    v
  }

  /** Merge-on-read DELETE (delete vectors in miniature): publish a new
    * version whose directory holds ONLY the deleted keys plus a
    * `_DELETE_BASE` marker naming the version it subtracts from — the
    * base data is never rewritten. [[read(version)]] resolves the marker
    * with one anti-join, so a delete of k rows from a 100 TB table
    * writes O(k), not O(table); the rewrite is deferred to
    * [[materialize]] (Delta's deletion vectors / Iceberg's positional
    * deletes, expressed at key granularity). `deleteKeys`' columns ARE
    * the key columns — every base row matching on all of them is gone. */
  def deleteByKeys(deleteKeys: DataFrame): Long = {
    val base = latestVersion.getOrElse(throw new IllegalStateException(
      s"cannot delete from never-committed store $root"))
    publish(Some(base)) { staging =>
      deleteKeys.write.mode("overwrite").parquet(staging.toString)
      writeSmall(new Path(staging, DeleteBaseMarker), base.toString)
    }
  }

  /** Merge-on-read APPEND: publish the new rows plus an `_APPEND_BASE`
    * marker; [[read(version)]] unions them onto the base. The streaming
    * append path runs on this — each micro-batch commit costs O(batch),
    * not O(table) (the copy-on-write alternative rewrites the table
    * every batch). Long marker chains re-pay one union per version at
    * read time; [[materialize]] compacts the chain. */
  def appendRows(rows: DataFrame): Long = {
    val base = latestVersion.getOrElse(throw new IllegalStateException(
      s"cannot append to never-committed store $root; use commit"))
    publish(Some(base)) { staging =>
      rows.write.mode("overwrite").parquet(staging.toString)
      writeSmall(new Path(staging, AppendBaseMarker), base.toString)
    }
  }

  /** Compact the merge-on-read marker chain: rewrite the CURRENT logical
    * contents as one self-contained snapshot version (the OPTIMIZE /
    * rewrite_data_files maintenance op for delete/append chains). */
  def materialize(): Long = commit(read())

  /** Read the current snapshot (empty-schema error if never committed). */
  def read(): DataFrame = read(latestVersion.getOrElse(
    throw new IllegalStateException(s"no committed snapshot under $root")))

  /** Time travel: read an exact historical version. A plain version dir
    * scans directly; a merge-on-read version resolves its marker — one
    * anti-join (delete) or union (append) onto its base, recursively
    * down the chain to the last materialized snapshot. */
  def read(version: Long): DataFrame = {
    val dir = versionDir(version)
    val f = fs
    val delMarker = new Path(dir, DeleteBaseMarker)
    val appMarker = new Path(dir, AppendBaseMarker)
    val forkMarker = new Path(dir, ForkBaseMarker)
    if (f.exists(delMarker)) {
      val dels = spark.read.parquet(dir.toString)
      read(readSmall(delMarker).toLong)
        .join(dels, dels.columns.toSeq, "left_anti")
    } else if (f.exists(appMarker)) {
      read(readSmall(appMarker).toLong)
        .unionByName(spark.read.parquet(dir.toString))
    } else if (f.exists(forkMarker)) {
      val Array(parentRoot, pv) = readSmall(forkMarker).split('\n')
      new SnapshotStore(spark, parentRoot).read(pv.toLong)
    } else spark.read.parquet(dir.toString)
  }

  /** ZERO-COPY BRANCH (Iceberg branches / Nessie refs in miniature):
    * create a child store at `<root>/branch=<name>` whose v0 is a fork
    * MARKER referencing this store's `from` version — no data file is
    * copied or rewritten; the branch reads through to the parent's
    * immutable snapshot exactly as a merge-on-read marker reads through
    * to its base. Branch commits (full, or O(delta) merge-on-read
    * delete/append — both compose on top of the fork) land in the child
    * store under its own version chain and pointer; the parent's chain,
    * pointer, and data are never touched, so main and branch evolve in
    * isolation and a branch experiment is abandoned by deleting one
    * directory. Publishing a branch back IS a normal parent commit of
    * [[read]] output (a merge commit) — OCC-checked like any other.
    *
    * Retention contract (the same one Iceberg documents): the parent's
    * [[vacuum]] walks ITS version chain only — it does not discover
    * child branches, so a fork into a version older than the parent's
    * retention window dangles after a parent vacuum. Branch before you
    * vacuum, or keep branches on recent versions. */
  def branch(name: String, from: Long): SnapshotStore = {
    require(fs.exists(versionDir(from)),
      s"cannot branch: no version $from under $root")
    require(!name.contains('/') && !name.contains('='),
      s"invalid branch name: $name")
    val child = new SnapshotStore(spark,
      new Path(rootPath, s"branch=$name").toString)
    require(child.latestVersion.isEmpty,
      s"branch $name already exists under $root")
    child.publish(None) { staging =>
      child.writeSmall(new Path(staging, ForkBaseMarker), s"$root\n$from")
    }
    child
  }

  /** Open an existing branch created by [[branch]]. */
  def branchStore(name: String): SnapshotStore =
    new SnapshotStore(spark,
      new Path(rootPath, s"branch=$name").toString)

  /** The merge-on-read base a version builds on, if it has one. */
  private def morBase(v: Long): Option[Long] = {
    val f = fs
    Seq(DeleteBaseMarker, AppendBaseMarker)
      .map(m => new Path(versionDir(v), m)).find(f.exists)
      .map(p => readSmall(p).toLong)
  }

  /** Fold a compacted change feed into the table as one new version:
    * read-latest → [[Merge.applyChanges]] → commit. `evolveSchema`
    * opts into additive schema evolution (see [[Merge.applyChanges]]);
    * old versions keep their own narrower schema — time travel reads
    * each version exactly as committed. */
  def applyChanges(changes: DataFrame, keys: Seq[String],
      op: String = "op", evolveSchema: Boolean = false): Long =
    commit(Merge.applyChanges(read(), changes, keys, op, evolveSchema))

  /** Version diff — the CDC-read face of the store (Delta's
    * `table_changes` / Iceberg's incremental read): key-level changes
    * between two committed versions, classified as insert / update /
    * delete. Downstream consumers re-derive the change feed FROM the
    * published versions, without the writer having to retain it.
    *
    * Plan shape: one full-outer join on the key between the two version
    * scans; non-key columns ride in a single struct per side so the
    * changed-payload test is one null-safe struct comparison
    * (codegen'd), not per-column plumbing. Unchanged keys — the vast
    * majority between adjacent versions of a big table — are dropped
    * before anything else happens to them. At 100 TB both sides are the
    * SAME table family: identically partitioned writes make this a
    * co-located join. */
  def diff(v0: Long, v1: Long, keys: Seq[String]): DataFrame = {
    val a = read(v0)
    val valCols = a.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        struct(valCols.map(col): _*).as(as): _*)
    packed(a, "_old").join(packed(read(v1), "_new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_old").isNull, "insert")
          .when(col("_new").isNull, "delete")
          .when(!(col("_old") <=> col("_new")), "update"))
      .filter(col("change_type").isNotNull)
  }

  /** Drop staging dirs orphaned by crashed or conflicted commits that
    * died before their own cleanup. Always safe: staging dirs are never
    * referenced by the pointer (an in-flight committer that loses its
    * staging dir fails its rename and surfaces an error — it would have
    * lost the conflict check anyway under the single-writer-at-a-time
    * contract maintenance runs under). Returns the dropped names. */
  def vacuumStaging(): Seq[String] = {
    val f = fs
    if (!f.exists(rootPath)) return Seq.empty
    val stale = f.listStatus(rootPath)
      .filter(_.getPath.getName.startsWith("_staging-"))
    stale.foreach(s => f.delete(s.getPath, true))
    stale.map(_.getPath.getName).toSeq
  }

  /** VACUUM DRY RUN — the retention PLAN [[vacuum]] would execute,
    * published as a DataFrame instead of performed: one row per
    * committed version with its kind (full / mor_delete / mor_append /
    * fork), its merge-on-read base (−1 if self-contained), and the
    * retention verdict — `kept_recent` (inside the keepLast window),
    * `mor_base` (outside the window but still reachable through a kept
    * version's marker chain: live data, not history), or `expired`
    * (safe to drop). Production lake maintenance ALWAYS plans before it
    * deletes (Delta's `VACUUM ... DRY RUN`, Iceberg's
    * expire_snapshots dry-run) — irreversible deletion wants a
    * reviewable artifact, and the reachability rule is exactly the one
    * [[vacuum]] applies, factored so the plan and the execution cannot
    * disagree.
    *
    * Metadata-scale by construction (the l08 compaction-plan
    * discipline): the walk touches version markers only — never data
    * files — and the output is |versions| rows. */
  def vacuumPlan(keepLast: Int = 1): DataFrame = {
    import spark.implicits._
    val latest = latestVersion.getOrElse(throw new IllegalStateException(
      s"no committed snapshot under $root"))
    val (recent, live) = retentionLiveness(latest, keepLast)
    val f = fs
    // versions whose dir is already gone (a previous vacuum) have
    // nothing to retain or drop — no row, so the expired set below is
    // EXACTLY the set vacuum would delete even on a re-planned store
    val rows = (0L to latest)
      .filter(v => f.exists(versionDir(v)))
      .map { v =>
        val kind =
          if (f.exists(new Path(versionDir(v), DeleteBaseMarker)))
            "mor_delete"
          else if (f.exists(new Path(versionDir(v), AppendBaseMarker)))
            "mor_append"
          else if (f.exists(new Path(versionDir(v), ForkBaseMarker)))
            "fork"
          else "full"
        val reason =
          if (recent.contains(v)) "kept_recent"
          else if (live.contains(v)) "mor_base"
          else "expired"
        (v, kind, morBase(v).getOrElse(-1L), reason != "expired", reason)
      }
    rows.toDF("version", "kind", "base_version", "retained", "reason")
  }

  /** The ONE retention-reachability computation both [[vacuumPlan]] and
    * [[vacuum]] consume — (recent keepLast window, live set = recent ∪
    * every version a recent one still builds on through its
    * merge-on-read marker chain). Factored so the reviewable plan and
    * the irreversible execution cannot disagree. */
  private def retentionLiveness(latest: Long,
      keepLast: Int): (Set[Long], Set[Long]) = {
    val recent = (math.max(0L, latest - keepLast + 1) to latest).toSet
    val live = scala.collection.mutable.Set.empty[Long]
    def markChain(v: Long): Unit =
      if (live.add(v)) morBase(v).foreach(markChain)
    recent.foreach(markChain)
    (recent, live.toSet)
  }

  /** Drop snapshot dirs older than `keepLast` versions (the `VACUUM` /
    * `expire_snapshots` maintenance op). The pointer is never touched, so
    * this is always safe for current readers; time travel shrinks.
    * Versions a KEPT version still builds on through a merge-on-read
    * marker chain are live data, not history — they survive regardless
    * of age (the same reachability rule table-format vacuums apply to
    * data files still referenced by the current snapshot). */
  def vacuum(keepLast: Int = 1): Seq[Long] = {
    val latest = latestVersion.getOrElse(return Seq.empty)
    val f = fs
    val (_, live) = retentionLiveness(latest, keepLast)
    val dropped = (0L to latest - keepLast)
      .filterNot(live.contains)
      .filter(v => f.exists(versionDir(v)))
    dropped.foreach(v => f.delete(versionDir(v), true))
    dropped
  }

  /** Highest streaming batch id already committed for `appId`, scanning
    * the per-version `_txn-<appId>` markers. The marker rides in the
    * version directory itself, so it becomes visible in the SAME atomic
    * pointer swap as the data — there is no window where the rows are
    * published but the batch id is not (the Delta `txn` action's
    * idempotence contract). */
  def lastBatchId(appId: String): Option[Long] = {
    val f = fs
    if (!f.exists(rootPath)) return None
    val ids = f.listStatus(rootPath).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .map(s => new Path(s.getPath, s"_txn-$appId"))
      .filter(f.exists)
      .map(p => readSmall(p).toLong)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Exactly-once streaming append: commit the batch as a merge-on-read
    * append stamped with (appId, batchId); a REDELIVERED batch (retry
    * after a sink failure, restart from an old checkpoint) is detected
    * by [[lastBatchId]] and skipped, returning None. Batch ids must be
    * monotone per appId — exactly Structured Streaming's foreachBatch
    * contract. */
  def appendIfNew(rows: DataFrame, appId: String,
      batchId: Long): Option[Long] = {
    if (lastBatchId(appId).exists(_ >= batchId)) return None
    val base = latestVersion
    Some(publish(base) { staging =>
      rows.write.mode("overwrite").parquet(staging.toString)
      base.foreach(b =>
        writeSmall(new Path(staging, AppendBaseMarker), b.toString))
      writeSmall(new Path(staging, s"_txn-$appId"), batchId.toString)
    })
  }
}

/** Another committer published between this commit's base read and its
  * publish; the table moved on and this commit's inputs are stale. */
class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

object SnapshotStore {

  /** Continuous CDC apply: each micro-batch of the change stream is
    * compacted to latest-per-key and folded into the snapshot store as
    * one atomic version — streaming upsert with batch-identical merge
    * semantics (same [[Merge.applyChanges]]), the `foreachBatch` pattern
    * Structured Streaming prescribes for MERGE-style sinks. */
  def applyChangeStream(changes: DataFrame, store: SnapshotStore,
      keys: Seq[String], version: org.apache.spark.sql.Column,
      op: String = "op"): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          store.applyChanges(Merge.latestByKey(batch, keys, version),
            keys, op)
        }
        ()
      }
      .start()

  /** Exactly-once streaming append: each micro-batch becomes one
    * idempotent merge-on-read append version via
    * [[SnapshotStore.appendIfNew]] — a batch redelivered after a sink
    * crash or checkpoint replay is recognized by its (appId, batchId)
    * stamp and skipped, so restarts never double-ingest. Per-batch cost
    * is O(batch): the table is never rewritten on the hot path;
    * [[SnapshotStore.materialize]] compacts the chain out-of-band. */
  def exactlyOnceAppendStream(rows: DataFrame, store: SnapshotStore,
      appId: String): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) store.appendIfNew(batch, appId, batchId)
        ()
      }
      .start()
}
