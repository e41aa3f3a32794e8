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

  /** Current committed version, or None for an empty store. */
  def latestVersion: Option[Long] = {
    val f = fs
    if (!f.exists(pointer)) None
    else {
      val in = f.open(pointer)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
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
  def commit(df: DataFrame, expectedBase: Option[Long]): Long = {
    val v = expectedBase.map(_ + 1).getOrElse(0L)
    val staging = new Path(rootPath,
      s"_staging-v$v-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staging.toString)
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
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // FileContext.rename(OVERWRITE): the atomic publish (FileSystem's
    // overwriting rename is not part of its public contract)
    FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, pointer, Options.Rename.OVERWRITE)
    v
  }

  /** Read the current snapshot (empty-schema error if never committed). */
  def read(): DataFrame = read(latestVersion.getOrElse(
    throw new IllegalStateException(s"no committed snapshot under $root")))

  /** Time travel: read an exact historical version. */
  def read(version: Long): DataFrame =
    spark.read.parquet(versionDir(version).toString)

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

  /** Drop snapshot dirs older than `keepLast` versions (the `VACUUM` /
    * `expire_snapshots` maintenance op). The pointer is never touched, so
    * this is always safe for current readers; time travel shrinks. */
  def vacuum(keepLast: Int = 1): Seq[Long] = {
    val latest = latestVersion.getOrElse(return Seq.empty)
    val f = fs
    val dropped = (0L to latest - keepLast)
      .filter(v => f.exists(versionDir(v)))
    dropped.foreach(v => f.delete(versionDir(v), true))
    dropped
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
}
