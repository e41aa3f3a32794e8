package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lake maintenance: partition compaction.
  *
  * Streaming/micro-batch ingest (StreamingIngest, IngestService) appends
  * a few files per trigger; at 100 TB the resulting small-files problem
  * dominates scan cost (file-listing latency, per-file open overhead,
  * under-filled row groups that defeat min/max pruning). Compaction
  * rewrites one time-partition into `numFiles` right-sized files using
  * dynamic partition overwrite — other partitions are untouched, and
  * readers never see a partial partition (the overwrite commits
  * atomically per partition via the commit protocol).
  */
object LakeMaintenance {

  // Explicit schema pins pdate/phour to STRING: inference would type
  // phour=06 as int 6, and the rewrite would land in a NEW phour=6
  // directory instead of overwriting phour=06 (duplicating the data).
  private val fullSchema = StructType(Seq(
    StructField("book_id", LongType), StructField("kind", StringType),
    StructField("text", StringType), StructField("ts", TimestampType),
    StructField("date", StringType), StructField("hour", StringType),
    StructField("pdate", StringType), StructField("phour", StringType)))

  /** Rewrite partition (date, hour) of the lake at `root` into
    * `numFiles` files. Returns the number of rows compacted. */
  def compactPartition(spark: SparkSession, root: String, date: String,
      hour: String, numFiles: Int = 1): Long = {
    require(numFiles > 0, "numFiles must be positive")
    val lakeDir = s"$root/datalake"
    val part = spark.read.schema(fullSchema).parquet(lakeDir)
      .filter(col("pdate") === date && col("phour") === hour)
    // Materialize BEFORE overwriting the location being read. Anchor.cut
    // (not a bare localCheckpoint): this snapshot guards DURABILITY, not
    // just lineage — on a real cluster an executor loss mid-overwrite
    // would lose both the local snapshot blocks and the already-deleted
    // source files, so a configured checkpoint dir must make it reliable.
    val snapshot = graft.operators.Anchor.cut(part)
    val rows = snapshot.count()
    snapshot
      .coalesce(numFiles)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pdate", "phour")
      .parquet(lakeDir)
    // The committed overwrite was the snapshot's LAST reader: release
    // the anchor (reliable-checkpoint files would otherwise accumulate
    // one full partition copy per maintenance run — cleanCheckpoints is
    // off by default, so nothing else ever reclaims them). Deliberately
    // NOT in a finally: if the overwrite fails midway, the snapshot may
    // be the only durable copy of the partition — keep it for recovery.
    graft.operators.Anchor.release(snapshot)
    rows
  }

  /** Plan-driven whole-lake compaction: [[Compaction.planBins]] over the
    * lake's REAL file inventory decides how many right-sized files each
    * (pdate, phour) partition should hold; [[compactPartition]] executes
    * each partition's plan.
    *
    * A partition qualifies only when it holds at least two UNDERSIZED
    * files (n_rows < targetRows) — the min-file-size rule every OPTIMIZE
    * implementation applies. Files at or above the target are right-sized
    * and never rewritten, so the pass is a fixpoint: re-running
    * maintenance on an already-compacted lake does nothing (asserted in
    * CompactionSpec), instead of churning files whose boundaries repack
    * into fewer bins each run.
    *
    * Scale shape: the inventory is one distributed scan grouped by
    * (partition, input_file_name) — row counts per file, never row data —
    * and the plan that reaches the driver is FILE METADATA (one row per
    * partition), the same thing every OPTIMIZE coordinator schedules
    * from; each partition rewrite is then an independent distributed
    * job touching only that partition's files. Original file boundaries
    * dissolve on rewrite, so the plan's binding output is the bin COUNT
    * per partition (= output file count at the target size); which old
    * file lands in which bin is the planner's sizing evidence, not a
    * physical constraint on the writer.
    *
    * Returns (pdate, phour) → planned file count for the partitions it
    * rewrote. */
  def compactByPlan(spark: SparkSession, root: String,
      targetRows: Long): Map[(String, String), Int] = {
    val lakeDir = s"$root/datalake"
    val inventory = spark.read.schema(fullSchema).parquet(lakeDir)
      .groupBy(col("pdate"), col("phour"),
        input_file_name().as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
      // ' ' cannot occur in pdate/phour (digit strings), so the
      // composite key is collision-free
      .withColumn("pkey", concat_ws(" ", col("pdate"), col("phour")))
    val plan = Compaction.planBins(inventory, "pkey", targetRows)
      .groupBy(col("pkey"))
      .agg((max(col("bin_id")) + 1).cast("int").as("n_bins"),
        count(lit(1)).cast("int").as("n_files"),
        sum(when(col("n_rows") < targetRows, 1)
          .otherwise(0)).cast("int").as("n_small"))
    val todo = plan.collect().toSeq
      .map { r =>
        val Array(date, hour) = r.getAs[String]("pkey").split(' ')
        (date, hour, r.getAs[Int]("n_bins"), r.getAs[Int]("n_files"),
          r.getAs[Int]("n_small"))
      }
      .filter { case (_, _, bins, files, small) =>
        files > bins && small >= 2 }
      .sortBy { case (date, hour, _, _, _) => (date, hour) }
    todo.map { case (date, hour, bins, _, _) =>
      compactPartition(spark, root, date, hour, bins)
      (date, hour) -> bins
    }.toMap
  }
}
