package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the maintenance pass every
  * continuously-ingested lake needs (the reference writes one object per
  * document, `S3DatalakeStorage.java:33-62`, which at 100 TB degrades
  * scans into millions of small-object reads; table formats fix it with
  * bin-packing OPTIMIZE jobs).
  *
  * The planner assigns files to target-size compaction bins WITHIN each
  * lake partition via a per-partition cumulative sum — compaction never
  * merges across partition boundaries (that would break partition
  * pruning), so the window is keyed by partition and the plan
  * parallelizes across partitions. Quantile-free deterministic binning:
  * `bin = floor(preceding_rows / target)` packs files in order until a
  * bin crosses the target, so every bin lands within one file of the
  * target size; no sampling, no global pass, stable under re-runs. */
object Compaction {

  /** Assign each file to a compaction bin: files ordered within their
    * partition, bin index = cumulative row count BEFORE this file,
    * integer-divided by the target. `files` needs (`partCol`, file_id,
    * n_rows) columns. */
  def planBins(files: DataFrame, partCol: String,
      targetRows: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("bin_id",
        expr(s"(cum_rows - n_rows) div ${targetRows}L"))
      .select(col(partCol), col("file_id"), col("n_rows"), col("bin_id"))
  }

  /** l08 demo: a synthetic-but-honest file inventory — one "file" per
    * order date (the lake's daily micro-batch grain), partitioned by
    * month — binned to 5 000-row compaction groups, rolled up to one row
    * per planned output file. The rollup is what an OPTIMIZE scheduler
    * consumes: which files merge, how many rows the merged file gets. */
  def orderFileCompaction(orders: DataFrame,
      targetRows: Long = 5000L): DataFrame = {
    val inventory = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("pmonth"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
    planBins(inventory, "pmonth", targetRows)
      .groupBy(col("pmonth"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("bin_rows"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .orderBy(col("pmonth"), col("bin_id"))
  }
}
