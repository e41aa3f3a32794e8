package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min/max file skipping — the data-skipping layer every table format
  * (Delta stats, Iceberg manifests) puts between the query and the scan:
  * a per-file manifest of key bounds lets the planner drop whole files
  * whose [min, max] cannot intersect the predicate, BEFORE any data I/O.
  *
  * Two halves, both essential:
  *  - WRITE side: range-cluster on the skip key ([[writeClustered]] =
  *    `repartitionByRange` + `sortWithinPartitions`, the same exchange
  *    any global sort pays, once). Without clustering every file spans
  *    the whole key domain and min/max prunes nothing — layout is what
  *    MAKES statistics selective (the 1-D special case of [[Layout]]'s
  *    Z-order argument).
  *  - READ side: intersect the predicate with the manifest, then scan
  *    only surviving files. The manifest has one row per FILE — planning
  *    metadata, millions of times smaller than the data; driving the
  *    scan from it is exactly what a table-format reader does during
  *    planning (the one deliberately driver-side step, same as Delta /
  *    Iceberg reading their transaction log).
  *
  * Correctness is pruning-invariant: a skipped file provably contains no
  * matching row, so the pruned scan + residual filter returns bit-identical
  * rows to the full scan + filter — which is what the l10 oracle checks
  * (it runs the plain filter, knowing nothing about files).
  */
object FileSkipping {

  /** Range-cluster `df` on `keyCol` into `numFiles` files under `dir`. */
  def writeClustered(df: DataFrame, keyCol: String, numFiles: Int,
      dir: String): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(dir)

  /** The per-file bounds manifest: one row per parquet file with
    * (file, min, max, rows) of `keyCol`. Derived here by one scan (at
    * write scale the writer appends these rows transactionally instead,
    * as table formats do — the read path below is identical either
    * way). */
  def fileStats(spark: SparkSession, dir: String, keyCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"),
        count(lit(1)).as("n_rows"))

  /** Scan only the files whose [key_min, key_max] intersects [lo, hi],
    * with the residual predicate re-applied (files straddling the bounds
    * contain non-matching rows too). Returns (survivingFiles,
    * totalFiles, prunedScan) so callers — and the spec — can see the
    * skip actually happened. */
  def prunedRead(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): (Seq[String], Long, DataFrame) = {
    val stats = fileStats(spark, dir, keyCol)
    val total = stats.count()
    // manifest collect: one row per file — the planner-side metadata
    // read, NOT a data collect (same as a table format reading its log)
    val files = stats
      .filter(col("key_max") >= lo && col("key_min") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted
    val scan =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    (files, total, scan.filter(col(keyCol) >= lo && col(keyCol) <= hi))
  }

  // One clustered write per (session, source) — l10 probes a stable
  // layout; same caching rationale as LakeQueries' lake/snapshot caches.
  private val dirCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[lake] def clusteredOrdersDir(spark: SparkSession,
      orders: DataFrame): String = {
    val files = orders.inputFiles
    val key =
      if (files.nonEmpty) files.sorted.mkString(",")
      else "plan:" + orders.queryExecution.analyzed.toString
    dirCache.getOrElseUpdate((spark, key), {
      val dirPath = Files.createTempDirectory("graft-skip-")
      sys.addShutdownHook {
        import java.util.Comparator
        Files.walk(dirPath).sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
      val dir = dirPath.toFile.getAbsolutePath
      writeClustered(orders.select("o_orderkey", "o_totalprice"),
        "o_orderkey", numFiles = 16, dir)
      dir
    })
  }

  /** l10: orders range-clustered on o_orderkey into 16 files, then a
    * narrow key-range query served through the manifest — the oracle is
    * the plain filter over the logical table, so the check proves the
    * pruned scan loses nothing; FileSkippingSpec asserts it also reads
    * only a fraction of the files. */
  def skippingDemo(spark: SparkSession, orders: DataFrame): DataFrame = {
    val dir = clusteredOrdersDir(spark, orders)
    val (_, _, scan) = prunedRead(spark, dir, "o_orderkey", 1000L, 3000L)
    scan.select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
}
