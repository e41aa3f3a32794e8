package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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

  /** Rewrite partition (date, hour) of the lake at `root` into
    * `numFiles` files. Returns the number of rows compacted. */
  def compactPartition(spark: SparkSession, root: String, date: String,
      hour: String, numFiles: Int = 1): Long = {
    require(numFiles > 0, "numFiles must be positive")
    val lakeDir = s"$root/datalake"
    // Explicit schema pins pdate/phour to STRING: inference would type
    // phour=06 as int 6, and the rewrite would land in a NEW phour=6
    // directory instead of overwriting phour=06 (duplicating the data).
    val fullSchema = StructType(Seq(
      StructField("book_id", LongType), StructField("kind", StringType),
      StructField("text", StringType), StructField("ts", TimestampType),
      StructField("date", StringType), StructField("hour", StringType),
      StructField("pdate", StringType), StructField("phour", StringType)))
    val part = spark.read.schema(fullSchema).parquet(lakeDir)
      .filter(col("pdate") === date && col("phour") === hour)
    // materialize BEFORE overwriting the location being read
    val snapshot = part.localCheckpoint(true)
    val rows = snapshot.count()
    snapshot
      .coalesce(numFiles)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pdate", "phour")
      .parquet(lakeDir)
    rows
  }
}
