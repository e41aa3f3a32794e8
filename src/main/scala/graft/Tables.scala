package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (TESTDATA.md).
  *
  * Plain parquet scans — Catalyst's `FileSourceScanExec` provides the
  * distributed file listing, column pruning and predicate pushdown that the
  * reference hand-rolls as paginated ListObjectsV2 loops
  * (/root/reference S3DatalakeStorage.java:69-114).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load a fixture table, restoring scan parallelism when the file is a
    * single row group. Parquet splits at row-group granularity, and every
    * fixture file has exactly ONE row group — so without this, each scan
    * pipeline (filter, project, expand, partial agg) runs as a single
    * task no matter how many cores the rig has. A real 100 TB table has
    * thousands of row groups and gets this parallelism from the file
    * layout; the round-robin exchange below is the local-rig equivalent,
    * and Catalyst still pushes filters through it to the scan. Skipped
    * when the scan already yields enough partitions. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(target / 2, 2))
      df.repartition(target)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the physical
    * INT64 nanos via `spark.sql.legacy.parquet.nanosAsLong` and convert with
    * integer `div 1000` → `timestamp_micros`, i.e. floor-truncate to µs —
    * exactly what DuckDB (the correctness oracle) does when it reads the same
    * file as a µs TIMESTAMP. Integer division, NOT double: ns epochs (~1.7e18)
    * exceed double's 53-bit mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
