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

  /** `events.parquet` has shipped with two physical layouts for `ts`, and
    * both must land on the SAME µs TimestampType (UTC session) the whole
    * pipeline and the DuckDB oracle see:
    *
    *   - TIMESTAMP(NANOS) (fixtures through round 10): Spark's vectorized
    *     reader rejects it ([PARQUET_TYPE_ILLEGAL]), so read the physical
    *     INT64 nanos via `spark.sql.legacy.parquet.nanosAsLong` and
    *     floor-truncate with integer `ts div 1000` → `timestamp_micros` —
    *     exactly what DuckDB does reading the same file as a µs TIMESTAMP.
    *     Integer division, NOT double: ns epochs (~1.7e18) exceed double's
    *     53-bit mantissa.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-11 fixtures):
    *     reads natively as TIMESTAMP_NTZ; cast to TimestampType, which
    *     under the UTC session timezone preserves the epoch micros bit
    *     for bit with what the nanos path produced.
    *
    * Branching on the LOADED datatype keeps both fixture generations and
    * any downstream consumer working unchanged. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
