package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults.
  *
  * The engine is designed for a multi-executor cluster reading ~100 TB; these
  * defaults are the local[N] test-rig equivalents of that posture:
  *   - AQE on (runtime shuffle coalescing, skew-join splitting, broadcast
  *     conversion from runtime stats),
  *   - shuffle partitions sized to the rig (cluster deployments override to
  *     ~2-3x total cores),
  *   - UTC session time zone (the reference stamps zoneless
  *     `LocalDateTime.now()`, /root/reference Main.java:105 — pinning UTC
  *     makes TimestampType coincide with it IFF the reference host also runs
  *     in UTC; for other host zones the partition labels differ by the zone
  *     offset. Correctness tests must not rely on cross-zone equality.).
  */
object Graft {
  def session(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
