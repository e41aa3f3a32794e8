package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated allowlist for focused iteration on a few
    // queries; absent (the driver's invocation) = run everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one full pass builds file indexes and lets the JIT
    // compile every query's generated code, so timed numbers reflect
    // steady state rather than which query happened to run first cold.
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // noop sink: forces FULL evaluation of every output column (a bare
    // count() would let Catalyst prune projection-only work to nothing).
    // Failures record -1 so the JSON output distinguishes a broken query
    // from a fast one.
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val elapsed =
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      name -> elapsed
    }
    // 3-decimal timings: the driver captures only the tail of stdout, and
    // 60 queries x 17-digit doubles pushed the JSON line past its window.
    def fmt(v: Double): String = f"$v%.3f"
    // Short ids ("q01" for "q01_pricing_summary"): at 68+ queries the full
    // names alone cost ~1400 bytes of the driver's 2000-byte tail capture.
    // The prefix before the first '_' is unique across the ledger (guarded
    // below — any collision falls back to full names for that run).
    val shortIds = results.keys.map(_.takeWhile(_ != '_')).toSet
    val useShort = shortIds.size == results.size
    def key(k: String): String = if (useShort) k.takeWhile(_ != '_') else k
    val qs = results.map { case (k, v) => s"\"" + key(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // basename only: every byte of this line counts against the driver's
    // 2000-byte tail capture, and the query ledger keeps growing
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
    spark.stop()
  }
}
