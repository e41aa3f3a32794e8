package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Short id for the driver line ("q01" for "q01_pricing_summary") —
    * uniqueness across the ledger is guarded by EntrySpec. */
  private def shortId(name: String): String = name.takeWhile(_ != '_')

  /** Min of the successful passes, or -1 when every pass failed. The MIN
    * (not mean) is the jitter-proofing: co-load on the rig can only ever
    * slow a pass down, so the fastest observed run is the closest sample
    * to the query's true cost — a transient spike would have to hit the
    * same query in BOTH sweeps to distort the reported number (the r9
    * failure mode: single-shot timing under driver co-load faked a 28%
    * regression and a 6.8x outlier on untouched code). */
  def minOfPasses(passes: Seq[Double]): Double = {
    val ok = passes.filter(_ >= 0)
    if (ok.isEmpty) -1.0 else ok.min
  }

  /** Render the ONE stdout JSON line the driver tail-captures. Every byte
    * counts against a 2000-byte window (the r4 failure mode: a full
    * per-query map outgrew it and the round's bench parsed null), so the
    * line carries the total, the query count, and only the TEN slowest
    * queries in integer milliseconds — its length is ~constant no matter
    * how far the ledger grows (EntrySpec asserts < 1600 bytes even at
    * +40 queries). Values are min-of-passes; the full per-pass map goes
    * to [[fullMapJson]]. Formatting pins Locale.ROOT: under a
    * comma-decimal default locale an f-interpolated total would emit
    * `"value":149,500` and the sole line the driver parses would be
    * invalid JSON. */
  def renderLine(results: Seq[(String, Double)], sfName: String): String = {
    val ok = results.filter(_._2 >= 0)
    val total = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(ok.map(_._2).sum))
    val failed = results.filterNot(_._2 >= 0).map(_._1)
    val slow = ok.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + shortId(k) + "\":" + math.round(v * 1000) }
      .mkString("{", ",", "}")
    val failedPart =
      if (failed.isEmpty) ""
      else failed.map("\"" + shortId(_) + "\"").mkString(""","failed":[""", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"slowest_ms":$slow$failedPart,"queries_file":"BENCH_QUERIES.json","sf":"$sfName"}"""
  }

  /** Full per-query timings written to BENCH_QUERIES.json in the working
    * dir — the driver's round-end commit picks it up, so per-query history
    * survives without spending stdout-line bytes on it. EVERY timed pass
    * is persisted (integer ms, full names; -1 = failed) alongside the min
    * the driver line reports, so jitter is visible in the artifact itself:
    * a pass-1/pass-2 spread is co-load, a min that moved is a real
    * plan/code change. */
  def fullMapJson(results: Seq[(String, Seq[Double])], sfName: String): String = {
    def ms(v: Double): Long = if (v >= 0) math.round(v * 1000) else -1L
    val qs = results
      .map { case (k, passes) =>
        val arr = passes.map(ms).mkString("[", ",", "]")
        "\"" + k + "\":{\"passes_ms\":" + arr +
          ",\"min_ms\":" + ms(minOfPasses(passes)) + "}"
      }
      .mkString("{", ",", "}")
    s"""{"unit":"ms","sf":"$sfName","passes":2,"queries":$qs}"""
  }

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
    // ERROR-only logs: the bench's published surface is one JSON line,
    // and the driver's 2000-byte tail capture must hold it — WARN
    // noise (localCheckpoint reliability notes, AQE chatter) was
    // drowning it. Real failures still surface: the sweep catches and
    // prints [bench] lines per query at stderr.
    spark.sparkContext.setLogLevel("ERROR")
    // No checkpoint dir here, DELIBERATELY: Anchor.cut then takes
    // localCheckpoint, so timed queries measure their PLANS, not the
    // checkpoint store. The r18 experiment that pointed the bench at a
    // reliable (tmpfs-backed) checkpoint dir re-priced every
    // anchor-heavy query by its checkpoint-file round trips — the five
    // kNN-graph consumers drifted 1.6–3.0× with zero plan change, pure
    // harness-environment cost. The reliable path is still exercised
    // where it belongs: Verify (the untimed correctness surface) sets
    // a checkpoint dir for every anchored query, and AnchorSpec covers
    // the persist+checkpoint+release mechanics directly.
    // Untimed warmup: one full pass builds file indexes and lets the JIT
    // compile every query's generated code, so timed numbers reflect
    // steady state rather than which query happened to run first cold.
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // noop sink: forces FULL evaluation of every output column (a bare
    // count() would let Catalyst prune projection-only work to nothing).
    // Failures record -1 so the output distinguishes a broken query from
    // a fast one.
    def timedSweep(): Seq[(String, Double)] = queries.toSeq.map {
      case (name, fn) =>
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
    // TWO full timed sweeps (not back-to-back per query): a transient
    // co-load spike at any moment lands in pass 1 of some queries and
    // pass 2 of others, so the per-query min dodges it; per-query
    // double-timing would put both samples inside the same spike.
    val pass1 = timedSweep()
    val pass2 = timedSweep().toMap
    val passes = pass1.map { case (name, p1) =>
      name -> Seq(p1, pass2.getOrElse(name, -1.0))
    }
    val results = passes.map { case (name, ps) => name -> minOfPasses(ps) }
    // basename only ("sf0.1"), not the full path
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "BENCH_QUERIES.json")
    // The default artifact ALSO lands in a core-count-suffixed file
    // (r22): the driver benches at two core counts and the second run
    // overwrites BENCH_QUERIES.json, so the 32-core per-query map never
    // survived a round and the driver's per-query/scaling comparisons
    // came up empty (PERF_r21 n_common: 0). Purely an additional output
    // — the stdout line, the timing methodology, and the default file
    // are byte-identical to before.
    val outPaths = outPath +:
      (if (outPath == "BENCH_QUERIES.json")
        Seq(s"BENCH_QUERIES_c$cpus.json") else Nil)
    outPaths.foreach { path =>
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          (fullMapJson(passes, sfName) + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    }
    println(renderLine(results, sfName))
    graft.operators.Similarity.clearSharedGraphs(spark)
    spark.stop()
  }
}
