package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * declared query must have either an oracle or a documented exemption. */
class EntrySpec extends SparkSpec {

  test("entry() flagship returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle unless approximate by design") {
    val exempt = Set("q18_approx_distinct") // HLL sketch: rows-only check
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("bench short ids (prefix before first '_') are unique") {
    // Bench.scala emits timings under these prefixes to stay inside the
    // driver's 2000-byte tail capture; a collision silently falls back to
    // full names and re-inflates the line past the window (the r4
    // failure). Fail here instead of discovering it in BENCH_r{N}.json.
    val byPrefix = SparkEntry.queries.keySet.groupBy(_.takeWhile(_ != '_'))
    val clashes = byPrefix.filter(_._2.size > 1)
    assert(clashes.isEmpty, s"colliding bench short ids: $clashes")
  }

  test("all queries execute on the smoke fixture (sf0.001)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
