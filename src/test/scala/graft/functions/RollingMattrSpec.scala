package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WindowDistinctSum]] (t49's rolling-multiset window sum) must be
  * bitwise-equal to the direct per-window `array_distinct` form it
  * replaces — the summands are the same exact integers, only the cost
  * changes (O(tokens) vs O(tokens·window)). */
class RollingMattrSpec extends SparkSpec {

  import spark.implicits._

  /** The pre-rewire direct form, kept here as the equality reference. */
  private def directWinSum(toks: org.apache.spark.sql.Column,
      window: Int): org.apache.spark.sql.Column =
    aggregate(
      transform(sequence(lit(0), size(toks) - lit(window)),
        i => size(array_distinct(slice(toks, i + 1, lit(window))))
          .cast("long")),
      lit(0L), (acc, x) => acc + x)

  test("rolling == direct on hand cases") {
    val docs = Seq(
      "a b c d e",            // all distinct
      "a a a a a",            // one type
      "a b a b a b",          // period-2
      "x",                    // shorter than any window > 1
      "a b c a b c a",        // repeats straddling windows
      "t1 t2 t3 t4 t5 t6 t7 t8 t2 t2"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (w <- Seq(1, 2, 3, 5)) {
      val toks = graft.operators.TextAnalysis.tokens(col("text"))
      val both = docs.select(col("doc_id"),
          when(size(toks) >= w,
            WindowDistinctSumFns.windowDistinctSum(toks, w))
            .otherwise(lit(0L)).as("rolling"),
          when(size(toks) >= w, directWinSum(toks, w))
            .otherwise(lit(0L)).as("direct"))
        .collect()
      both.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"w=$w doc=${r.getLong(0)}: rolling ${r.getLong(1)} != " +
          s"direct ${r.getLong(2)}"))
    }
  }

  test("rolling == direct across the fixture corpus at W=25") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val w = 25
    val diff = docs.select(
        when(size(toks) >= w,
          WindowDistinctSumFns.windowDistinctSum(toks, w))
          .otherwise(lit(0L)).as("rolling"),
        when(size(toks) >= w, directWinSum(toks, w))
          .otherwise(lit(0L)).as("direct"))
      .filter(col("rolling") =!= col("direct"))
    assert(diff.count() == 0L)
  }

  test("mattr output is unchanged by the rewire (direct recomputation)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.TextAnalysis.mattr(docs).collect()
    assert(out.nonEmpty)
    // recompute one row's mattr from the direct form
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val w = 25
    val ref = docs.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        directWinSum(toks, w).as("win_sum"))
      .filter(col("n_tokens") >= w)
      .limit(1).collect().head
    val got = out.find(_.getLong(0) == ref.getLong(0)).get
    val expect = ref.getLong(2).toDouble /
      ((ref.getLong(1) - w + 1) * w).toDouble
    assert(got.getDouble(5) == expect)
  }
}
