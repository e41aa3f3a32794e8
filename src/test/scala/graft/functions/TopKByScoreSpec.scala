package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TopKByScore invariants. Five ledger queries (s01/s02/s04/s06/s07)
  * stake their bitwise oracle match on this aggregate reproducing
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k` under ANY
  * partitioning, so the mergeability laws are property-tested rather
  * than assumed (explicitly-sampled seeded generators — the
  * scalatest/scalacheck bridge isn't in the offline cache). */
class TopKByScoreSpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))

  // scores from a small pool force heavy ties; ids unique per case
  private val caseGen: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 40)
    scores <- Gen.listOfN(n, Gen.oneOf(-1.5, -0.0, 0.0, 0.25, 0.25,
      1.0, 7.5, Double.MinPositiveValue))
  } yield scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }

  // engine-sort semantics: NaN above all, IEEE == (zeros tie), id asc
  private def cmpDesc(x: Double, y: Double): Int =
    if (x.isNaN && y.isNaN) 0
    else if (x.isNaN) -1
    else if (y.isNaN) 1
    else if (x == y) 0
    else if (x > y) -1 else 1

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[ScoredId] =
    xs.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = cmpDesc(sa, sb)
      c < 0 || (c == 0 && ia < ib)
    }.take(k).map { case (s, i) => ScoredId(s, i) }

  test("-0.0 ties +0.0 at the k boundary (IEEE ==, like both engines)") {
    val agg = TopKByScore(1)
    // raw Double.compare would rank +0.0 (id 1) ahead; the engines'
    // sorts tie the zeros and break on id — id 0 must win
    val b = agg.reduce(agg.reduce(agg.zero, ScoredId(-0.0, 0L)),
      ScoredId(0.0, 1L))
    assert(agg.finish(b) == Seq(ScoredId(-0.0, 0L)))
    // NaN ranks above every number, two NaNs tie on id
    val c = Seq(ScoredId(1.0, 5L), ScoredId(Double.NaN, 9L),
      ScoredId(Double.NaN, 4L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(c).head.id == 4L)
  }

  test("property: any reduce/merge partitioning equals sort-take(k)") {
    val agg = TopKByScore(3)
    samples(caseGen, 60).zipWithIndex.foreach { case (xs, ci) =>
      val want = reference(xs, 3)
      // single-buffer fold
      val folded = xs.foldLeft(agg.zero) { case (b, (s, i)) =>
        agg.reduce(b, ScoredId(s, i)) }
      assert(agg.finish(folded) == want, s"case $ci fold")
      // split at every position, fold halves independently, merge —
      // both orders (merge must be commutative for shuffle-order
      // independence)
      (0 to xs.length by 7).foreach { cut =>
        val (l, r) = xs.splitAt(cut)
        val bl = l.foldLeft(agg.zero) { case (b, (s, i)) =>
          agg.reduce(b, ScoredId(s, i)) }
        val br = r.foldLeft(agg.zero) { case (b, (s, i)) =>
          agg.reduce(b, ScoredId(s, i)) }
        assert(agg.finish(agg.merge(bl, br)) == want, s"case $ci cut $cut")
        assert(agg.finish(agg.merge(br, bl)) == want,
          s"case $ci cut $cut swapped")
      }
    }
  }

  test("agrees with the window form on a DataFrame incl. ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = samples(caseGen, 6).zipWithIndex.flatMap { case (xs, g) =>
      xs.map { case (s, i) => (g.toLong, s, g * 1000L + i) }
    }.toDF("g", "score", "id").repartition(7)
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKByScore.topK(4)(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("g"), col("nb.id"), (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    val viaWin = df.select(col("g"), col("id"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWin)
  }
}
