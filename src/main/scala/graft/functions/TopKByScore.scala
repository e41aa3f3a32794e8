package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate of a top-k reduction. */
case class ScoredId(score: Double, id: Long)

/** Bounded per-group top-k as a mergeable typed `Aggregator` — the
  * scale-correct form of "rank within group, keep the first k".
  *
  * The naive plan (`Window.partitionBy(group) + row_number + filter`)
  * shuffles EVERY scored row into one task per group and sorts the
  * whole group there: for ANN search that funnels |corpus| rows per
  * query into nQueries tasks — fine at sf0.1, a single-task sort of
  * ~10¹¹ rows per query at 100 TB. This aggregate keeps at most k
  * candidates per partition (map-side partial aggregation: each input
  * split reduces to ≤ k rows per group BEFORE the shuffle), then merges
  * the per-partition top-k lists — shuffle volume drops from |corpus|
  * per query to k·|partitions| per query, and no task ever holds more
  * than k rows of state per group.
  *
  * Ordering contract (must match the oracle's
  * `row_number() OVER (ORDER BY score DESC, id ASC)` bitwise): higher
  * score first, ties broken by ascending id. Scores compare with the
  * semantics BOTH engines' sorts use — IEEE `==` for equality (so
  * -0.0 ties +0.0 and falls to the id tie-break, exactly like Spark's
  * nanSafeCompareDoubles and DuckDB's C++ comparison; raw
  * `Double.compare` would order the zeros and silently diverge at a
  * zero-score k-boundary) and NaN ranking above every number — so the
  * aggregate reproduces the window ranking exactly, rank i = position
  * i in the finished list.
  *
  * Buffer is a best-first sorted list bounded at k (k is small by
  * construction — it is the user's result size); reduce short-circuits
  * when the incoming row cannot displace the current k-th, so the hot
  * path is one comparison per row.
  */
case class TopKByScore(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  /** Descending-score comparison with engine-sort semantics: NaN first
    * (it sorts above every number in both engines), then IEEE `>` / `==`
    * (-0.0 ties +0.0). Mirror of Spark's nanSafeCompareDoubles, negated
    * for the descending direction. */
  private def cmpDesc(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn && yn) 0
    else if (xn) -1
    else if (yn) 1
    else if (x == y) 0
    else if (x > y) -1
    else 1
  }

  /** Strict "ranks ahead of": score desc, id asc. */
  private def beats(a: ScoredId, b: ScoredId): Boolean = {
    val c = cmpDesc(a.score, b.score)
    c < 0 || (c == 0 && a.id < b.id)
  }

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] =
    if (buf.length >= k && !beats(x, buf.last)) buf
    else ((x :: buf).sortWith(beats)).take(k)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    (a ++ b).sortWith(beats).take(k)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKByScore {
  /** Column-API form: `topK(10)(score, id)` → best-first
    * `array<struct<score,id>>` of length ≤ k. (The product encoder
    * flattens the input case class to two UDAF parameters.) */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopKByScore(k), Encoders.product[ScoredId])
    (score: Column, id: Column) => fn(score, id)
  }
}
