package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k hash sketch as a typed `Aggregator` — the custom-UDAF surface
  * (SURVEY §2.10) carried by a real distributed-sketch use case.
  *
  * The k smallest hash values of a set form a mergeable, fixed-size
  * summary: unions merge by keeping the k smallest of both sides
  * (associative + commutative, so partial aggregation works map-side),
  * and the k-th smallest value estimates distinct cardinality
  * ((k−1)/frac(kth) — the classic KMV estimator). Unlike HLL the state
  * is EXACT and deterministic: the same input set yields the same
  * bottom-k whatever the partitioning, so the result is oracle-checkable
  * (q25) where approx_count_distinct (q18) is not.
  *
  * Input is the hash STRING (hex md5 — uniform, lexicographically
  * comparable); buffer is a sorted ascending list bounded at k.
  */
case class BottomKSketch(k: Int)
    extends Aggregator[String, List[String], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: List[String] = Nil

  override def reduce(buf: List[String], h: String): List[String] =
    if (h == null) buf // builtin-aggregate semantics: nulls don't count
    // fast path: full sketch and h can't displace the current k-th
    else if (buf.length == k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else (h :: buf).sorted.take(k)

  override def merge(a: List[String], b: List[String]): List[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: List[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[List[String]] =
    ExpressionEncoder[List[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object BottomKSketch {
  /** Column-API form: `bottomK(8)(md5Col)`. */
  def bottomK(k: Int): Column => Column = {
    val fn = udaf(BottomKSketch(k), Encoders.STRING)
    (c: Column) => fn(c)
  }
}
