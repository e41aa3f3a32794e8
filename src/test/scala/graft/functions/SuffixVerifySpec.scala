package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SuffixVerify]]: exact intersection for pairs at/above threshold,
  * −1 for pairs provably below it, bitwise agreement between the
  * interpreted eval and the codegen path, and consistency with the
  * naive array_intersect count. */
class SuffixVerifySpec extends SparkSpec {

  import spark.implicits._

  private def verify(a: Seq[String], b: Seq[String], t: Double): Long = {
    val df = Seq((a.sorted, b.sorted)).toDF("a", "b")
    df.select(SuffixVerifyFns.suffixVerify(col("a"), col("b"), t)
      .as("v")).head.getLong(0)
  }

  test("exact intersection when Jaccard meets the threshold") {
    // |A∩B| = 3, |A∪B| = 5 → J = 0.6
    assert(verify(Seq("a", "b", "c", "d"), Seq("b", "c", "d", "e"),
      0.5) == 3L)
    // identical sets: J = 1 at any threshold
    assert(verify(Seq("x", "y"), Seq("x", "y"), 1.0) == 2L)
  }

  test("abandons below-threshold pairs with -1") {
    // J = 3/5 = 0.6 < 0.7
    assert(verify(Seq("a", "b", "c", "d"), Seq("b", "c", "d", "e"),
      0.7) == -1L)
    // disjoint sets
    assert(verify(Seq("a", "b"), Seq("c", "d"), 0.1) == -1L)
  }

  test("boundary: J exactly at threshold survives (ceil slack does " +
      "not drop the equality case)") {
    // |A|=|B|=2, inter=2 → J=1.0; alpha at t=1.0 is ceil(4/2)=2
    assert(verify(Seq("p", "q"), Seq("p", "q"), 1.0) == 2L)
    // inter=1, sizes 1 and 2 → J = 1/2 exactly at t=0.5
    assert(verify(Seq("a"), Seq("a", "b"), 0.5) == 1L)
  }

  test("agrees with the naive array_intersect count on random-ish " +
      "fixture sets, across a threshold grid") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val arrs = docs.limit(40)
      .select(col("doc_id"),
        sort_array(array_distinct(split(trim(col("text")), "\\s+")))
          .as("arr"))
    val pairs = arrs.toDF("ida", "a")
      .crossJoin(arrs.toDF("idb", "b"))
      .filter(col("ida") < col("idb"))
    for (t <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val got = pairs.select(col("ida"), col("idb"),
          SuffixVerifyFns.suffixVerify(col("a"), col("b"), t).as("v"),
          size(array_intersect(col("a"), col("b"))).cast("long")
            .as("naive"),
          size(col("a")).cast("long").as("na"),
          size(col("b")).cast("long").as("nb"))
        .collect()
      got.foreach { r =>
        val (v, naive, na, nb) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        val j = naive.toDouble / (na + nb - naive).toDouble
        if (j >= t) assert(v == naive,
          s"survivor pair must carry exact inter: got $v want $naive")
        else assert(v == -1L,
          s"below-threshold pair must be abandoned: got $v (J=$j t=$t)")
      }
    }
  }

  test("interpreted eval matches the codegen value (same merge)") {
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("aa", "bb", "cc").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("bb", "cc", "dd").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val e = SuffixVerify(
      org.apache.spark.sql.catalyst.expressions.Literal(a,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(b,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(0.5))
    assert(e.eval(null) == 2L)
  }
}
