package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  LongType, StringType}

/** PPJoin+'s verification-with-suffix-filtering step (Xiao et al. 2008
  * §4) as one codegen'd merge over two SORTED shingle arrays: computes
  * the exact intersection size |A∩B| when Jaccard(A,B) ≥ `threshold`,
  * and abandons the pair with −1 the moment it becomes provably
  * impossible — at every merge position the remaining-overlap bound
  * `matched + min(|A|−i, |B|−j)` is checked against the overlap
  * threshold α = ⌈t·(|A|+|B|)/(1+t)⌉, which is the suffix filter's
  * positional upper bound maintained EXHAUSTIVELY (the published
  * filter probes one partition point per candidate before verifying;
  * the merge refines the same bound at every element, so it abandons
  * at the earliest provable point and subsumes any fixed probe
  * depth). Lossless by construction: a pair is dropped only when
  * inter < α ⇔ Jaccard < t, and survivors carry their EXACT
  * intersection count — the d02-equality spec is the gate.
  *
  * The arrays must be sorted ascending under Spark's own StringType
  * ordering (UTF8String binary order — `sort_array`'s comparator and
  * this merge's compareTo are the same ordering by construction).
  * The 1e-9 slack on α mirrors the candidate stage's: it can only
  * WEAKEN pruning at a float boundary, never drop a true pair.
  *
  * This replaces a per-candidate exploded double join + groupBy
  * (Σ_cand(|A|+|B|) shuffled rows and a wide aggregation) with one
  * map-side primitive loop per candidate pair inside whole-stage
  * codegen. */
case class SuffixVerify(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _),
          DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>, double), " +
          s"got (${a.catalogString}, ${b.catalogString}, " +
          s"${t.catalogString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_suffix_verify"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val th = t.asInstanceOf[Double]
    val na = x.numElements()
    val nb = y.numElements()
    val alpha = math.ceil(th * (na + nb) / (1.0 + th) - 1e-9).toLong
    var i = 0
    var j = 0
    var m = 0L
    var dead = false
    while (!dead && i < na && j < nb) {
      if (m + math.min(na - i, nb - j) < alpha) dead = true
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { m += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    if (dead || m < alpha) -1L else m
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val alpha = ctx.freshName("alpha")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val dead = ctx.freshName("dead")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long $alpha = (long) java.lang.Math.ceil(
         |  $t * ($na + $nb) / (1.0 + $t) - 1e-9);
         |int $i = 0; int $j = 0; long $m = 0L; boolean $dead = false;
         |while ($i < $na && $j < $nb) {
         |  if ($m + (long) java.lang.Math.min($na - $i, $nb - $j)
         |      < $alpha) { $dead = true; break; }
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $m++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($dead || $m < $alpha) ? -1L : $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object SuffixVerifyFns {

  /** `suffixVerify(sortedA, sortedB, t)` as a Column: exact |A∩B| when
    * Jaccard ≥ t, −1 (abandoned) otherwise.
    *
    * Preconditions (the caller's contract, not checked):
    *  - both arrays sorted ascending under Spark's StringType ordering
    *    (`sort_array`'s UTF8String binary order);
    *  - NO NULL ELEMENTS — the merge calls getUTF8String per element
    *    without a null guard (NPE interpreted, undefined under
    *    codegen). Dedup's `collect_list` inputs satisfy this by
    *    construction (collect_list drops nulls);
    *  - the accept gate α carries a 1e-9 ceil slack, so at an exact
    *    float boundary a pair marginally BELOW t can return its
    *    intersection instead of −1 — callers needing exactness for
    *    arbitrary t re-check `jaccard >= t` on survivors (one
    *    row-local comparison; see d17's final gate). */
  def suffixVerify(a: Column, b: Column, threshold: Double): Column = {
    import org.apache.spark.sql.functions.lit
    ColumnBridge.column(SuffixVerify(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(lit(threshold))))
  }
}
