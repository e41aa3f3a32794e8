package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ over every `window`-token sliding window of the window's DISTINCT
  * token count, in ONE pass — the rolling-multiset form of t49's MATTR
  * numerator (Covington & McFall 2010). The direct formulation
  * (`transform` over window starts + per-window `array_distinct`) is
  * O(tokens · window) per document and runs interpreted (higher-order
  * lambdas have no codegen); this expression keeps one token→count
  * multiset, adds the entering token and evicts the leaving one per
  * step (distinct count d changes only on 0↔1 transitions), and sums d
  * at each complete window — O(tokens) per document inside whole-stage
  * codegen. Bitwise-identical results by construction: every summand
  * is the same exact integer the per-window `array_distinct` counts
  * (RollingMattrSpec holds equality against the direct form on the
  * fixture corpus and hand cases).
  *
  * Returns 0 when the document is shorter than the window (the caller
  * gates on n ≥ window, matching the published shorter-than-window
  * convention). Precondition (not checked): NO NULL ELEMENTS — inputs
  * come from `split(trim(text))`, which never yields null tokens. */
case class WindowDistinctSum(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, s"window must be positive, got $window")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_window_distinct_sum"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < window) 0L
    else {
      val counts = new java.util.HashMap[UTF8String, Integer](window * 2)
      var d = 0
      var sum = 0L
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        val c = counts.get(t)
        if (c == null) { counts.put(t, 1); d += 1 }
        else counts.put(t, c + 1)
        if (i >= window) {
          val u = arr.getUTF8String(i - window)
          val cu = counts.get(u)
          if (cu == 1) { counts.remove(u); d -= 1 }
          else counts.put(u, cu - 1)
        }
        if (i >= window - 1) sum += d
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sum = ctx.freshName("sum")
      val counts = ctx.freshName("counts")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u")
      val cu = ctx.freshName("cu")
      val w = window
      // raw HashMap + explicit boxing: the generated source compiles
      // under Janino, whose generics/autoboxing support is partial
      s"""
         |int $n = $a.numElements();
         |long $sum = 0L;
         |if ($n >= $w) {
         |  java.util.HashMap $counts = new java.util.HashMap(${w * 2});
         |  int $d = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    UTF8String $t = $a.getUTF8String($i);
         |    Integer $c = (Integer) $counts.get($t);
         |    if ($c == null) { $counts.put($t, Integer.valueOf(1)); $d++; }
         |    else { $counts.put($t, Integer.valueOf($c.intValue() + 1)); }
         |    if ($i >= $w) {
         |      UTF8String $u = $a.getUTF8String($i - $w);
         |      Integer $cu = (Integer) $counts.get($u);
         |      if ($cu.intValue() == 1) { $counts.remove($u); $d--; }
         |      else { $counts.put($u, Integer.valueOf($cu.intValue() - 1)); }
         |    }
         |    if ($i >= ${w - 1}) $sum += $d;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WindowDistinctSumFns {

  /** `windowDistinctSum(tokens, w)` as a Column: Σ per-window distinct
    * counts over all complete w-token sliding windows, 0 when the
    * array is shorter than w. */
  def windowDistinctSum(tokens: Column, window: Int): Column =
    ColumnBridge.column(
      WindowDistinctSum(ColumnBridge.expression(tokens), window))
}
