package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two SORTED, duplicate-free long arrays via
  * a single merge-intersection pass: |a∩b| / (|a| + |b| − |a∩b|).
  *
  * The composable form `size(array_intersect(a,b)) /
  * size(array_union(a,b))` builds two hash sets AND two output arrays per
  * row just to take their sizes — at 100 TB the verification Jaccard runs
  * once per candidate pair, making it the inner loop of every MinHash-LSH
  * dedup (~3 s of q45's sf0.1 runtime before this). The merge pass is
  * allocation-free and O(|a|+|b|), the (b)-tier treatment of SURVEY §7.3.
  *
  * Contract: both inputs ascending-sorted with distinct elements (e.g.
  * `sort_array(collect_set(…))`). Null elements are excluded from BOTH the
  * intersection and the union denominator (round-2 advice: skipping them
  * only in the intersection silently deflated the Jaccard), so the result
  * is the set Jaccard of the non-null elements. Both effective sets
  * empty → 0.0 (no division by zero).
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes() = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects array<bigint> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var (i, j, inter) = (0, 0, 0)
    var (nullsA, nullsB) = (0, 0)
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { nullsA += 1; i += 1 }
      else if (b.isNullAt(j)) { nullsB += 1; j += 1 }
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    while (i < na) { if (a.isNullAt(i)) nullsA += 1; i += 1 }
    while (j < nb) { if (b.isNullAt(j)) nullsB += 1; j += 1 }
    val union = (na - nullsA) + (nb - nullsB) - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val union = ctx.freshName("union")
      val nullsA = ctx.freshName("nullsA")
      val nullsB = ctx.freshName("nullsB")
      s"""
        int $na = $a.numElements();
        int $nb = $b.numElements();
        int $i = 0; int $j = 0; int $inter = 0;
        int $nullsA = 0; int $nullsB = 0;
        while ($i < $na && $j < $nb) {
          if ($a.isNullAt($i)) { $nullsA++; $i++; }
          else if ($b.isNullAt($j)) { $nullsB++; $j++; }
          else {
            long $x = $a.getLong($i);
            long $y = $b.getLong($j);
            if ($x == $y) { $inter++; $i++; $j++; }
            else if ($x < $y) { $i++; }
            else { $j++; }
          }
        }
        while ($i < $na) { if ($a.isNullAt($i)) $nullsA++; $i++; }
        while ($j < $nb) { if ($b.isNullAt($j)) $nullsB++; $j++; }
        int $union = ($na - $nullsA) + ($nb - $nullsB) - $inter;
        ${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / ((double) $union);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  def jaccard_sorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
