package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over numeric array columns (`Array[Float]` /
  * `Array[Double]`), accumulating left-to-right in double precision.
  *
  * The composition `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct
  * but interpreted (higher-order functions are CodegenFallback) and
  * allocates an intermediate array per row — at 100 TB the dot product IS
  * the inner loop of every similarity scan, so it gets the (b)-tier
  * treatment (SURVEY.md §7.3): a tight generated loop, no allocation.
  * Null elements contribute 0; length mismatch uses the common prefix —
  * same semantics as the zip_with composition.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes() = {
    // Decimal excluded: the generated `(double)` cast only compiles for
    // primitive element types (a Decimal element would silently force the
    // interpreted fallback); cast decimal arrays to double upstream.
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: DecimalType, _) => false
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects non-decimal numeric arrays, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += toDouble(a, i, lt) * toDouble(b, i, rt)
      }
      i += 1
    }
    acc
  }

  private def toDouble(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case ByteType => arr.getByte(i).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val la = CodeGenerator.getValue(a, elemType(left), i)
      val lb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $acc += ((double)($la)) * ((double)($lb));
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  // DISPLAY ONLY (round 17, measured): the LSH plane vectors ride into
  // plans as 64-element array LITERALS (16 of them per bandKeys call),
  // and every action stringifies its plan for the SQL-execution event —
  // Literal.toString → GenericArrayData.toString materialized the full
  // arrays so often that driver thread dumps showed plan stringification
  // as the top frame: one semantic-ledger refresh fold spent ~24 of 29 s
  // BETWEEN jobs (119 jobs, 5.3 s job wall, 4.3 s task time), much of it
  // here. Eliding literal-array children cuts that cost at the source
  // for every vec_dot site. `sql` is deliberately NOT overridden:
  // auto-generated column names derive from sql, and changing those
  // would change result schemas.
  override def toString: String = {
    def short(e: Expression): String = e match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType.isInstanceOf[ArrayType] =>
        val n = l.value match {
          case a: ArrayData => a.numElements().toString
          case _ => "?"
        }
        s"array_lit<${l.dataType.asInstanceOf[ArrayType].elementType.simpleString}>[$n]"
      case other => other.toString
    }
    s"vec_dot(${short(left)}, ${short(right)})"
  }
}

object VecDot {
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
