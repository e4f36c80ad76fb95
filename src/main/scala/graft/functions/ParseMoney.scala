package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Shared parse kernel, called from both interpreted eval and generated
  * code (object methods compile to static forwarders, so codegen can call
  * `graft.functions.MoneyParseUtil.parse(...)` directly). */
object MoneyParseUtil {
  /** "  1,000,000.00 " → Decimal(18,2); empty/unparseable → null. One
    * pass to strip spaces/commas, no regex. */
  def parse(s: UTF8String): Decimal = {
    if (s == null) return null
    val raw = s.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != ' ' && c != ',') sb.append(c)
      i += 1
    }
    if (sb.length == 0) return null
    try {
      val bd = new java.math.BigDecimal(sb.toString)
        .setScale(2, java.math.RoundingMode.HALF_UP)
      val d = Decimal(bd)
      if (d.changePrecision(18, 2)) d else null
    } catch {
      case _: NumberFormatException => null
    }
  }
}

/** Native Catalyst expression for the reference's money-string parse
  * (`source/configure_rds_lambda` CSV amounts like "  1,000,000.00 ",
  * SURVEY.md §2.7/§4): single-pass strip + decimal convert, with full
  * whole-stage-codegen support — no regex engine, no UDF serialization.
  *
  * This is the (b) tier of the custom-operator ladder: a scalar Spark
  * lacks, cheap enough to keep inside the codegen'd pipeline.
  */
case class ParseMoney(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(18, 2)
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_money expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MoneyParseUtil.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val util = MoneyParseUtil.getClass.getName.stripSuffix("$")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.types.Decimal ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = $util.parse(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseMoney =
    copy(child = newChild)
}

object ParseMoney {
  /** Column-API entry point (classic-session bridge from Expression to the
    * Spark 4 Column API). */
  def parse_money(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ParseMoney(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

/** Optimizer rule (tier (c) of the custom ladder, SURVEY.md §7.3): folds
  * `parse_money` of a literal to its parsed constant at plan time, the
  * same way Catalyst's ConstantFolding handles built-ins — custom
  * expressions aren't covered by it unless they declare foldability, and
  * folding here keeps literal thresholds out of the per-row path. */
object FoldParseMoneyLiterals
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ParseMoney(l @ Literal(_, StringType)) =>
        Literal.create(
          MoneyParseUtil.parse(l.value.asInstanceOf[UTF8String]),
          DecimalType(18, 2))
    }
}

/** SparkSessionExtensions hook: registers the engine's native functions
  * for SQL use. `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldParseMoneyLiterals)
    e.injectFunction((
      FunctionIdentifier("parse_money"),
      new ExpressionInfo(classOf[ParseMoney].getName, "parse_money"),
      (exprs: Seq[Expression]) => ParseMoney(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[Expression]) => {
        def lit(i: Int): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => sys.error(s"winnow_fingerprints arg ${i + 1} must be an int literal, got $other")
        }
        WinnowFingerprints(exprs.head,
          if (exprs.length > 1) lit(1) else 16,
          if (exprs.length > 2) lit(2) else 8)
      }))
  }
}
