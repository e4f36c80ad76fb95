package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared digest kernel, called from both interpreted eval and generated
  * code (object methods compile to static forwarders — the
  * [[MoneyParseUtil]] pattern). One MessageDigest per thread, one digest
  * per row, bytes combined directly — no 32-char hex materialization, no
  * per-byte `substring`/`conv` string parses. */
object Md5LowUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian combination of digest bytes 8..(8+nBytes-1) — the
    * LOWER half of the MD5 digest, matching DuckDB's `md5_number_lower`
    * (% 2^48 for nBytes=6; the full signed-64 wrap for nBytes=8). */
  def low(s: UTF8String, nBytes: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nBytes) {
      v |= (digest(8 + i) & 0xFFL) << (8 * i)
      i += 1
    }
    v
  }
}

/** Native codegen'd form of the engine's PORTABLE hash family
  * ([[graft.text.TextFunctions.portableHash48]] /
  * `portableTokenHash`) — round-10 verdict #3: the column-composed
  * `md5 → 6×(substring+conv+shiftleft)` form re-parses the hex string
  * per byte and dominated the q245/q237 estimator lines (both join
  * sides hash every key). This expression produces the IDENTICAL value
  * (bit-for-bit — Md5LowSpec pins it against the composed form, and the
  * q121/q166/q237/q245 oracles replay it as
  * `md5_number_lower(x) % 2^48`) in one digest pass per row, inside
  * whole-stage codegen.
  *
  * nBytes=6 keeps the value positive in a signed BIGINT on both engines
  * (the portable-bucket contract); nBytes=8 is the full lower half
  * (sign-irrelevant uses — SimHash token hashing).
  */
case class Md5Low(child: Expression, nBytes: Int) extends UnaryExpression {
  require(nBytes >= 1 && nBytes <= 8, s"nBytes must be in [1,8], got $nBytes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_low expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5LowUtil.low(input.asInstanceOf[UTF8String], nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = Md5LowUtil.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.low($c, $nBytes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Low =
    copy(child = newChild)
}

object Md5Low {
  /** Column-API entry points (classic-session bridge). */
  def low48(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5Low(org.apache.spark.sql.GraftColumnBridge.expression(c), 6))
  def low64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5Low(org.apache.spark.sql.GraftColumnBridge.expression(c), 8))
}
