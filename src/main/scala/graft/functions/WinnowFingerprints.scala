package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel: Rabin-Karp rolling hashes over the utf-8 bytes +
  * winnowing (per-window minimum sampling, Schleimer et al. 2003).
  * O(n) per document via a monotonic deque; called from both interpreted
  * eval and generated code. */
object WinnowUtil {
  /** Polynomial base. Public because the q57 oracle SQL is GENERATED from
    * it (graft.text.TextQueries derives the B^p mod 2^64 constants), so
    * the Spark kernel and the DuckDB recomputation can never drift. */
  val B = 257L

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    // B^(k-1) for the rolling subtraction (64-bit wraparound arithmetic)
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xFF) * bk) * B + (bytes(i + k - 1) & 0xFF)
      hashes(i) = h
      i += 1
    }
    if (m <= w) {
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    // winnow: min of each w-window, deduping consecutive picks
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    val deque = new java.util.ArrayDeque[Int]
    i = 0
    while (i < m) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) {
        val pick = hashes(deque.peekFirst())
        if (out.isEmpty || out.last != pick) out += pick
        ()
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native winnowing-fingerprint expression (builder contract: "document
  * fingerprinting (rolling hash)"): one codegen'd pass per document
  * producing the sampled fingerprint set. Two documents sharing content
  * share fingerprints — the MOSS-style containment-dedup primitive,
  * complementary to MinHash (resemblance) and md5 (exactness).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = WinnowUtil.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.fingerprints($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** k = gram width (bytes), w = winnowing window; guarantees any match of
    * length >= k + w - 1 shares at least one fingerprint. */
  def winnow_fingerprints(c: Column, k: Int = 16, w: Int = 8): Column =
    GraftColumnBridge.column(WinnowFingerprints(GraftColumnBridge.expression(c), k, w))
}
