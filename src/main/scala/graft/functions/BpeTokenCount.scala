package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token counting against a fixed merges table — the
  * token-budget primitive a training-data pipeline weights mixtures with
  * (the round-5 `bpeIshTokenCount` only counted pre-tokenization pieces;
  * this applies an actual merge loop on top of them).
  *
  * Algorithm (per pre-token, standard BPE encode): start from single
  * characters, repeatedly apply the LOWEST-RANK merge rule present
  * anywhere in the unit sequence — each application replaces every
  * leftmost-non-overlapping adjacent (a, b) unit pair with the merged
  * unit, exactly `String.replace` semantics on a `|`-separated unit
  * string — until no rule applies. Those semantics are deliberately the
  * ones a SQL engine reproduces verbatim (`REPLACE` + a recursive CTE),
  * so the q37 oracle recomputes the count from the SAME merges table
  * ([[BpeUtil.merges]] → generated `VALUES` list, the q57 shared-constant
  * pattern).
  *
  * Pre-tokenization: lowercase letter runs `[a-z]+`, digit runs `[0-9]+`,
  * and every other non-whitespace codepoint as a single unit (the classic
  * GPT-style split regex reduced to its deterministic core). Merge rules
  * only ever touch the alphanumeric runs.
  */
object BpeUtil {

  /** The merges table, rank = position. A tiny English-biased fixture —
    * real deployments would load a trained vocabulary; the MECHANISM
    * (rank-ordered merge loop) is what the engine contributes, and it is
    * shared verbatim with the SQL oracle. Multi-level rules (`th`+`e`,
    * `in`+`g`) only fire once their inputs have been formed, which is the
    * property that distinguishes BPE from plain n-gram chunking. */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "an" -> "d", "e" -> "n", "a" -> "t",
    "e" -> "s", "o" -> "u", "i" -> "t", "in" -> "g", "a" -> "r",
    "t" -> "o", "s" -> "t", "o" -> "f", "e" -> "d", "i" -> "s",
    "a" -> "l", "l" -> "e", "c" -> "o", "s" -> "e", "m" -> "e",
    "d" -> "e", "h" -> "i", "r" -> "i", "r" -> "o", "c" -> "h",
    "l" -> "l", "w" -> "h", "b" -> "e", "0" -> "0", "1" -> "9",
    "2" -> "0")

  // precomputed "|a|b|" -> "|ab|" forms, scanned in rank order
  private val pats: Array[(String, String)] =
    merges.map { case (a, b) => (s"|$a|$b|", s"|$a$b|") }.toArray

  private def isWs(c: Char): Boolean = // ASCII \s, as in Java/RE2 regex
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isAlpha(c: Char): Boolean = c >= 'a' && c <= 'z'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** BPE unit count of one alphanumeric run. */
  private def bpeUnits(run: String): Long = {
    if (run.length <= 1) return 1L
    val sb = new java.lang.StringBuilder(run.length * 2 + 1)
    sb.append('|')
    var i = 0
    while (i < run.length) { sb.append(run.charAt(i)).append('|'); i += 1 }
    var state = sb.toString
    var done = false
    while (!done) {
      var j = 0
      var applied = false
      while (!applied && j < pats.length) {
        val (pat, rep) = pats(j)
        if (state.contains(pat)) {
          // leftmost non-overlapping global replace; an occurrence whose
          // leading '|' was consumed by its left neighbor re-matches on
          // the next loop iteration (the fixpoint loop, not a pass count,
          // is the contract shared with the SQL recursion)
          state = state.replace(pat, rep)
          applied = true
        }
        j += 1
      }
      done = !applied
    }
    var bars = 0L
    var p = 0
    while (p < state.length) { if (state.charAt(p) == '|') bars += 1; p += 1 }
    bars - 1
  }

  /** Total BPE token count of a (pre-lowercased) document. Iterates by
    * codepoint so astral-plane symbols count once, as a regex engine
    * sees them. */
  def tokenCount(u: UTF8String): Long = {
    val s = u.toString
    val n = s.length
    var count = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (isAlpha(c)) {
        val start = i
        while (i < n && isAlpha(s.charAt(i))) i += 1
        count += bpeUnits(s.substring(start, i))
      } else if (isDigit(c)) {
        val start = i
        while (i < n && isDigit(s.charAt(i))) i += 1
        count += bpeUnits(s.substring(start, i))
      } else {
        count += 1
        i += Character.charCount(s.codePointAt(i))
      }
    }
    count
  }
}

/** Native codegen'd BPE-token-count expression. Input must already be
  * lowercased (the [[BpeTokenCount.bpe_token_count]] wrapper composes
  * `lower` so Spark's and the oracle's LOWER are the ones compared). */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeUtil.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = BpeUtil.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.tokenCount($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  import org.apache.spark.sql.functions.lower

  def bpe_token_count(c: Column): Column =
    GraftColumnBridge.column(BpeTokenCount(GraftColumnBridge.expression(lower(c))))
}
