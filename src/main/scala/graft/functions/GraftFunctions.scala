package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL REGISTRATION for the native codegen'd kernels (round 12 — the
  * function-side completion of the DataSource V2 story: the catalog
  * face made the persisted substrates reachable from raw SQL, this
  * makes the engine's scalar kernels reachable too, so a SQL-only user
  * gets the identical codegen'd per-row code the Column API plans —
  * not a UDF shim):
  *
  * {{{
  *   GraftFunctions.register(spark)       // per session, or
  *   // --conf spark.sql.extensions=graft.plans.GraftExtensions
  *   spark.sql("SELECT graft_md5low48(text) % 100 AS bucket FROM t")
  * }}}
  *
  * Functions (names prefixed `graft_` to stay clear of builtins):
  *  - `graft_parse_money(s)`   → DECIMAL(18,2) ([[ParseMoney]]: one
  *    strip-and-convert pass over "  1,234.56 "-style text, null on
  *    malformed input)
  *  - `graft_md5low48(s)`      → BIGINT, md5 digest bytes 8..13 LE
  *  - `graft_md5low64(s)`      → BIGINT, md5 digest bytes 9..16 LE
  *  - `graft_bpe_count(s)`     → INT BPE token count ([[BpeTokenCount]];
  *    lower-casing is part of the published semantics, applied here
  *    like the Column face does)
  *  - `graft_vec_dot(a, b)`    → DOUBLE ([[VecDot]], float arrays)
  *  - `graft_winnow(s, k, w)`  → ARRAY<BIGINT> winnowed fingerprints
  *    (k/w must be INT literals — they parameterize codegen)
  *
  * Registration goes through the session's own FunctionRegistry (the
  * temp-function namespace — same mechanism `CREATE TEMPORARY FUNCTION`
  * uses), or cluster-wide via `injectFunction` in
  * [[graft.plans.GraftExtensions]]. Both routes build the SAME
  * Expression the Column API builds; analysis, folding
  * ([[FoldParseMoneyLiterals]]) and whole-stage codegen see no
  * difference.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal (it parameterizes codegen), got: $other")
  }

  private def one(name: String)(f: Expression => Expression)
      : FunctionBuilder = {
    case Seq(c) => f(c)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  /** (name, usage, builder) for every SQL-exposed kernel. */
  val all: Seq[(String, String, FunctionBuilder)] = Seq(
    ("graft_parse_money",
      "graft_parse_money(s) - parses '  1,234.56 '-style money text " +
        "to DECIMAL(18,2) (null on malformed input)",
      one("graft_parse_money")(ParseMoney(_))),
    ("graft_md5low48",
      "graft_md5low48(s) - the low 48 bits of md5(s), little-endian " +
        "(engine-portable: DuckDB md5_number_lower(s) % 2^48)",
      one("graft_md5low48")(Md5Low(_, 6))),
    ("graft_md5low64",
      "graft_md5low64(s) - md5 digest bytes 9-16 as a little-endian " +
        "BIGINT (DuckDB md5_number_lower up to int64 wraparound)",
      one("graft_md5low64")(Md5Low(_, 8))),
    ("graft_bpe_count",
      "graft_bpe_count(s) - BPE token count of lower(s) under the " +
        "fixed published merges table",
      one("graft_bpe_count")(c => BpeTokenCount(
        org.apache.spark.sql.catalyst.expressions.Lower(c)))),
    ("graft_vec_dot",
      "graft_vec_dot(a, b) - dot product of two ARRAY<FLOAT> vectors " +
        "as DOUBLE, one codegen'd pass",
      {
        case Seq(a, b) => VecDot(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_vec_dot expects 2 arguments, got ${args.length}")
      }),
    ("graft_winnow",
      "graft_winnow(s, k, w) - winnowed rolling-hash fingerprints of s " +
        "(k-byte grams, window w); any shared substring of length >= " +
        "k + w - 1 shares a fingerprint",
      {
        case Seq(c, k, w) => WinnowFingerprints(c,
          intLit(k, "graft_winnow k"), intLit(w, "graft_winnow w"))
        case args => throw new IllegalArgumentException(
          s"graft_winnow expects 3 arguments, got ${args.length}")
      }))

  /** The injectFunction triples for [[graft.plans.GraftExtensions]]. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    all.map { case (name, usage, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name, usage),
        builder)
    }

  /** Register every kernel in `spark`'s temp-function namespace —
    * idempotent (createOrReplace), session-scoped. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
