package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the BPE kernel's merge semantics (the oracle contract: the q37
  * DuckDB recomputation replays the same REPLACE-fixpoint loop from the
  * same merges table — any kernel change that breaks these fixtures must
  * fail HERE, not at the driver). */
class BpeTokenCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(texts: String*): Seq[Long] =
    texts.toDF("text")
      .select(BpeTokenCount.bpe_token_count(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq

  test("multi-level merges collapse common words to one unit") {
    // t+h -> th, th+e -> the; a+n -> an, an+d -> and; i+n -> in, in+g -> ing
    assert(counts("the", "and", "ing") == Seq(1L, 1L, 1L))
  }

  test("unmergeable runs count one unit per residual piece") {
    // 'x', 'y', 'z' never appear in the merges table
    assert(counts("xyz") == Seq(3L))
    // 'st' merges, then 'st'+'x' has no rule: s-t-x -> st, x
    assert(counts("stx") == Seq(2L))
  }

  test("pre-tokenization: symbols count singly, whitespace splits, case folds") {
    // "don't stop" -> don['t] ... d+o? no rule; o+n -> on; d,on | ' | t | st,op
    val Seq(n) = counts("Don't STOP!")
    // don -> d,on (2) + ' (1) + t (1) + stop -> st,o,p? s+t->st; o+p no rule;
    // st,o,p (3) + ! (1) = 8
    assert(n == 8L)
  }

  test("digit merges and the repeated-pair fixpoint") {
    // 2000: 0+0 merges leftmost non-overlapping, fixpoint leaves 2,00,0
    assert(counts("2000") == Seq(3L))
    // 1999: 1+9 -> 19; remaining 9,9 have no rule: 19,9,9
    assert(counts("1999") == Seq(3L))
  }

  test("empty, whitespace-only and null-safe inputs") {
    assert(counts("", "   \t\n  ") == Seq(0L, 0L))
    val n = Seq[Option[String]](None).toDF("text")
      .select(BpeTokenCount.bpe_token_count(col("text")).as("n"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("counts are stable between interpreted eval and codegen") {
    val df = Seq("the quick brown fox", "2000 leagues", "héllo wörld").toDF("text")
    val plain = df.select(BpeTokenCount.bpe_token_count(col("text"))).collect().map(_.getLong(0)).toSeq
    // grouped aggregation forces a different (codegen'd) evaluation path
    val viaAgg = df.groupBy(col("text"))
      .agg(max(BpeTokenCount.bpe_token_count(col("text"))).as("n"))
      .orderBy(col("text")).collect().map(_.getLong(1)).toSeq
    assert(plain.sorted == viaAgg.sorted)
  }
}
