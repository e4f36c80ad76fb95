package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom sweep-line interval-overlap join (OverlapJoinNode →
  * OverlapJoinStrategy → OverlapJoinExec): hand-built overlap shapes
  * (exactly-once emission, ties, nesting, empty intervals, nulls, key
  * isolation), the planned shape, rule pushdown/pruning, and equivalence
  * with the declarative equi+overlap join on real data.
  */
class OverlapJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def l = Seq(
    ("a", 0L, 10L, "l1"), ("a", 10L, 20L, "l2"),   // touching, not overlapping
    ("a", 5L, 6L, "l3"),                            // nested inside l1
    ("b", 0L, 100L, "l4"),
    ("b", 50L, 50L, "lempty"),                      // empty: never matches
    (null.asInstanceOf[String], 0L, 9L, "lnull")
  ).toDF("k", "s", "e", "ltag")

  private def r = Seq(
    ("a", 9L, 11L, "r1"),   // overlaps l1 ([9,10)) AND l2 ([10,11))
    ("a", 5L, 6L, "r2"),    // identical to l3; inside l1
    ("a", 20L, 30L, "r3"),  // touches l2 at 20: no overlap
    ("b", 99L, 200L, "r4"), // overlaps l4 on [99,100)
    ("c", 0L, 5L, "r5"),
    (null.asInstanceOf[String], 0L, 9L, "rnull")
  ).toDF("k", "s", "e", "rtag")

  private def run() =
    Overlap.join(l, r, "k", "s", "e", "s", "e")
      .select(col("ltag"), col("rtag")).collect()
      .map(x => (x.getString(0), x.getString(1)))

  test("overlap matrix: half-open semantics, nesting, ties, empties, nulls") {
    val got = run()
    assert(got.toSet == Set(
      ("l1", "r1"), ("l2", "r1"),
      ("l1", "r2"), ("l3", "r2"),
      ("l4", "r4")))
    // exactly-once: no duplicate pair emissions
    assert(got.length == got.toSet.size)
  }

  test("plan contains OverlapJoinExec with both sides exchanged and sorted") {
    val df = Overlap.join(l, r, "k", "s", "e", "s", "e")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OverlapJoin"))
    assert("(?s)Exchange hashpartitioning".r.findAllIn(plan).size >= 2)
    assert("(?s)Sort \\[".r.findAllIn(plan).size >= 2)
  }

  test("filters push into both children; projection prunes payloads") {
    val joined = Overlap.join(l, r, "k", "s", "e", "s", "e")
      .filter(col("ltag") =!= "l3" && col("rtag") =!= "r2")
    val opt = joined.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[OverlapJoinNode] => f }.isEmpty, s"$opt")
    assert(joined.select("ltag", "rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("l1", "r1"), ("l2", "r1"), ("l4", "r4")))

    val pruned = Overlap.join(l.withColumn("lpay", lit("x")),
        r.withColumn("rpay", lit("y")), "k", "s", "e", "s", "e")
      .select(col("ltag"), col("rtag"))
    val node = pruned.queryExecution.optimizedPlan.collectFirst {
      case j: OverlapJoinNode => j }.get
    val cols = (node.left.output ++ node.right.output).map(_.name).toSet
    assert(!cols.contains("lpay") && !cols.contains("rpay"), s"$cols")
  }

  test("equivalent to the declarative overlap join on the orders table") {
    val d = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$d/orders.parquet")
    val a = o.select(col("o_custkey"), col("o_orderdate").as("as_"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("ae"), col("o_orderkey").as("ak"))
    val b = o.select(col("o_custkey"), col("o_orderdate").as("bs"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("be"), col("o_orderkey").as("bk"))
    val got = Overlap.join(a, b, "o_custkey", "as_", "ae", "bs", "be")
      .select(col("ak"), col("bk"))
    val want = a.as("x").join(b.as("y"),
        col("x.o_custkey") === col("y.o_custkey") &&
        col("as_") < col("be") && col("bs") < col("ae"))
      .select(col("ak"), col("bk"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("deep nesting emits the full quadratic fan-out exactly once") {
    // 30 nested intervals on one key overlap pairwise: 30*30 pairs
    val ivs = (0L until 30L).map(i => ("k", i, 100L - i, i)).toDF("k", "s", "e", "id")
    val out = Overlap.join(ivs, ivs.withColumnRenamed("id", "id2"),
      "k", "s", "e", "s", "e")
    assert(out.count() == 900L)
  }
}
