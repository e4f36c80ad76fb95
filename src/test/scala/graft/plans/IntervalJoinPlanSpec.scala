package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom sweep-line interval join (IntervalJoinNode →
  * IntervalJoinStrategy → IntervalJoinExec): hand-built edge shapes, the
  * planned exchange/sort shape, pushdown/pruning through the node, and
  * equivalence with the declarative equi+range join on real data.
  */
class IntervalJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def intervals = Seq(
    // key, start, end, tag
    ("a", 0L, 10L, "i1"), ("a", 5L, 15L, "i2"), ("a", 20L, 20L, "empty"),
    ("b", 0L, 100L, "i3"),
    (null.asInstanceOf[String], 0L, 50L, "inull")
  ).toDF("k", "s", "e", "tag")

  private def points = Seq(
    ("a", 4L), ("a", 5L), ("a", 12L), ("a", 20L),
    ("b", 99L), ("b", 100L),
    ("c", 1L),
    (null.asInstanceOf[String], 3L)
  ).toDF("k", "p")

  private def run() =
    Interval.join(intervals, points, "k", "s", "e", "p")
      .select(col("k"), col("p"), col("tag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  test("half-open [start, end) matching, empty intervals and nulls never match") {
    assert(run() == Set(
      ("a", 4L, "i1"),              // only i1 open at 4
      ("a", 5L, "i1"), ("a", 5L, "i2"), // both open at 5
      ("a", 12L, "i2"),             // i1 closed (10 <= 12)
      // p=20: i2 closed at 15; "empty" [20,20) matches nothing
      ("b", 99L, "i3")              // 100 is excluded: end is exclusive
      // c has no intervals; null keys never match either side
    ))
  }

  test("plan contains IntervalJoinExec with both sides exchanged and sorted") {
    val df = Interval.join(intervals, points, "k", "s", "e", "p")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"))
    assert("(?s)Exchange hashpartitioning".r.findAllIn(plan).size >= 2)
    assert("(?s)Sort \\[".r.findAllIn(plan).size >= 2)
  }

  test("downstream groupBy on the surviving key reuses the join's exchange") {
    // outputPartitioning advertises BOTH children's clusterings
    // (PartitioningCollection, round-7 ADVICE): an aggregation keyed on
    // the LEFT key — the one the API keeps after dropping __iv_key —
    // must not add a third exchange on top of the join's two.
    val agg = Interval.join(intervals, points, "k", "s", "e", "p")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"))
    assert("(?s)Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly the join's two exchanges:\n$plan")
    // and the result is still right
    val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 1L))
  }

  test("filters push into BOTH children of the inner join") {
    val joined = Interval.join(intervals, points, "k", "s", "e", "p")
      .filter(col("tag") =!= "i2" && col("p") < 50)
    val opt = joined.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[IntervalJoinNode] => f }.isEmpty,
      s"filter not pushed:\n$opt")
    assert(joined.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("p")))
      .toSet == Set(("a", 4L), ("a", 5L)))
  }

  test("projection prunes unused payload columns from both children") {
    val wideI = intervals.withColumn("ipay", lit("x"))
    val wideP = points.withColumn("ppay", lit("y"))
    val joined = Interval.join(wideI, wideP, "k", "s", "e", "p")
      .select(col("k"), col("p"), col("tag"))
    val node = joined.queryExecution.optimizedPlan.collectFirst {
      case j: IntervalJoinNode => j }.get
    val childCols = (node.left.output ++ node.right.output).map(_.name).toSet
    assert(!childCols.contains("ipay") && !childCols.contains("ppay"), s"$childCols")
  }

  test("equivalent to the declarative equi+range join on the orders table") {
    val d = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$d/orders.parquet")
    val ivs = o.select(col("o_custkey"), col("o_orderdate").as("ws"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("we"), col("o_orderkey").as("ok1"))
    val pts = o.select(col("o_custkey"), col("o_orderdate").as("pd"),
      col("o_orderkey").as("ok2"))
    val got = Interval.join(ivs, pts, "o_custkey", "ws", "we", "pd")
      .select(col("ok1"), col("ok2"))
    val want = ivs.as("a").join(pts.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
        col("pd") >= col("ws") && col("pd") < col("we"))
      .select(col("ok1"), col("ok2"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("many concurrent intervals per key emit the full per-point fan-out") {
    // 50 nested intervals [i, 200-i) on one key: point 100 hits all 50;
    // point 5 hits only the 6 with start <= 5
    val ivs = (0L until 50L).map(i => ("k", i, 200L - i, i)).toDF("k", "s", "e", "id")
    val pts = Seq(("k", 100L), ("k", 5L)).toDF("k", "p")
    val out = Interval.join(ivs, pts, "k", "s", "e", "p")
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(100L -> 50L, 5L -> 6L))
  }
}
