package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join runs without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (t <- Seq("orders_b", "lineitem_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      val o = Tables.orders(spark, sf)
      val li = Tables.lineitem(spark, sf)
      assert(joined.count() == o.join(li, o("o_orderkey") === li("l_orderkey")).count())
      // aggregation on the bucket key also rides the bucketing: no exchange
      val aggPlan = spark.table("lineitem_b").groupBy("o_orderkey").count()
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed aggregation, got:\n$aggPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join on a pathologically skewed key") {
    // 10k rows, ALL with the same key — the worst case for a hash join.
    val skewed = spark.range(10000).select(lit(42L).as("k"), col("id").as("payload"))
    val dim = Seq((42L, "hot"), (7L, "cold")).toDF("k", "attr")
    val plain = skewed.join(dim, "k")
    val salted = Scale.saltedJoin(skewed, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("payload")).collect()(0).getLong(0) ==
      plain.agg(sum("payload")).collect()(0).getLong(0))
    // salt actually spreads the hot key across buckets
    val spread = skewed.withColumn("_salt",
      pmod(hash(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .groupBy("_salt").count().count()
    assert(spread == 8)
  }

  test("partial-salting skew join equals plain join in both routing regimes") {
    // one hot key (5k rows) + a uniform tail; dim has hot, cold and
    // unmatched keys
    val skewed = spark.range(6000).select(
      when(col("id") < 5000, lit(42L)).otherwise(col("id") % 10).as("k"),
      col("id").as("payload"))
    val dim = (Seq((42L, "hot")) ++ (0L to 10L).map(i => (i, s"c$i")))
      .toDF("k", "attr")
    val plain = skewed.join(dim, "k")
      .select(col("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    def runAt(threshold: Long) = Scale.skewJoin(skewed, dim, "k",
        salts = 8, hotThreshold = threshold)
      .select(col("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    // threshold 1000: key 42 routes hot, the tail routes cold
    assert(runAt(1000L) == plain)
    // threshold above every count: everything routes cold (plain path)
    assert(runAt(1000000L) == plain)
  }

  test("distributed global row number == single-partition window formulation") {
    import org.apache.spark.sql.expressions.Window
    // values with heavy ties; (v, id) is the total order
    val df = spark.range(5000).select(
      (col("id") % 97).as("v"), col("id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val viaScale = Scale.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn", partitions = 7)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(viaScale == viaWindow)
  }

  test("distributed global running sum == single-partition window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(5000).select(
      (col("id") % 97).as("v"), col("id"), (col("id") % 7 + 1).as("n"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df.withColumn("cum", sum(col("n")).over(w))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    val viaScale = Scale.withGlobalRunningSum(
        df, Seq(col("v"), col("id")), col("n"), "cum", partitions = 7)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(viaScale == viaWindow)
  }

  test("distributed global ntile == window NTILE for uneven and tiny inputs") {
    import org.apache.spark.sql.expressions.Window
    for ((rows, k) <- Seq((5003, 4), (10, 3), (2, 5))) {
      val df = spark.range(rows).select((col("id") % 13).as("v"), col("id"))
      val viaWindow = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
      val viaScale = Scale.withGlobalNtile(df, Seq(col("v"), col("id")), k, "t", partitions = 7)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
      assert(viaScale == viaWindow, s"rows=$rows k=$k")
    }
  }

  test("z-order write: every file gets a narrow envelope on BOTH cluster keys") {
    // 64×64 uniform grid: x and y are independent, the adversarial case
    // for any single-key sort.
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val grid = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"), col("id").as("payload"))
    Scale.writeZOrdered(grid, Seq("x", "y"), dir, files = 16, bits = 6)
    // nothing lost, helper columns dropped
    val back = spark.read.parquet(dir)
    assert(back.count() == 64 * 64 && back.columns.sorted.sameElements(
      Array("payload", "x", "y")))
    // per-file min/max envelopes (what row-group stats pushdown / a table
    // format's file index sees)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 16)
    val envelopes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def overlapping(xLo: Long, xHi: Long, yLo: Long, yHi: Long) =
      envelopes.count { case (xm, xx, ym, yx) =>
        xx >= xLo && xm <= xHi && yx >= yLo && ym <= yHi }
    // a 1/16-area box touches a couple of z-contiguous files, not all 16
    assert(overlapping(0, 15, 0, 15) <= 4,
      s"2-D box should prune most files, envelopes=${envelopes.toSeq}")
    // single-key predicates prune on EITHER dimension (a y-only filter
    // prunes nothing in an x-sorted layout)
    assert(overlapping(0, 15, Long.MinValue, Long.MaxValue) <= 8)
    assert(overlapping(Long.MinValue, Long.MaxValue, 0, 15) <= 8)
  }

  test("z-value interleaves quantile ranks, robust to skewed distributions") {
    // 3/4 of the mass on one hot x value: a linear min/max scale would put
    // all of it in one z-stripe; quantile ranks keep tiles balanced.
    val skewed = spark.range(4000).select(
      when(col("id") % 4 =!= 0, 999999L).otherwise(col("id")).as("x"),
      (col("id") % 100).as("y"), col("id"))
    val z = Scale.withZValue(skewed, Seq("x", "y"), "z", bits = 4, partitions = 7)
    assert(z.count() == 4000)
    // 8-bit z space (4 bits × 2 cols): distinct z values spread over the
    // full range, not collapsed into a corner
    val stats = z.agg(min("z"), max("z"), countDistinct("z")).collect()(0)
    assert(stats.getLong(0) >= 0L && stats.getLong(1) <= 255L)
    assert(stats.getLong(2) >= 64, s"z space should be well-populated: $stats")
  }
}
