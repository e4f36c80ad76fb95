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
}
