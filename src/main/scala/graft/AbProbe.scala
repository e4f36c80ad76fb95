package graft

// A/B probe: each custom join exec vs the plan Spark's own planner picks
// for the identical predicate (SortMergeJoin on the key with the range
// half as a post-join filter). Diagnostic evidence, not engine surface.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"AB $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    val o = Tables.orders(spark, sfDir)
    val intervals = o.select(col("o_custkey"), col("o_orderdate").as("ws"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("we"), col("o_orderkey").as("ok1"))
    val points = o.select(col("o_custkey"), col("o_orderdate").as("pd"),
      col("o_orderkey").as("ok2"))
    time("warmup (orders scan)")(o.count())

    // q208 family: point-in-interval
    time("interval: custom sweep-line exec") {
      graft.plans.Interval.join(intervals, points, "o_custkey", "ws", "we", "pd")
        .filter(col("ok1") =!= col("ok2")).count()
    }
    time("interval: native SMJ + post-join range filter") {
      intervals.as("a").join(points.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
          col("pd") >= col("ws") && col("pd") < col("we"))
        .filter(col("ok1") =!= col("ok2")).count()
    }

    // q210 family: interval overlap (7-day windows of the same customer)
    val b2 = o.select(col("o_custkey"), col("o_orderdate").as("bs"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("be"), col("o_orderkey").as("bk"))
    time("overlap: custom sweep-line exec") {
      graft.plans.Overlap.join(intervals, b2, "o_custkey", "ws", "we", "bs", "be")
        .count()
    }
    time("overlap: native SMJ + post-join range filter") {
      intervals.as("a").join(b2.as("y"),
          col("a.o_custkey") === col("y.o_custkey") &&
          col("ws") < col("be") && col("bs") < col("we"))
        .count()
    }

    // q204 family: as-of (events purchases <- clicks), custom exec vs
    // the q25 union+window rewrite
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    time("asof: custom merge exec") {
      graft.plans.AsOf.join(purchases, clicks, "user_id",
        "event_id", "event_id", "last_click_id").count()
    }
    time("asof: union + running-max window rewrite") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_click_id",
          max(when(col("event_type") === "click", col("event_id"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("last_click_id")).count()
    }

    // Skew regime: ONE hot key with n intervals × n points (n defaults
    // to 100k; override via the first arg). The native plan enumerates
    // the n² same-key candidate pairs through the post-join filter; the
    // sweep touches O(n + matches) rows. This is the 100 TB shape (hot
    // entities, bursty windows) the custom execs exist for — the
    // flat-key runs above show the constants honestly favoring
    // codegen'd joins when per-key fan-out is tiny.
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val hotI = spark.range(n).select(lit("hot").as("k"),
      (col("id") * 10).as("s"), (col("id") * 10 + 50).as("e"), col("id").as("iid"))
    val hotP = spark.range(n).select(lit("hot").as("k"),
      (col("id") * 10 + 5).as("p"), col("id").as("pid"))
    time("interval SKEW n x n: custom sweep-line exec") {
      graft.plans.Interval.join(hotI, hotP, "k", "s", "e", "p").count()
    }
    time("interval SKEW n x n: native SMJ + filter") {
      hotI.as("a").join(hotP.as("b"), col("a.k") === col("b.k") &&
        col("p") >= col("s") && col("p") < col("e")).count()
    }

    spark.stop()
  }
}
