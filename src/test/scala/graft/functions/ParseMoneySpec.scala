package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.CsvNormalize

class ParseMoneySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "  1,000,000.00 ", "  133,900.00 ", "  500.50 ", "-4,899.50",
    "0", "42", "  ,  ", "", null, "abc", "1.005", "999999999999999999999.99")

  test("native expression matches the built-ins composition on all cases") {
    val df = cases.toDF("s")
      .withColumn("native", ParseMoney.parse_money(col("s")))
      .withColumn("composed", CsvNormalize.moneyColComposed(col("s")))
    val mismatched = df.filter(
      !(col("native") <=> col("composed")))
    assert(mismatched.count() == 0, mismatched.collect().mkString(","))
  }

  test("parses reference-shaped amounts exactly") {
    val r = Seq("  1,000,000.00 ").toDF("s")
      .select(ParseMoney.parse_money(col("s"))).collect()(0)
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("1000000.00")) == 0)
  }

  test("empty and garbage go to null; overflow goes to null") {
    val r = Seq("", "abc", "999999999999999999999.99").toDF("s")
      .select(ParseMoney.parse_money(col("s")).as("v"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("SQL registration via GraftExtensions") {
    // getOrCreate reuses the default session and ignores extensions;
    // clear it so a fresh session (same SparkContext) applies them.
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = s2.sql("SELECT parse_money('  1,234.56 ') AS v").collect()(0)
      assert(out.getDecimal(0).compareTo(new java.math.BigDecimal("1234.56")) == 0)
      val dot = s2.sql("SELECT vec_dot(array(1.5D, 2.5D), array(2.0D, 3.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 10.5)
      val fps = s2.sql("SELECT winnow_fingerprints('the quick brown fox jumps over the lazy dog', 8, 4) AS f")
        .collect()(0).getSeq[Long](0)
      assert(fps.nonEmpty)
      // optimizer rule: parse_money of a literal folds to a constant
      val optimized = s2.sql("SELECT parse_money(' 9,999.99 ') AS v")
        .queryExecution.optimizedPlan
      assert(!optimized.toString.contains("parsemoney"),
        s"expected literal fold, got: $optimized")
      assert(optimized.toString.contains("9999.99"))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("codegen path: works inside a filter+project pipeline (no fallback errors)") {
    val n = spark.range(10000)
      .withColumn("s", concat(lit("  "), format_number(col("id") * 1000, 2), lit(" ")))
      .withColumn("v", ParseMoney.parse_money(col("s")))
      .filter(col("v") > 100000)
      .count()
    assert(n > 0)
  }
}
