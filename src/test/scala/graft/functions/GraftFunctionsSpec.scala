package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL faces of the native kernels: registering through
  * [[GraftFunctions.register]] (or the extensions hook) must hand SQL
  * users the IDENTICAL expression the Column API plans — value parity
  * on real data, codegen intact, loud arity/literal errors. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.util.Tables.documents(spark, d)

  test("every SQL face equals its Column-API twin on real data") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    graft.util.Tables.embeddings(spark, d)
      .createOrReplaceTempView("gf_embs")

    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_md5low48(text) AS h48,
        |  graft_md5low64(text) AS h64,
        |  graft_bpe_count(text) AS bpe,
        |  graft_winnow(text, 16, 8) AS fp
        |FROM gf_docs ORDER BY doc_id""".stripMargin).collect()
    val viaCol = docs.select(col("doc_id"),
        Md5Low.low48(col("text")).as("h48"),
        Md5Low.low64(col("text")).as("h64"),
        BpeTokenCount.bpe_token_count(col("text")).as("bpe"),
        WinnowFingerprints.winnow_fingerprints(col("text")).as("fp"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
      assert(a.getLong(3) == b.getLong(3)) // BpeTokenCount widens to long
      assert(a.getSeq[Long](4) == b.getSeq[Long](4))
    }

    // money parsing: literal faces (the FoldParseMoneyLiterals rule
    // covers the Column path; the SQL path builds the same expression)
    val m = spark.sql(
      """SELECT graft_parse_money('  1,234.56 ') AS a,
        |  graft_parse_money('-2.505') AS b,
        |  graft_parse_money('nonsense') AS c""".stripMargin).head
    assert(m.getDecimal(0).compareTo(new java.math.BigDecimal("1234.56")) == 0)
    assert(m.getDecimal(1).compareTo(new java.math.BigDecimal("-2.51")) == 0)
    assert(m.isNullAt(2))

    // vector kernel over the embeddings table
    val dots = spark.sql(
      """SELECT vec_id, graft_vec_dot(embedding, embedding) AS n2
        |FROM gf_embs ORDER BY vec_id LIMIT 50""".stripMargin).collect()
    val dotsCol = graft.util.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        VecDot.vec_dot(col("embedding"), col("embedding")).as("n2"))
      .orderBy(col("vec_id")).limit(50).collect()
    dots.zip(dotsCol).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1)) // bit-identical, same kernel
    }
  }

  test("SQL faces stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs2")
    val plan = spark.sql(
      "SELECT graft_md5low48(text) AS h FROM gf_docs2 WHERE doc_id < 10")
      .queryExecution.executedPlan.toString
    // the tree render marks a codegen'd stage with the *(n) prefix
    assert(plan.contains("*(1) Project [md5low"),
      s"SQL face fell out of codegen:\n${plan.take(1200)}")
  }

  test("arity and literal-parameter misuse fail loudly at analysis") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs3")
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_md5low48(text, 3) FROM gf_docs3").collect())
    assert(e1.getMessage.contains("1 argument"))
    val e2 = intercept[Exception](
      spark.sql(
        "SELECT graft_winnow(text, doc_id, 8) FROM gf_docs3").collect())
    assert(String.valueOf(e2.getMessage).contains("INT literal") ||
      String.valueOf(e2.getMessage).contains("cannot resolve"))
  }
}
