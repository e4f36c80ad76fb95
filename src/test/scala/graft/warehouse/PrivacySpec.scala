package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Privacy audits (q186/q187): k-anonymity group sizes and l-diversity
  * of the sensitive attribute — edge cases the TPC-H-ish testdata does
  * not exercise (sf0.01 has no group under the diversity floor).
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k-anonymity: singleton and small groups flagged, large groups pass") {
    val df = (Seq.fill(5)(("US", "AUTO")) ++ Seq.fill(2)(("US", "HOME")) ++
      Seq(("FR", "AUTO"))).toDF("nation", "segment")
    val got = QualityQueries.kAnonymity(df, Seq("nation", "segment"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("US", "AUTO")) == ((5L, true)))
    assert(got(("US", "HOME")) == ((2L, false)))
    assert(got(("FR", "AUTO")) == ((1L, false)))
  }

  test("l-diversity: a large but homogeneous group still fails") {
    // 10 rows, all the same sensitive value -> k-anonymous at k=3 but
    // NOT 2-diverse; a 3-row group with 3 distinct values passes.
    val df = (Seq.fill(10)(("US", "LOW")) ++
      Seq(("FR", "LOW"), ("FR", "MED"), ("FR", "HIGH"))).toDF("nation", "prio")
    val got = QualityQueries.lDiversity(df, Seq("nation"), "prio", l = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("US") == ((10L, 1L, false)))
    assert(got("FR") == ((3L, 3L, true)))
  }

  test("l-diversity: null sensitive values do not count as a distinct value") {
    val df = Seq(("US", Some("LOW")), ("US", None), ("US", None))
      .toDF("nation", "prio")
    val got = QualityQueries.lDiversity(df, Seq("nation"), "prio", l = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // countDistinct skips nulls on both engines
    assert(got("US") == 1L)
  }
}
