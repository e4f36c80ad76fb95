package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class After(id: String, ticker: String, price: Double)
case class Env(op: String, key: String, after: After, ts: java.sql.Timestamp)
/** The WIDENED payload for the schema-evolution spec: upstream added
  * `region` mid-stream (the classic additive ALTER). */
case class After2(id: String, ticker: String, price: Double, region: String)
case class Env2(op: String, key: String, after: After2, ts: java.sql.Timestamp)

class EnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def env(op: String, id: String, price: Double = 1.0) =
    Env(op, id, After(id, "tick", price), ts(1700000000L))

  test("P1/T4: INSERT and MODIFY kept, REMOVE dropped") {
    val batch = Seq(
      env("INSERT", "a"), env("MODIFY", "a", 2.0),
      env("REMOVE", "b"), env("INSERT", "c")).toDF()
    val routed = Envelope.route(batch)
    assert(routed.count() == 3)
    assert(routed.filter(col("op") === "REMOVE").count() == 0)
  }

  test("P1: unknown op raises") {
    val batch = Seq(env("INSERT", "a"), env("BOGUS", "x")).toDF()
    val e = intercept[Exception] { Envelope.route(batch).count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Unknown CDC op")))
  }

  test("T4 faithful: replay accumulates, no dedup") {
    val batch = (1 to 8).map(i => env("INSERT", s"id$i")).toDF()
    val replay = (1 to 8).map(i => env("MODIFY", s"id$i", 9.0)).toDF()
    val landed = Envelope.afterImage(Envelope.route(batch))
      .unionByName(Envelope.afterImage(Envelope.route(replay)))
    assert(landed.count() == 16)
  }

  test("T4 improved: latestByKey compacts to one row per key") {
    val appended = Seq(
      env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("MODIFY", "a", 2.0).copy(ts = ts(200)),
      env("INSERT", "b", 5.0).copy(ts = ts(150))).toDF()
    val latest = Envelope.latestByKey(appended, col("key"), col("ts"))
    assert(latest.count() == 2)
    val a = latest.filter(col("key") === "a").select("after.price").collect()(0).getDouble(0)
    assert(a == 2.0)
  }
}
