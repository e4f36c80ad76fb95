package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JDBC seam is environment-blocked (no driver jar, no network) — the
  * option map IS the testable contract, plus the documented failure mode
  * when `.load()` is attempted without a driver. */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned snapshot read carries the parallel-load options") {
    val opts = JdbcSource.options(
      url = "jdbc:mysql://db.example.internal:3306/trades",
      table = "txns",
      user = "reader", password = "secret",
      partitioning = Some(JdbcSource.RangePartitioning("txn_id", 0L, 1000000L, 16)),
      fetchSize = 5000)
    assert(opts("partitionColumn") == "txn_id")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "1000000")
    assert(opts("numPartitions") == "16")
    assert(opts("fetchsize") == "5000")
    assert(opts("pushDownPredicate") == "true")
    assert(opts("dbtable") == "txns")
  }

  test("unpartitioned read omits the partitioning keys") {
    val opts = JdbcSource.options("jdbc:mysql://h/d", "t", "u", "p")
    assert(!opts.contains("partitionColumn"))
    assert(!opts.contains("numPartitions"))
  }

  test("invalid partitioning is rejected at construction") {
    intercept[IllegalArgumentException] {
      JdbcSource.RangePartitioning("id", 10L, 0L, 4)
    }
    intercept[IllegalArgumentException] {
      JdbcSource.RangePartitioning("id", 0L, 10L, 0)
    }
  }

  test("load without a driver fails with the documented error, not a hang") {
    val e = intercept[Exception] {
      JdbcSource.read(spark, "jdbc:mysql://db.example.internal:3306/trades",
        "txns", "u", "p").schema
    }
    // no MySQL driver jar in this sandbox: the seam surfaces a clear
    // driver-resolution error instead of attempting a network connection
    val msg = (e.getMessage + " " + Option(e.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("driver") || msg.contains("jdbc"), s"unexpected: $e")
  }
}
