package graft
// Dev probe: what does the transformWithState/RocksDB port of streaming
// near-dup detection cost vs the fMGWS/default-store face, at identical
// semantics? Drives the same duplicated corpus through both operators in
// micro-batches and reports wall time + hit parity. The SkewProbe
// standard: honest numbers, either direction, recorded in SURVEY.
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // synthetic corpus with planted duplicate groups: every 10th doc is a
    // near-clone of its group head, so hits scale linearly
    val nDocs = args.headOption.map(_.toInt).getOrElse(3000)
    val batches = 6
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
      "omicron", "pi", "rho", "sigma", "tau", "upsilon")
    def docText(i: Int): String = {
      val g = i / 10 // group: same base text per group
      val base = (0 until 20).map(j => words((g * 7 + j * 3) % words.length))
      // doc 0 of the group is the head; others flip one word
      val t = if (i % 10 == 0) base
        else base.updated(i % 10 + 5, words((i * 13) % words.length))
      t.mkString(" ")
    }
    val rows = (0 until nDocs).map(i =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), docText(i)))

    def drive(label: String, mk: DataFrame => DataFrame): (Long, Double) = {
      val ms = MemoryStream[(Long, Timestamp, String)]
      val out = mk(ms.toDF().toDF("doc_id", "ts", "text"))
      val name = s"probe_${label.replaceAll("[^a-z]", "")}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      rows.grouped(nDocs / batches).foreach { b =>
        ms.addData(b.toSeq: _*); q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      (spark.table(name).count(), secs)
    }

    for (round <- 1 to 2) {
      println(s"--- round $round (docs=$nDocs, batches=$batches) ---")
      val (hitsF, tF) = drive("fmgws",
        df => StreamOps.nearDupDetect(df, threshold = 0.7).toDF())
      println(f"STREAMPROBE fMGWS/default  $tF%6.2f s  hits=$hitsF")
      val (hitsT, tT) = drive("tws",
        df => StreamOps.nearDupDetectTws(df, threshold = 0.7).toDF())
      println(f"STREAMPROBE TWS/RocksDB    $tT%6.2f s  hits=$hitsT")
      println(s"  hit parity: ${hitsF == hitsT}")
    }
    spark.stop()
  }
}
