package graft
// Dev probe: is decremental maintenance actually cheaper than the
// rebuild it replaces? Measures, at sf0.1:
//  - LedgerStore.purgeDocs of a handful of docs vs a full ledger
//    rebuild over the remaining corpus (the alternative a store
//    without the verb forces), and
//  - GraphStore.purgeOrders of two baskets vs a full substrate rebuild.
// The SkewProbe standard: recorded numbers, either direction.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, LedgerStore}
import graft.warehouse.GraphStore
import graft.util.Tables

object PurgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PURGEPROBE $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- text dedup ledger ----
    val docs = Tables.documents(spark, sf)
    val ldir = java.nio.file.Files.createTempDirectory("purgeprobe-l").toString
    LedgerStore.maintainBatch(docs, col("doc_id"), col("text"), ldir,
      batchId = 0L) // build outside the measured window
    val gone = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSet
    time("ledger purgeDocs (5 docs)") {
      LedgerStore.purgeDocs(spark, ldir, gone.toSeq.toDF("doc_id"))
    }
    time("ledger FULL rebuild (remaining)") {
      val d = docs.filter(!col("doc_id").isin(gone.toSeq.map(java.lang.Long.valueOf): _*))
      val pairs = Dedup.minhashNearDups(d, col("doc_id"), col("text"),
        threshold = 0.5, bands = 16, maxBucketSize = Int.MaxValue)
      Dedup.components(pairs, col("a_id"), col("b_id")).count()
    }

    // ---- graph substrate ----
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"))
    val gdir = java.nio.file.Files.createTempDirectory("purgeprobe-g").toString
    GraphStore.maintainBatch(lines, col("ord"), col("item"), gdir,
      batchId = 0L)
    val goneOrds = lines.groupBy(col("ord")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ord")).limit(2)
      .collect().map(_.getLong(0)).toSet
    time("graph purgeOrders (2 baskets)") {
      GraphStore.purgeOrders(spark, gdir, goneOrds.toSeq.toDF("ord"))
    }
    time("graph FULL rebuild (remaining)") {
      val l = lines.filter(!col("ord").isin(goneOrds.toSeq.map(java.lang.Long.valueOf): _*))
      l.as("a").join(l.as("b"),
          col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
        .groupBy(col("a.item"), col("b.item")).count().count()
    }
    spark.stop()
  }
}
