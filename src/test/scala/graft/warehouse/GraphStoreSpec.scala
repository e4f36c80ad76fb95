package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** The persisted graph substrate (delta-store): folded pair counts ≡ the
  * full basket-pair rebuild, exactly-once folds, compaction identity
  * (pre-aggregated slice), vacuum, and the streaming face.
  */
class GraphStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def lines = Tables.lineitem(spark, sf)
    .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"),
      col("l_linenumber").cast("long").as("ln"))

  /** Full line-level rebuild over the folded slices (no threshold). */
  private def fullPairs(pred: org.apache.spark.sql.Column): Map[(Long, Long), Long] =
    lines.filter(pred).as("a")
      .join(lines.filter(pred).as("b"),
        col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("u"), col("b.item").as("v"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def storedPairs(dir: String): Map[(Long, Long), Long] =
    GraphStore.load(spark, dir)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("folds maintain rebuild parity; replays are no-ops; compact is " +
      "invisible and pre-aggregates; vacuum retires slices") {
    val dir = Files.createTempDirectory("graphstore").toString
    assert(GraphStore.maintainBatch(lines.filter(col("ln") === 1),
      col("ord"), col("item"), dir, batchId = 0L).contains(0L))
    assert(storedPairs(dir) == fullPairs(col("ln") === 1))
    assert(GraphStore.maintainBatch(lines.filter(col("ln") === 2),
      col("ord"), col("item"), dir, batchId = 1L).contains(1L))
    assert(storedPairs(dir) == fullPairs(col("ln") <= 2))
    assert(GraphStore.maintainBatch(lines.filter(col("ln") > 2),
      col("ord"), col("item"), dir, batchId = 2L).contains(2L))
    val full = fullPairs(lit(true))
    assert(storedPairs(dir) == full)
    // replay no-op
    assert(GraphStore.maintainBatch(lines.filter(col("ln") > 2),
      col("ord"), col("item"), dir, batchId = 2L).isEmpty)
    assert(storedPairs(dir) == full)
    // compact: window [0,3) -> one pre-aggregated slice; data identical
    val mB = GraphStore.meta(spark, dir).get
    assert(mB.sliceBase == 0L && mB.slices == 3L)
    assert(GraphStore.compact(spark, dir).contains(3L))
    val mA = GraphStore.meta(spark, dir).get
    assert(mA.sliceBase == 3L && mA.slices == 4L && mA.batch == 2L)
    assert(storedPairs(dir) == full)
    // the merged pair slice is PRE-aggregated: one row per (u, v)
    val slice3 = spark.read.parquet(s"$dir/pairs/slice=3")
    assert(slice3.count() == slice3.select(col("u"), col("v")).distinct().count())
    // replay stays a no-op through the compact; 1-slice window no-ops
    assert(GraphStore.maintainBatch(lines.filter(col("ln") > 2),
      col("ord"), col("item"), dir, batchId = 2L).isEmpty)
    assert(GraphStore.compact(spark, dir).isEmpty)
    // vacuum retires slices 0..2 from both stores
    assert(new java.io.File(s"$dir/pairs/slice=0").exists())
    assert(GraphStore.vacuumSlices(spark, dir) == 6)
    assert(!new java.io.File(s"$dir/pairs/slice=0").exists())
    assert(storedPairs(dir) == full)
    // a post-compact fold still folds correctly (items store intact)
    // — re-fold an already-known slice under a NEW batch id would
    // double-count by the disjointness contract, so fold nothing here;
    // instead assert the live items survived the compact
    assert(GraphStore.load(spark, dir)._1.count() == lines.count())
  }

  test("the fold's base-side read is a static partition prune on the " +
      "basket-hash prefixes the delta touches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graphprune").toString
    GraphStore.maintainBatch(lines.filter(col("ln") <= 2),
      col("ord"), col("item"), dir, batchId = 0L)
    val deltaOrds = lines.filter(col("ln") > 2)
      .select(col("ord")).limit(20).distinct()
    val pruned = GraphStore.baseItemsFor(spark, dir, deltaOrds)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*op".r.findFirstIn(plan).isDefined,
      s"base-items read not partition-pruned on op:\n${plan.take(1500)}")
    // the prune is lossless for the touched baskets: every base line of
    // those baskets survives it
    val expect = lines.filter(col("ln") <= 2)
      .join(deltaOrds, Seq("ord"), "left_semi").count()
    assert(pruned.join(deltaOrds, Seq("ord"), "left_semi").count() == expect)
  }

  test("purgeOrders: negative delta slices cancel the purged baskets' " +
      "pairs exactly; later folds skip tombstoned baskets; compact " +
      "makes the removal physical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graphpurge").toString
    // fold in two batches so a purged basket's pairs SPAN slices
    GraphStore.maintainBatch(lines.filter(col("ln") <= 2),
      col("ord"), col("item"), dir, batchId = 0L)
    GraphStore.maintainBatch(lines.filter(col("ln") > 2),
      col("ord"), col("item"), dir, batchId = 1L)
    // purge the two widest baskets (guaranteed cross-slice pairs)
    val gone = lines.groupBy(col("ord")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ord")).limit(2)
      .collect().map(_.getLong(0)).toSet
    assert(GraphStore.purgeOrders(spark, dir,
      gone.toSeq.toDF("ord")).nonEmpty)
    val expect = fullPairs(!col("ord").isin(gone.toSeq.map(java.lang.Long.valueOf): _*))
    assert(storedPairs(dir) == expect,
      "the negative delta must cancel the purged baskets' pairs exactly")
    assert(GraphStore.load(spark, dir)._1
      .filter(col("ord").isin(gone.toSeq.map(java.lang.Long.valueOf): _*))
      .count() == 0L, "tombstoned baskets must leave the items face")
    // no-op re-purge
    assert(GraphStore.purgeOrders(spark, dir,
      (gone + 999999L).toSeq.toDF("ord")).isEmpty)
    // compact: physical — the merged slices carry neither the purged
    // lines nor any zeroed pair row
    assert(GraphStore.compact(spark, dir).nonEmpty)
    val m = GraphStore.meta(spark, dir).get
    val rawOrds = spark.read.parquet(s"$dir/items")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .select(col("ord")).distinct().collect().map(_.getLong(0)).toSet
    assert(gone.forall(!rawOrds(_)))
    GraphStore.vacuumSlices(spark, dir)
    assert(storedPairs(dir) == expect)
  }

  test("upsertOrders: a basket refresh cancels the old pairs and lands " +
      "the new ones in ONE commit; replay no-op; upsert wins remove; " +
      "purged baskets re-enter; a later purge retires the re-landed " +
      "basket; compact preserves") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graphupsert").toString
    val seed = lines.select(col("ord"), col("item")).distinct()
    GraphStore.maintainBatch(seed, col("ord"), col("item"), dir,
      batchId = 0L)
    def pairsOf(items: org.apache.spark.sql.DataFrame) =
      items.as("a").join(items.as("b"),
          col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("u"), col("b.item").as("v"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the three widest baskets: A refreshed (two smallest parts),
    // B deleted, C in both upserts and removes (upsert wins: full set)
    val wide = seed.groupBy(col("ord")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ord")).limit(3)
      .collect().map(_.getLong(0))
    val (a, b, c) = (wide(0), wide(1), wide(2))
    val newA = seed.filter(col("ord") === a)
      .orderBy(col("item")).limit(2)
    val r = GraphStore.upsertOrders(
      newA.unionByName(seed.filter(col("ord") === c)),
      col("ord"), col("item"), Seq(b, c).toDF("ord"), dir, batchId = 1L)
    assert(r.nonEmpty)
    val post = seed.filter(col("ord") =!= a && col("ord") =!= b)
      .unionByName(newA)
    val expect = pairsOf(post)
    assert(storedPairs(dir) == expect,
      "summed pairs must equal the recompute over the refreshed baskets")
    assert(GraphStore.load(spark, dir)._1
      .filter(col("ord") === a).count() == 2L,
      "the re-landed basket must stay visible above its own tombstone")
    assert(GraphStore.load(spark, dir)._1
      .filter(col("ord") === b).count() == 0L)
    // replay is a no-op
    assert(GraphStore.upsertOrders(
      newA.unionByName(seed.filter(col("ord") === c)),
      col("ord"), col("item"), Seq(b, c).toDF("ord"), dir,
      batchId = 1L).isEmpty)
    assert(storedPairs(dir) == expect)
    // a previously-deleted basket re-enters through an upsert
    assert(GraphStore.upsertOrders(seed.filter(col("ord") === b),
      col("ord"), col("item"), Seq.empty[Long].toDF("ord"), dir,
      batchId = 2L).nonEmpty)
    val expect2 = pairsOf(post.unionByName(seed.filter(col("ord") === b)))
    assert(storedPairs(dir) == expect2)
    // a LATER purge retires the re-landed basket (newer tombstone)
    assert(GraphStore.purgeOrders(spark, dir, Seq(a).toDF("ord")).nonEmpty)
    val expect3 = pairsOf(post.filter(col("ord") =!= a)
      .unionByName(seed.filter(col("ord") === b)))
    assert(storedPairs(dir) == expect3)
    // compact + vacuum preserve the state and make the masks physical
    assert(GraphStore.compact(spark, dir).nonEmpty)
    assert(GraphStore.vacuumSlices(spark, dir) > 0)
    assert(storedPairs(dir) == expect3)
    assert(GraphStore.load(spark, dir)._1
      .filter(col("ord") === a).count() == 0L)
  }

  test("streaming maintenance: the substrate follows the arriving lines") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graphstream").toString
    val ckpt = Files.createTempDirectory("graphckpt").toString
    val rows = lines.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ms = MemoryStream[(Long, Long, Long)]
    val q = GraphStore.maintainStream(
      ms.toDF().toDF("ord", "item", "ln"), col("ord"), col("item"),
      dir, ckpt)
    try {
      ms.addData(rows.filter(_._3 <= 2).toSeq: _*)
      q.processAllAvailable()
      ms.addData(rows.filter(_._3 > 2).toSeq: _*)
      q.processAllAvailable()
      assert(storedPairs(dir) == fullPairs(lit(true)))
    } finally q.stop()
  }
}
