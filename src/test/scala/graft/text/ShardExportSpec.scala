package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The training-shard export: shard files round-trip the q246 stride
  * order, totals match the manifest commit, pack/shard arithmetic is
  * the q76 packing, and the export is deterministic.
  */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("writeShards: stride order round-trips through the shard files, " +
      "totals ride the committed stats manifest, export is deterministic") {
    val out = Files.createTempDirectory("shards").toString
    val (nDocs, nToks, nShards) = TextQueries.writeShards(spark, sf, out,
      seqLen = 256L, packsPerShard = 4L)
    // totals equal the q246 manifest's
    val manifest = TextQueries.queries("q246_corpus_build_stride")(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("global_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(nDocs == manifest.length)
    assert(nToks == manifest.map(_._2).sum)
    assert(nShards >= 1)
    // the commit point exists and carries the same numbers
    val meta = Files.readString(java.nio.file.Paths.get(out,
      "_graft_shards_meta.json"))
    assert(meta.contains(s""""docs": $nDocs""") &&
      meta.contains(s""""tokens": $nToks""") &&
      meta.contains(s""""shards": $nShards"""))
    // round trip: reading the shards in (shard, global_pos) order
    // reproduces the stride training order exactly
    val back = spark.read.parquet(s"$out/shards")
      .orderBy(col("global_pos"))
      .select(col("doc_id"), col("global_pos"), col("pack_id"), col("shard"))
      .collect()
    assert(back.map(_.getLong(0)).toSeq ==
      manifest.sortBy(_._3).map(_._1).toSeq,
      "shard rows must replay the stride order")
    // pack/shard arithmetic: packs are non-decreasing along the order
    // and shards group packsPerShard packs
    val packs = back.map(r => (r.getLong(2), r.getAs[Number](3).longValue()))
    assert(packs.map(_._1).toSeq == packs.map(_._1).sorted.toSeq)
    assert(packs.forall { case (p, sh) => sh == p / 4 })
    // determinism: a second export lands on identical rows and stats
    val out2 = Files.createTempDirectory("shards2").toString
    assert(TextQueries.writeShards(spark, sf, out2,
      seqLen = 256L, packsPerShard = 4L) == ((nDocs, nToks, nShards)))
    val back2 = spark.read.parquet(s"$out2/shards")
      .orderBy(col("global_pos"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(back2 == back.map(_.getLong(0)).toSeq)
    // the reader face goes through the commit manifest — and refuses a
    // dir with data but no commit (a crashed writer's partial tree)
    assert(TextQueries.readShards(spark, out).count() == nDocs)
    val partial = Files.createTempDirectory("shards3").toString
    spark.read.parquet(s"$out/shards").write
      .parquet(s"$partial/shards") // data, no manifest
    val e = intercept[RuntimeException] {
      TextQueries.readShards(spark, partial)
    }
    assert(e.getMessage.contains("no committed shard export"))
  }
}
