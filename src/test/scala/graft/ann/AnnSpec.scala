package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
  private def query = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
    .select(col("embedding").as("q"))

  test("brute force top-k: k rows, sorted by cosine desc") {
    val top = Similarity.bruteForceTopK(embs, col("vec_id"), col("embedding"), query, 10)
      .collect()
    assert(top.length == 10)
    val cosines = top.map(_.getDouble(1))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("cosine is exact: self-similarity is 1") {
    val self = embs.limit(5)
      .withColumn("c", Similarity.cosine(col("embedding"), col("embedding")))
      .select("c").collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("IVF with all cells probed reproduces brute force exactly") {
    val idx = Similarity.buildIvf(embs, col("vec_id"), col("embedding"),
      nCentroids = 4, iterations = 1)
    // every vector is in exactly one cell
    assert(idx.assigned.count() == embs.count())
    val full = Similarity.ivfSearch(idx, query, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val bf = Similarity.bruteForceTopK(embs, col("vec_id"), col("embedding"), query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == bf)
  }

  test("LSH search: deterministic buckets, results within the scanned cone") {
    val r1 = Similarity.lshSearch(embs, col("vec_id"), col("embedding"), query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r2 = Similarity.lshSearch(embs, col("vec_id"), col("embedding"), query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r1 == r2) // deterministic planes -> reproducible result
    assert(r1.nonEmpty && r1.size <= 10)
    // every returned neighbor really is cosine-ranked (desc)
    val cosines = r1.map(_._2)
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("LSH with all buckets probed reproduces brute force exactly") {
    val all = Similarity.lshSearch(embs, col("vec_id"), col("embedding"), query,
        k = 10, nPlanes = 8, probeHamming = 8)
      .collect().map(_.getLong(0)).toSeq
    val bf = Similarity.bruteForceTopK(embs, col("vec_id"), col("embedding"), query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(all == bf)
  }

  test("IVF partial probe: subset of brute-force scan with sane recall") {
    val idx = Similarity.buildIvf(embs, col("vec_id"), col("embedding"),
      nCentroids = 8, iterations = 1)
    val approx = Similarity.ivfSearch(idx, query, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    val bf = Similarity.bruteForceTopK(embs, col("vec_id"), col("embedding"), query, 50)
      .collect().map(_.getLong(0)).toSet
    // partial probe results all come from the true top-50 neighborhood
    assert((approx -- bf).size <= 5)
  }

  test("farthest-first seeding spreads seeds across separated clusters") {
    import spark.implicits._
    // 3 tight, well-separated clusters along different axes; ids ordered so
    // the FIRST 3 ids all sit in cluster 0 — by-id seeding starts with 3
    // seeds in one cluster, farthest-first must pick one per cluster.
    val base = Seq(
      Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 1f))
    val vecs = (0 until 30).map { i =>
      val c = if (i < 3) 0 else i % 3
      val v = base(c).zipWithIndex.map { case (x, d) =>
        x + (if (d == (i / 3) % 3) 0.01f * (i % 7) else 0f) }
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val idx = Similarity.buildIvf(df, col("vec_id"), col("embedding"),
      nCentroids = 3, iterations = 0)
    // with zero Lloyd refinement, cell quality is pure seeding quality:
    // every cluster must map to its own cell
    // (ids 0,1,2 are all cluster 0 by construction, rest by i % 3)
    val clusters = idx.assigned
      .select(when(col("vid") < 3, 0L).otherwise(col("vid") % 3).as("cluster"), col("cell"))
      .distinct().collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(clusters.size == 3)
    assert(clusters.values.forall(_.size == 1), s"split cluster: $clusters")
    assert(clusters.values.flatten.toSet.size == 3, s"merged clusters: $clusters")
  }

  test("auto-tuned nprobe covers an oversampled candidate pool") {
    val idx = Similarity.buildIvf(embs, col("vec_id"), col("embedding"),
      nCentroids = 8, iterations = 1)
    val auto = Similarity.ivfSearchAuto(idx, query, k = 10, oversample = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(auto.size == 10)
    // oversample >= table size forces an all-cells probe == brute force
    val n = embs.count().toInt
    val full = Similarity.ivfSearchAuto(idx, query, k = 10, oversample = n)
      .collect().map(_.getLong(0)).toSeq
    val bf = Similarity.bruteForceTopK(embs, col("vec_id"), col("embedding"), query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == bf)
  }
}
