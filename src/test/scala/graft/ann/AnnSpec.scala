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
}
