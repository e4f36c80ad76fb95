package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.util.Tables

/** Centroid-drift probe for incremental IVF ingestion (q243 /
  * `Similarity.ivfInsert`): how much recall does the FROZEN coarse
  * quantizer lose as the inserted fraction grows, versus periodically
  * REBUILDING (re-training centroids) at the same corpus size? The
  * refresh-policy trade-off, measured (the SkewProbe pattern) — insert
  * is one broadcast-argmin pass per ingest, rebuild re-trains and
  * re-assigns the whole corpus; the recall gap is what the cheap path
  * costs. Deterministic: fixed base/delta splits by vec_id, fixed
  * query panel, farthest-first seeding (no RNG anywhere).
  *
  * Recall@10 = |pruned nprobe=4/16 top-10 ∩ exact top-10| / 10,
  * averaged over the query panel. Results recorded in SURVEY §9.9.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
      .localCheckpoint(true)
    val n = embs.count()
    val baseN = n / 5
    val base = embs.filter(col("vec_id") <= baseN)
    // fixed 10-query panel spread across the id space
    val qIds = embs.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0)).grouped(math.max(1, n.toInt / 10))
      .map(_.head).take(10).toSeq
    val queries = qIds.map { qid =>
      qid -> embs.filter(col("vec_id") === qid).select(col("embedding").as("q"))
        .localCheckpoint(true)
    }
    def recall(idx: Similarity.IvfIndex, corpus: org.apache.spark.sql.DataFrame): Double = {
      // search with k+1 and filter the self-match AFTER (round-8 advice:
      // filtering a k=10 result leaves only 9 candidates whenever the
      // query's own id lands in the pruned top-10, capping recall at 0.9)
      val scores = queries.map { case (qid, q) =>
        val exact = Similarity.bruteForceTopK(
            corpus.filter(col("vec_id") =!= qid), col("vec_id"),
            col("embedding"), q, 10)
          .collect().map(_.getLong(0)).toSet
        val got = Similarity.ivfSearch(idx, q, k = 11, nprobe = 4)
          .filter(col("nn_id") =!= qid)
          .collect().map(_.getLong(0)).take(10).toSet
        (exact intersect got).size.toDouble / 10.0
      }
      scores.sum / scores.length
    }
    val frozen0 = Similarity.buildIvf(base, col("vec_id"), col("embedding"),
      nCentroids = 16, iterations = 1, materialize = true)
    println(f"${"corpus"}%8s ${"grown_pct"}%9s ${"variant"}%8s ${"recall@10"}%9s")
    for (mult <- Seq(1L, 2L, 3L, 5L)) {
      val size = math.min(baseN * mult, n)
      val corpus = embs.filter(col("vec_id") <= size)
      val frozen =
        if (mult == 1L) frozen0
        else Similarity.ivfInsert(frozen0,
          embs.filter(col("vec_id") > baseN && col("vec_id") <= size),
          col("vec_id"), col("embedding"))
      val rebuilt = Similarity.buildIvf(corpus, col("vec_id"), col("embedding"),
        nCentroids = 16, iterations = 1, materialize = true)
      val pct = (size - baseN) * 100 / baseN
      println(f"$size%8d $pct%8d%% ${"frozen"}%8s ${recall(frozen, corpus)}%9.2f")
      println(f"$size%8d $pct%8d%% ${"rebuilt"}%8s ${recall(rebuilt, corpus)}%9.2f")
    }
    spark.stop()
  }
}
