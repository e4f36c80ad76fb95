package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables
import graft.dedup.Dedup

/** Similarity-search operator surface over `embeddings`.
  *
  * q42 (brute-force top-k) and q47 (blocked cosine near-dup) are oracle
  * checked — DuckDB computes the same double-precision left-to-right
  * sums once the float32 lists are cast to DOUBLE[]. q43 (IVF) and q66
  * (sign-LSH) run all-probe configs, which are provably exhaustive and so
  * share the exact-top-k oracle; the pruned-probe scale configs are
  * recall-tested against brute force in AnnSpec.
  */
object AnnQueries {

  private def queryVec(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))

  /** The q43 IVF index, built ONCE per (session, table) and eagerly
    * materialized — an IVF index exists to be built once and probed many
    * times, so repeated q43 invocations measure probe cost, not a
    * rebuild of centroids + assignment on every call (the `Tables.load`
    * memo pattern; graft.Bench warms this outside its timed window and
    * says so). The checkpoint pins both tables so a probe never re-runs
    * seeding or Lloyd; cache holds one small centroid table plus the
    * assignment (id, vector, cell — same order of size as the input). */
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Similarity.IvfIndex]()

  def ivfIndex(s: SparkSession, d: String): Similarity.IvfIndex =
    ivfCache.computeIfAbsent((s, d), { case (s2, d2) =>
      val embs = Tables.embeddings(s2, d2).filter(col("vec_id") =!= 0)
      Similarity.buildIvf(embs, col("vec_id"), col("embedding"),
        nCentroids = 8, iterations = 1, materialize = true)
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- exact ANN baseline: cosine top-10 for the vec_id=0 query.
    "q42_ann_bruteforce" -> { (s, d) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0),
        col("vec_id"), col("embedding"),
        queryVec(s, d), k = 10)
    },

    // -- IVF path through the oracle gate: probing ALL cells makes the
    //    search provably ≡ brute force (every vector lives in exactly one
    //    cell), so the exact top-k SQL verifies the whole index machinery
    //    — build, assignment, probe — end to end. The pruned-probe scale
    //    config (nprobe=2 of 8) is recall-tested in AnnSpec.
    "q43_ann_ivf" -> { (s, d) =>
      Similarity.ivfSearch(ivfIndex(s, d), queryVec(s, d), k = 10, nprobe = 8)
    },

    // -- Sign-LSH path through the oracle gate: probeHamming = nPlanes
    //    scans every bucket, so the result ≡ brute force and the exact
    //    top-k SQL verifies bucketing + probing end to end. The pruned
    //    config (Hamming ≤ 1) is containment/recall-tested in AnnSpec.
    "q66_ann_lsh" -> { (s, d) =>
      Similarity.lshSearch(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0),
        col("vec_id"), col("embedding"),
        queryVec(s, d), k = 10, probeHamming = 8)
    },

    // -- embedding-cosine near-dup pairs, blocked by label (bounded
    //    subset; at scale the block key comes from LSH buckets).
    "q47_embedding_neardup" -> { (s, d) =>
      Dedup.embeddingNearDups(
          Tables.embeddings(s, d).filter(col("vec_id") < 300),
          col("vec_id"), col("embedding"), col("label"), threshold = 0.25)
        .orderBy(col("a_id"), col("b_id"))
    }
  )

  private val cosSql =
    "LIST_DOT_PRODUCT(%s, %s) / (SQRT(LIST_DOT_PRODUCT(%s, %s)) * SQRT(LIST_DOT_PRODUCT(%s, %s)))"

  private val exactTopKSql =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id AS nn_id,
      |  LIST_DOT_PRODUCT(embedding::DOUBLE[], qv)
      |    / (SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]))
      |       * SQRT(LIST_DOT_PRODUCT(qv, qv))) AS cosine
      |FROM embeddings, q WHERE vec_id <> 0
      |ORDER BY cosine DESC, nn_id LIMIT 10""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q42_ann_bruteforce" -> exactTopKSql,
    // all-probe configs are exhaustive, hence share the exact-top-k oracle
    "q43_ann_ivf" -> exactTopKSql,
    "q66_ann_lsh" -> exactTopKSql,

    "q47_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  LIST_DOT_PRODUCT(a.v, b.v)
        |    / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE LIST_DOT_PRODUCT(a.v, b.v)
        |    / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) >= 0.25
        |ORDER BY a_id, b_id""".stripMargin
  )
}
