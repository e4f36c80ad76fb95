package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k: one scan, per-partition
  *    top-k, driver merges k×partitions rows (TakeOrderedAndProject). The
  *    correctness baseline and perfectly adequate for one-off queries even
  *    at large n (linear scan, no shuffle of the data).
  *  - [[IvfIndex]] — inverted-file index: vectors pre-assigned to their
  *    nearest centroid; a query probes only `nprobe` cells, cutting the
  *    scanned fraction to ~nprobe/nCentroids. The cell assignment is a
  *    one-time distributed job; at 100 TB the assignment column doubles as
  *    a partition key so each probe prunes whole files.
  *
  * All arithmetic upcasts float32 → double before multiplying, and sums
  * left-to-right (functions.aggregate), keeping results deterministic.
  */
object Similarity {

  /** Elementwise dot product in double precision — native codegen'd
    * expression (see graft.functions.VecDot; the zip_with/aggregate
    * composition is interpreted and allocates per row). Summation order
    * is the same left-to-right fold, so results are bit-identical. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k against a single query vector (1-row DataFrame
    * with column `q`). Broadcast of the query row + TakeOrderedAndProject:
    * no shuffle of the embedding table. */
  def bruteForceTopK(
      embs: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int): DataFrame =
    embs.select(id.as("nn_id"), vec.as("v"))
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(col("v"), col("q")))
      .select(col("nn_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("nn_id"))
      .limit(k)

  /** IVF index state: centroid table + cell-assigned vectors. */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Build an IVF index. Centroids are seeded deterministically from the
    * `nCentroids` lowest-id vectors, then refined with `iterations` Lloyd
    * steps (distributed: assignment = broadcast join + argmin window;
    * update = per-cell elementwise mean via posexplode/groupBy). */
  def buildIvf(
      embs: DataFrame, id: Column, vec: Column,
      nCentroids: Int, iterations: Int = 1): IvfIndex = {
    val data = embs.select(id.as("vid"), vec.as("v"))
    var centroids = data.orderBy(col("vid")).limit(nCentroids)
      .select(row_number().over(Window.orderBy(col("vid"))).as("cell"), col("v").as("c"))
    var assigned = assign(data, centroids)
    for (_ <- 0 until iterations) {
      centroids = recomputeCentroids(assigned)
      assigned = assign(data, centroids)
    }
    IvfIndex(centroids, assigned)
  }

  /** Nearest-centroid assignment: broadcast the (tiny) centroid table,
    * score every (vector, centroid) pair, keep the argmin per vector via
    * min(struct(d, cell)) — a plain map-side-combinable aggregation, no
    * per-vector window sort. */
  private def assign(data: DataFrame, centroids: DataFrame): DataFrame =
    data.crossJoin(broadcast(centroids))
      .withColumn("d", -dot(col("v"), col("c")) / (norm(col("v")) * norm(col("c"))))
      .groupBy(col("vid"))
      .agg(
        min(struct(col("d"), col("cell"))).as("best"),
        first(col("v")).as("v"))
      .select(col("vid"), col("v"), col("best.cell").as("cell"))

  /** Per-cell elementwise mean (posexplode → groupBy(cell, dim) → avg →
    * reassemble). Fully distributed; no vector ever reaches the driver. */
  private def recomputeCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m").cast("float")).as("c"))

  /** Deterministic pseudo-random hyperplanes for sign-LSH (no RNG:
    * reproducible across runs/executors — an LSH index must hash the same
    * vector to the same bucket forever). */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        (((p * 2654435761L + i * 40503L + 12289L) % 1000003L).toDouble / 500001.5) - 1.0
      }
    }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection).
    * Cosine-similar vectors agree on most signs, so they collide. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (pl, i) =>
      when(dot(vec, typedlit(pl)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: scan only vectors whose bucket is within Hamming
    * distance `probeHamming` of the query's bucket (sign flips near a
    * plane are the failure mode; probing neighbor buckets buys recall).
    * Scanned fraction ≈ sum_{h<=probeHamming} C(nPlanes,h) / 2^nPlanes.
    */
  def lshSearch(
      embs: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, nPlanes: Int = 8, dim: Int = 64,
      probeHamming: Int = 1): DataFrame = {
    val bucketed = embs.select(id.as("nn_id"), vec.as("v"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    val qb = query.withColumn("qbucket", lshBucket(col("q"), nPlanes, dim))
    bucketed.crossJoin(broadcast(qb))
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= probeHamming)
      .withColumn("cosine", cosine(col("v"), col("q")))
      .select(col("nn_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("nn_id"))
      .limit(k)
  }

  /** Probe an IVF index: rank cells by query-to-centroid similarity, scan
    * only the vectors in the best `nprobe` cells. */
  def ivfSearch(
      index: IvfIndex, query: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val probeCells = index.centroids
      .crossJoin(broadcast(query))
      .withColumn("sim", cosine(col("c"), col("q")))
      .orderBy(col("sim").desc, col("cell"))
      .limit(nprobe)
      .select(col("cell"))
    index.assigned
      .join(broadcast(probeCells), Seq("cell"))
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(col("v"), col("q")))
      .select(col("vid").as("nn_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("nn_id"))
      .limit(k)
  }
}
