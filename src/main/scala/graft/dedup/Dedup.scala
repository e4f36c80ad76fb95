package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Deduplication engines for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every method is blocking-based — candidate pairs come
  * from an equality join on a bucket key (fingerprint, LSH band, SimHash
  * chunk, label), never from an O(n²) cross join. Bucket joins shuffle on
  * the bucket key; `maxBucketSize` caps degenerate buckets (a stopword-only
  * shingle, a zero vector) so one hot key cannot produce a quadratic
  * straggler at 100 TB.
  */
object Dedup {

  /** Exact dedup: canonical = lowest id per fingerprint. Returns the input
    * plus `fp` and `is_canonical`. One shuffle on the fingerprint. */
  def withExactDupFlags(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs.withColumn("fp", fingerprint(text))
      .withColumn("is_canonical", id === min(id).over(w))
  }

  /** Exact-dedup compaction: keep one row per distinct fingerprint. */
  def dropExactDups(docs: DataFrame, id: Column, text: Column): DataFrame =
    withExactDupFlags(docs, id, text).filter(col("is_canonical"))
      .drop("fp", "is_canonical")

  /** Generic bucket-join candidate generation: explode bucket keys, join
    * docs sharing a bucket, emit each unordered id pair once. Oversized
    * buckets are dropped (degenerate-key guard). */
  private def pairsFromBuckets(
      keyed: DataFrame, // columns: id, bucket
      maxBucketSize: Int): DataFrame = {
    val sized = keyed
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
    val a = sized.select(col("id").as("a_id"), col("bucket"))
    val b = sized.select(col("id").as("b_id"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** MinHash+LSH candidate pairs: shingle → k-permutation signature →
    * band keys → bucket join. Default 8 bands × 2 rows: the S-curve
    * midpoint sits at (1/b)^(1/r) ≈ 0.35, so pairs with jaccard ≥ 0.5
    * are caught with probability > 0.97 (4×4 banding would miss ~40%
    * of them). */
  def minhashCandidates(
      docs: DataFrame, id: Column, text: Column,
      shingleWidth: Int = 3, k: Int = 16, bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    val keyed = docs
      .select(id.as("id"), shingles(text, shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("id"), explode(lshBandKeys(col("sig"), k, bands)).as("bucket"))
    pairsFromBuckets(keyed, maxBucketSize)
  }

  /** MinHash near-dups: LSH candidates verified with exact shingle
    * Jaccard ≥ `threshold`. Verification joins shingle sets back by id —
    * two broadcast-or-shuffle hash joins, still no cross product. */
  def minhashNearDups(
      docs: DataFrame, id: Column, text: Column,
      threshold: Double, shingleWidth: Int = 3): DataFrame = {
    val sh = docs.select(id.as("sid"), shingles(text, shingleWidth).as("sh"))
    val cands = minhashCandidates(docs, id, text, shingleWidth)
    cands
      .join(sh.withColumnRenamed("sid", "a_id").withColumnRenamed("sh", "a_sh"), Seq("a_id"))
      .join(sh.withColumnRenamed("sid", "b_id").withColumnRenamed("sh", "b_sh"), Seq("b_id"))
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact Jaccard over distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** n-gram Jaccard near-dups within an explicit blocking key (e.g.
    * source, length bucket): the non-probabilistic small-block variant. */
  def ngramJaccardPairs(
      docs: DataFrame, id: Column, text: Column, block: Column,
      threshold: Double, shingleWidth: Int = 3): DataFrame = {
    val sh = docs.select(id.as("id"), block.as("blk"),
      shingles(text, shingleWidth).as("sh"))
    val a = sh.select(col("id").as("a_id"), col("blk"), col("sh").as("a_sh"))
    val b = sh.select(col("id").as("b_id"), col("blk"), col("sh").as("b_sh"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-dups: 64-bit signatures banded into four 16-bit chunks;
    * by pigeonhole any pair within Hamming distance 3 shares at least one
    * exact chunk, so the bucket join loses no such pair. */
  def simhashNearDups(
      docs: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = docs.select(id.as("id"), simhash64(text).as("sig"))
    val keyed = sigs.select(col("id"), posexplode(array((0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("bits"))
    }: _*)).as(Seq("pos", "bucket")))
      .select(col("id"), col("bucket"))
    val cands = pairsFromBuckets(keyed, maxBucketSize)
    cands
      .join(sigs.withColumnRenamed("id", "a_id").withColumnRenamed("sig", "a_sig"), Seq("a_id"))
      .join(sigs.withColumnRenamed("id", "b_id").withColumnRenamed("sig", "b_sig"), Seq("b_id"))
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Embedding-cosine near-dups within a blocking key. Vectors cast to
    * double before any arithmetic (float32 upcast, then IEEE-stable). */
  def embeddingNearDups(
      embs: DataFrame, id: Column, vec: Column, block: Column,
      threshold: Double): DataFrame = {
    val e = embs.select(id.as("id"), block.as("blk"), vec.as("v"))
    val a = e.select(col("id").as("a_id"), col("blk"), col("v").as("a_v"))
    val b = e.select(col("id").as("b_id"), col("blk"), col("v").as("b_v"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", graft.ann.Similarity.cosine(col("a_v"), col("b_v")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }
}
