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

  test("quantized search: deterministic, high recall vs float whitened L2") {
    val (mins, maxs) = Similarity.quantRanges(embs, col("embedding"))
    assert(mins.size == 64 && maxs.size == 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    def run() = Similarity.quantizedTopK(embs, col("vec_id"), col("embedding"),
      qv, mins, maxs, k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val r1 = run()
    assert(r1 == run()) // quantization is deterministic
    assert(r1.size == 10)
    // integer distances are sorted asc
    assert(r1.map(_._2).sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
    // truth metric = the SAME per-dim min-max whitened L2 computed on the
    // raw floats (quantization should only lose sub-code rounding, not the
    // ranking): top-10 by sum_i ((x_i - q_i) * 254/(mx_i - mn_i))^2
    val exact = embs.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = v.indices.map { i =>
        val w = if (maxs(i) == mins(i)) 0.0 else 254.0 / (maxs(i) - mins(i))
        val diff = (v(i).toDouble - qv(i)) * w
        diff * diff
      }.sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = r1.map(_._1).count(exact)
    assert(recall >= 8, s"recall too low: $recall/10")
  }

  test("PQ with ksub >= corpus degenerates to exact L2; deterministic") {
    // every sampled point becomes its own centroid, codes are lossless
    // for sampled vectors; on a tiny corpus the sample IS the corpus
    val small = embs.filter(col("vec_id") <= 40)
    val idx = Similarity.buildPq(small, col("vec_id"), col("embedding"),
      m = 4, ksub = 64)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    val got = Similarity.pqSearchAdc(idx, qv, k = 5)
      .collect().map(_.getLong(0)).toSeq
    val exact = small.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = v.indices.map(i => { val df = v(i).toDouble - qv(i); df * df }).sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    assert(got == exact)
    val again = Similarity.pqSearchAdc(
      Similarity.buildPq(small, col("vec_id"), col("embedding"), m = 4, ksub = 64),
      qv, k = 5).collect().map(_.getLong(0)).toSeq
    assert(again == got) // training + assignment fully deterministic
  }

  test("PQ compressed search: sane recall vs exact L2 on the full slice") {
    val idx = Similarity.buildPq(embs, col("vec_id"), col("embedding"),
      m = 16, ksub = 32)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    val got = Similarity.pqSearchAdc(idx, qv, k = 10)
      .collect().map(_.getLong(0)).toSet
    val exact = embs.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = v.indices.map(i => { val df = v(i).toDouble - qv(i); df * df }).sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = got.count(exact)
    info(s"PQ recall@10 = $recall/10")
    assert(recall >= 5, s"recall too low: $recall/10")
  }

  test("quantized codes: constant dimension maps to 0, extremes to 0/254") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.0f, -2.0f)), (2L, Array(0.0f, 2.0f)), (3L, Array(0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.quantRanges(df, col("embedding"))
    assert(mins(0) == 0.0 && maxs(0) == 0.0) // constant dim
    // query (2.0, 2.0): dim0 constant -> code 0; dim1 -> code 254.
    // corpus codes dim1: -2 -> 0, 2 -> 254, 0 -> 127; distances expose them
    val got = Similarity.quantizedTopK(df, col("vec_id"), col("embedding"),
      Seq(2.0, 2.0), mins, maxs, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 254L * 254L)
    assert(got(2L) == 0L)
    assert(got(3L) == 127L * 127L)
  }

  test("banded LSH near-dup: full precision, pinned recall, beats one band") {
    import graft.dedup.Dedup
    val all = Tables.embeddings(spark, sf)
    // truth: every pair with cosine >= t (label-free all-pairs on this
    // small SF — the thing the blocked version approximates at scale)
    val truth = Dedup.embeddingNearDups(all, col("vec_id"), col("embedding"),
        lit(1), threshold = 0.25)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.lshNearDups(all, col("vec_id"), col("embedding"),
        nBands = 4, planesPerBand = 4, dim = 64, threshold = 0.25)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0: blocking can only DROP true pairs, never invent one
    assert(banded.subsetOf(truth))
    // deterministic planes + deterministic data -> the measured recall is
    // a constant of this configuration (0.373 at 4x4); pin a floor under it
    assert(banded.size * 10 >= truth.size * 3, s"recall ${banded.size}/${truth.size}")
    // and banding must beat the single 8-bit bucket it exists to fix
    val oneBand = Dedup.embeddingNearDups(all, col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), nPlanes = 8, dim = 64),
        threshold = 0.25)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneBand.subsetOf(truth))
    assert(banded.size > oneBand.size,
      s"banded ${banded.size} <= single-band ${oneBand.size}")
  }

  test("IVF-PQ: all-sampled all-probed config degenerates to exact L2") {
    // tiny corpus => PQ sample rate 1, ksub >= corpus, nprobe = nCells:
    // residual codes are lossless and every cell is scanned, so ADC over
    // residuals IS exact L2 — the whole composite machinery (coarse
    // assignment, residual encode, per-cell lookup tables) verifies
    // end to end, the q43 all-probe argument applied to IVFPQ.
    val small = embs.filter(col("vec_id") <= 40)
    val idx = Similarity.buildIvfPq(small, col("vec_id"), col("embedding"),
      nCells = 3, m = 4, ksub = 64)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    val got = Similarity.ivfPqSearchAdc(idx, qv, k = 5, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    val exact = small.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = v.indices.map(i => { val df = v(i).toDouble - qv(i); df * df }).sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    assert(got == exact)
    // deterministic rebuild
    val again = Similarity.ivfPqSearchAdc(
      Similarity.buildIvfPq(small, col("vec_id"), col("embedding"),
        nCells = 3, m = 4, ksub = 64), qv, k = 5, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(again == got)
  }

  test("IVF insert: counts add up, centroids frozen, an inserted vector is " +
      "immediately retrievable from its own cell") {
    val base = embs.filter(col("vec_id") % 5 =!= 0)
    val delta = embs.filter(col("vec_id") % 5 === 0)
    val idx = Similarity.buildIvf(base, col("vec_id"), col("embedding"),
      nCentroids = 8, iterations = 1)
    val grown = Similarity.ivfInsert(idx, delta, col("vec_id"), col("embedding"))
    assert(grown.assigned.count() == base.count() + delta.count())
    // centroids are the SAME table — frozen, old cell ids stay valid
    assert(grown.centroids.collect().map(_.toString).sorted.toSeq ==
      idx.centroids.collect().map(_.toString).sorted.toSeq)
    // self-query: an inserted vector's nearest neighbor is itself, and
    // nprobe=1 suffices (its own cell is the query's best cell)
    val someDelta = delta.orderBy(col("vec_id")).limit(1)
    val q = someDelta.select(col("embedding").as("q"))
    val top = Similarity.ivfSearch(grown, q, k = 1, nprobe = 1).head()
    assert(top.getLong(0) == someDelta.head().getLong(0))
    assert(top.getDouble(1) > 0.99999)
  }

  test("PQ insert: frozen codebooks, deterministic re-encode, base ADC " +
      "scores bit-identical before and after") {
    val baseE = embs.filter(col("vec_id") % 5 =!= 0)
    val deltaE = embs.filter(col("vec_id") % 5 === 0)
    val idx = Similarity.buildPq(baseE, col("vec_id"), col("embedding"),
      m = 8, ksub = 16, materialize = true)
    val grown = Similarity.pqInsert(idx, deltaE, col("vec_id"), col("embedding"))
    assert(grown.codes.count() == baseE.count() + deltaE.count())
    // codebooks are the SAME driver-held object — frozen
    assert(grown.codebooks eq idx.codebooks)
    // re-inserting is deterministic: identical codes both times
    val again = Similarity.pqInsert(idx, deltaE, col("vec_id"), col("embedding"))
    def codeMap(p: Similarity.PqIndex) = p.codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codeMap(grown) == codeMap(again))
    // base vectors' ADC scores are unchanged by the insert (same codes,
    // same codebooks, same lookup table)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toSeq
    val before = Similarity.pqSearchAdc(idx, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val after = Similarity.pqSearchAdc(grown, q, k = baseE.count().toInt)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    before.foreach { case (id, s) => assert(after(id) == s) }
  }

  test("IVF-PQ insert: frozen cells and codebooks, counts add, deterministic " +
      "re-encode, base ADC scores bit-identical before and after") {
    val baseE = embs.filter(col("vec_id") % 5 =!= 0)
    val deltaE = embs.filter(col("vec_id") % 5 === 0)
    val idx = Similarity.buildIvfPq(baseE, col("vec_id"), col("embedding"),
      nCells = 4, m = 8, ksub = 16, materialize = true)
    val grown = Similarity.ivfPqInsert(idx, deltaE, col("vec_id"), col("embedding"))
    assert(grown.codes.count() == baseE.count() + deltaE.count())
    assert(grown.pq.codes.count() == baseE.count() + deltaE.count())
    // both quantizer levels are the SAME driver-held objects — frozen
    assert(grown.cells eq idx.cells)
    assert(grown.pq.codebooks eq idx.pq.codebooks)
    // re-inserting is deterministic: identical (cell, codes) both times
    val again = Similarity.ivfPqInsert(idx, deltaE, col("vec_id"), col("embedding"))
    def codeMap(p: Similarity.IvfPqIndex) = p.codes.collect()
      .map(r => r.getLong(r.fieldIndex("vid")) ->
        ((r.getAs[Number](r.fieldIndex("cell")).intValue(),
          r.getSeq[Int](r.fieldIndex("codes")).toSeq))).toMap
    assert(codeMap(grown) == codeMap(again))
    // an inserted vector is retrievable from the grown index's probed
    // cells (all-probe: provably exhaustive over base + delta)
    val insertedId = deltaE.select(col("vec_id")).orderBy(col("vec_id"))
      .head().getLong(0)
    val iq = deltaE.filter(col("vec_id") === insertedId)
      .head().getSeq[Float](1).map(_.toDouble).toSeq
    val hits = Similarity.ivfPqSearchAdc(grown, iq, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(hits.contains(insertedId))
    // base vectors' ADC scores are unchanged by the insert
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toSeq
    val before = Similarity.ivfPqSearchAdc(idx, q, k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val after = Similarity.ivfPqSearchAdc(grown, q, k = baseE.count().toInt,
        nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    before.foreach { case (id, s) => assert(after(id) == s) }
  }

  test("MMR: first pick is the relevance argmax, a clone of it is demoted " +
      "below a diverse runner-up, and picks never repeat") {
    import spark.implicits._
    // query along +x. v1 = top match but OFF-axis (if the top match
    // aligned with the query, λ=0.7 could never demote its clone:
    // any alternative's sim-to-pick-1 ≈ its own relevance and
    // 0.7r − 0.3r < 0.7 − 0.3 for r < 1). v2 = near-clone of v1,
    // v3 = mirrored across the query axis (similar rel, low sim to
    // v1), v4 = orthogonal filler.
    val q = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f))).toDF("q")
    val vecs = Seq(
      (1L, Seq(0.8f, 0.6f, 0.0f)), //  rel 0.800
      (2L, Seq(0.799f, 0.6f, 0.0f)), //  rel 0.7996, sim to v1 ≈ 1
      (3L, Seq(0.79f, -0.613f, 0.0f)), // rel 0.7901, sim to v1 ≈ 0.264
      (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val picks = Similarity.mmrRerank(vecs, col("vec_id"), col("embedding"),
        q, k = 3, nCandidates = 4, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picks.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // pick 1 = raw top relevance; pick 2 must SKIP the clone (vec 2,
    // cosine ≈ 1 to pick 1) for the diverse vec 3
    assert(picks(0)._2 == 1L)
    assert(picks(1)._2 == 3L)
    assert(picks.map(_._2).distinct.length == 3)
    // pure relevance order WOULD have taken the clone second
    val rel = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
      q, 2).collect().map(_.getLong(0)).toSeq
    assert(rel == Seq(1L, 2L))
  }

  test("IVF-PQ: pruned probe scans a strict subset of cells") {
    val idx = Similarity.buildIvfPq(embs, col("vec_id"), col("embedding"),
      nCells = 8, m = 16, ksub = 32)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    val p2 = Similarity.probeCellsFor(idx, qv, nprobe = 2)
    val pAll = Similarity.probeCellsFor(idx, qv, nprobe = 8)
    assert(p2.length == 2 && p2.toSet.subsetOf(pAll.toSet))
    // probed rows are the probed cells' rows only
    val scanned = idx.codes
      .filter(col("cell").isin(p2.map(Integer.valueOf): _*)).count()
    val total = idx.codes.count()
    assert(scanned < total)
    // per-id ADC scores are identical between pruned and all-probe runs
    // (the lookup tables are per-cell, so probing more cells can only ADD
    // candidates, never change a score) — and every pruned hit lives in a
    // probed cell. Recall itself is pinned by the oracle gate (q218) at
    // corpus scale; this 499-vector fixture legitimately spreads true
    // neighbors across cells.
    val pruned = Similarity.ivfPqSearchAdc(idx, qv, k = 10, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = Similarity.ivfPqSearchAdc(idx, qv, k = 499, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pruned.keySet.forall(id => full(id) == pruned(id)))
    val cellOf = idx.codes.select(col("vid"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue()).toMap
    assert(pruned.keySet.forall(id => p2.contains(cellOf(id))))
    info(s"IVFPQ pruned∩all-probe-top10 = " +
      s"${pruned.keySet.count(Similarity.ivfPqSearchAdc(idx, qv, k = 10, nprobe = 8)
        .collect().map(_.getLong(0)).toSet)}/10, scanned $scanned/$total")
  }

  test("q247's base is maintained state: ivfPqBase memoizes (one build " +
      "per session+corpus) and the timed path trains nothing") {
    import graft.util.Maintenance
    Maintenance.invalidate("ivfPqBase", spark, sf)
    val base1 = AnnQueries.ivfPqBase(spark, sf)
    val base2 = AnnQueries.ivfPqBase(spark, sf)
    // reference identity: the second call returned the memo, not a
    // rebuild — so q247's timed line starts from prebuilt state
    assert(base1 eq base2)
    // what the timed line DOES run — ivfPqInsert — keeps every quantizer
    // frozen: identical cells and codebooks, i.e. no training stage
    val delta = embs.filter(col("vec_id") % 5 === 0)
    val grown = Similarity.ivfPqInsert(base1, delta,
      col("vec_id"), col("embedding"))
    assert(grown.cells.zip(base1.cells).forall { case ((ci, a), (cj, b)) =>
      ci == cj && a.toSeq == b.toSeq })
    assert(grown.pq.codebooks.flatten.map(_.toSeq) ==
      base1.pq.codebooks.flatten.map(_.toSeq))
    assert(grown.codes.count() == base1.codes.count() + delta.count())
  }
}
