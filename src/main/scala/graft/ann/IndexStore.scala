package graft.ann

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hfs

/** Version-stamped PERSISTED index format (SURVEY §9.10 follow-on): a
  * refreshed IVF index publishes to a directory through the same
  * manifest-pointer commit discipline as the merge table
  * ([[graft.cdc.Apply]]) — so an index maintenance job (the doubling-
  * policy rebuild) can hand a new index to running readers without any
  * shared session, and a crashed writer leaves readers untouched.
  *
  * Layout:
  * {{{
  *   dir/_graft_index_meta.json   <- {"format", "gen", "baseRows"}  (the pointer)
  *   dir/gen=G/centroids/         <- parquet (cell, c)
  *   dir/gen=G/assigned/          <- parquet (vid, v), PARTITIONED BY cell
  * }}}
  *
  * A new generation's data dirs are invisible until the one-object
  * atomic meta flip ([[Hfs.writeStringAtomic]] — the object-store PUT);
  * superseded generations are deleted only AFTER the flip and only
  * beyond a retention window, so a reader holding the previous meta
  * keeps scanning intact files (the Apply deferred-GC contract).
  *
  * The assigned table is written `partitionBy("cell")` — the
  * [[Similarity]] scaladoc's "assignment column doubles as a partition
  * key" claim made physical: [[searchPruned]] filters on the probed
  * cell ids (bounded driver metadata — the centroid ranking), which
  * plans as STATIC partition pruning — whole files of non-probed cells
  * are never opened (`PartitionFilters` in the scan, pinned by
  * IndexStoreSpec). At 100 TB a probe reads ~nprobe/nCentroids of the
  * files instead of scanning everything into a join.
  */
object IndexStore {

  private val MetaName = "_graft_index_meta.json"
  private val Format = "graft-ivf-v1"

  final case class Meta(format: String, gen: Long, baseRows: Long)

  private val MetaRe =
    """\{"format": "([^"]+)", "gen": ([0-9]+), "baseRows": ([0-9]+)\}""".r

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] = {
    val p = new HPath(new HPath(dir), MetaName)
    val hc = Hfs.conf(spark)
    if (!Hfs.exists(p, hc)) None
    else Hfs.readString(p, hc).trim match {
      case MetaRe(f, g, n) => Some(Meta(f, g.toLong, n.toLong))
      case other => sys.error(
        s"unparseable index manifest at $p: '${other.take(120)}' " +
          "(refusing to guess — the pointer is the commit)")
    }
  }

  /** Publish `index` to `dir` as the next generation and flip the
    * pointer. Returns the committed generation id. `retainGens` ≥ 1:
    * how many generations stay on disk after the flip (readers that
    * loaded an older meta keep working until their generation ages
    * out — the deferred-GC grace window). */
  def saveIvf(index: Similarity.IvfIndex, dir: String,
      retainGens: Int = 2): Long = {
    require(retainGens >= 1, s"retainGens must be >= 1, got $retainGens")
    val spark = index.assigned.sparkSession
    val hc = Hfs.conf(spark)
    val prev = readMeta(spark, dir)
    prev.foreach(m => require(m.format == Format,
      s"$dir holds a '${m.format}' index; refusing to overwrite with $Format"))
    val gen = prev.map(_.gen + 1).getOrElse(0L)
    // 1. write the new generation's data — invisible, nothing points at it
    index.centroids.write.mode("overwrite")
      .parquet(s"$dir/gen=$gen/centroids")
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/gen=$gen/assigned")
    val n = index.assigned.count()
    // 2. the commit: one atomic pointer PUT
    Hfs.writeStringAtomic(new HPath(new HPath(dir), MetaName),
      s"""{"format": "$Format", "gen": $gen, "baseRows": $n}""", hc)
    // 3. deferred GC — only generations beyond the retention window,
    //    only after the flip (non-live under both old and new pointers)
    val cutoff = gen - (retainGens - 1)
    Hfs.list(new HPath(dir), hc).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("gen=") && name.stripPrefix("gen=").toLong < cutoff)
        Hfs.delete(st.getPath, hc)
    }
    gen
  }

  /** Load the CURRENT generation. The returned index is probe-ready
    * ([[Similarity.ivfSearch]] works as-is); [[searchPruned]] adds the
    * partition-pruned scan path the layout exists for. Also returns the
    * meta so a maintenance caller can seed the growth policy
    * (`Maintenance.noteBaseSize(..., meta.baseRows)`). */
  def loadIvf(spark: SparkSession, dir: String): (Similarity.IvfIndex, Meta) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed index at $dir (missing $MetaName)"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    val centroids = spark.read.parquet(s"$dir/gen=${m.gen}/centroids")
    val assigned = spark.read.parquet(s"$dir/gen=${m.gen}/assigned")
      .select(col("vid"), col("v"), col("cell"))
    (Similarity.IvfIndex(centroids, assigned), m)
  }

  /** IVF probe over a PERSISTED index via static partition pruning: the
    * cell ranking is centroid-table-sized driver metadata (the
    * ivfSearchAuto fetch pattern), and the resulting `cell IN (...)`
    * filter prunes whole partition directories at planning time — the
    * scan touches only the probed cells' files. Result ≡
    * [[Similarity.ivfSearch]] on the same index (same cells, same
    * cosine, same ties). */
  def searchPruned(index: Similarity.IvfIndex, query: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame = {
    import Similarity.cosine
    val probed = index.centroids
      .crossJoin(broadcast(query))
      .withColumn("sim", cosine(col("c"), col("q")))
      .orderBy(col("sim").desc, col("cell"))
      .limit(nprobe)
      .select(col("cell"))
      .collect().map(_.getAs[Number](0).intValue()).toSeq
    index.assigned
      .filter(col("cell").isin(probed: _*))
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(col("v"), col("q")))
      .select(col("vid").as("nn_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("nn_id"))
      .limit(k)
  }
}
