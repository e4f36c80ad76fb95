package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal-column operator surface: binary blobs + typed metadata over
  * the documents table (utf-8 bytes standing in for media payloads —
  * TESTDATA has no real media; the plumbing is what's exercised).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- binary column contract: blob + metadata struct, oracle-checkable
    //    through byte length and checksum.
    "q44_multimodal_binary" -> { (s, d) =>
      Multimodal.asMediaTable(
          Tables.documents(s, d), col("doc_id"), col("text"), "text/plain")
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
        .orderBy(col("media_id"))
    },

    // -- frame sampling + feature extraction (stubbed decode; rows-only
    //    check — mapPartitions output has no SQL twin). Aggregated so the
    //    result is small at any sf.
    "q48_multimodal_features" -> { (s, d) =>
      val media = Multimodal.asMediaTable(
        Tables.documents(s, d), col("doc_id"), col("text"), "text/plain")
      val frames = media.withColumn("frames",
        Multimodal.frameSample(col("media"), frameBytes = 32, stride = 24, maxFrames = 4))
      val feats = Multimodal.extractFeatures(media)
      feats.join(frames.select(col("media_id"), size(col("frames")).as("n_frames")), Seq("media_id"))
        .select(col("media_id"), col("n_frames"),
          element_at(col("features"), 5).as("n_bytes_feat"),
          element_at(col("features"), 1).as("bin0"))
        .orderBy(col("media_id"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q44_multimodal_binary" ->
      """SELECT doc_id AS media_id, 'text/plain' AS format,
        |  OCTET_LENGTH(ENCODE(text)) AS n_bytes, MD5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
