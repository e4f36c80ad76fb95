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

    // -- frame sampling + feature extraction through the REAL mapPartitions
    //    seam. The decode stub is a pure function of the bytes, so the
    //    result is oracle-checkable after all (round-3): frame count falls
    //    out of the byte length and stride; histogram bin 0 counts bytes
    //    0x00–0x3F, which UTF-8 produces ONLY for code points U+0000–003F
    //    (continuation bytes are ≥ 0x80), so the oracle can count those
    //    characters — byte-exact even on CJK text.
    "q48_multimodal_features" -> { (s, d) =>
      val media = Multimodal.asMediaTable(
        Tables.documents(s, d), col("doc_id"), col("text"), "text/plain")
      val frames = media.withColumn("frames",
        Multimodal.frameSample(col("media"), frameBytes = 32, stride = 24, maxFrames = 4))
      val feats = Multimodal.extractFeatures(media)
      feats.join(frames.select(col("media_id"), size(col("frames")).cast("long").as("n_frames")), Seq("media_id"))
        .select(col("media_id"), col("n_frames"),
          element_at(col("features"), 5).as("n_bytes_feat"),
          element_at(col("features"), 1).as("bin0"))
        .orderBy(col("media_id"))
    },

    // -- frame-level dedup: hash every sampled frame window and measure
    //    per-source redundancy — the media analog of q40's exact document
    //    dedup (near-identical clips share frame hashes even when the
    //    container bytes differ). Frames never shuffle: the hash is a
    //    per-row projection over the explode, and only (source, 16-byte
    //    hash) pairs reach the distinct aggregate. The testdata corpus is
    //    pure ASCII, so the oracle replays the byte windows as character
    //    substrings — byte-offset parity holds by construction and the
    //    md5s match exactly.
    "q160_frame_dedup" -> { (s, d) =>
      val media = Multimodal.asMediaTable(
          Tables.documents(s, d), col("doc_id"), col("text"), "text/plain")
        .join(Tables.documents(s, d).select(col("doc_id").as("media_id"),
          col("source")), Seq("media_id"))
      media
        .withColumn("frame", explode(Multimodal.frameSample(
          col("media"), frameBytes = 64, stride = 48, maxFrames = 8)))
        .select(col("source"), md5(col("frame")).as("fh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("fh")).as("n_distinct_frames"))
        .withColumn("dup_ratio",
          lit(1.0) - col("n_distinct_frames").cast("double") /
            col("n_frames").cast("double"))
        .orderBy(col("source"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q48_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN 0
        |    ELSE LEAST(4, (OCTET_LENGTH(ENCODE(text)) - 1) // 24 + 1) END AS n_frames,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) AS n_bytes_feat,
        |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[\x00-\x3F]', '', 'g')) AS DOUBLE) AS bin0
        |FROM documents ORDER BY media_id""".stripMargin,

    "q160_frame_dedup" ->
      """WITH f AS (
        |  SELECT source, UNNEST([SUBSTRING(text, i*48 + 1, 64)
        |    FOR i IN RANGE(0, 8)]) AS fr
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_frames,
        |  COUNT(DISTINCT MD5(fr)) AS n_distinct_frames,
        |  1.0 - CAST(COUNT(DISTINCT MD5(fr)) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |FROM f WHERE LENGTH(fr) > 0
        |GROUP BY 1 ORDER BY source""".stripMargin,

    "q44_multimodal_binary" ->
      """SELECT doc_id AS media_id, 'text/plain' AS format,
        |  OCTET_LENGTH(ENCODE(text)) AS n_bytes, MD5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
