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
    },

    // -- perceptual-hash (aHash) dedup: the average-hash recipe — pool
    //    the payload into 48 blocks, one bit per block = block mean >
    //    global mean — on the stub modality (ASCII-normalized text
    //    bytes standing in for pixels, the resizeStub pooling
    //    boundaries). Every bit is a cleared-division integer compare
    //    (s_blk·L > S·l_blk), so the 48-bit hash is engine-bit-exact;
    //    48 bits keeps it positive in a signed BIGINT (the
    //    portableHash48 lesson). Shape: one (doc, block) map-side
    //    rollup + one doc rollup — per-doc work linear in payload,
    //    bucket-join dedup identical to exact-dedup's (q39/q40), but
    //    robust to small payload edits the way a cryptographic hash is
    //    not. md5-equality is q160's frame gate; THIS is the perceptual
    //    gate a real image pipeline uses.
    "q197_ahash_dedup" -> { (s, d) =>
      val hashes = aHash48(Tables.documents(s, d), col("doc_id"), col("text"))
      val sizes = hashes.groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_bucket"), min(col("id")).as("canon"))
      hashes.join(sizes, Seq("ahash"))
        .select(col("id").as("doc_id"), col("ahash"), col("n_bucket"),
          (col("id") === col("canon")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }
  )

  /** 48-bit average-hash of an ASCII-normalized payload: pool into 48
    * blocks (the resizeStub boundaries), bit = block mean > global mean
    * via the cleared-division compare s_blk·L > S·l_blk — all exact
    * integers. Robust to small payload edits (MultimodalSpec pins an
    * edited copy hashing identically while md5 diverges). Returns
    * `(id, ahash)`; docs whose normalized payload is empty are dropped. */
  def aHash48(df: DataFrame, id: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column): DataFrame = {
    val norm = regexp_replace(lower(trim(payload)), "[^a-z0-9 ]", "")
    val chars = filter(split(norm, ""), c => c =!= "")
    df.select(id.as("id"), chars.as("cs"))
      .withColumn("n", size(col("cs")))
      .filter(col("n") >= 1)
      .select(col("id"), col("n"), posexplode(col("cs")).as(Seq("p", "c")))
      .select(col("id"), col("n"),
        expr("(p * 48) div n").as("blk"), ascii(col("c")).as("code"))
      .groupBy(col("id"), col("blk"))
      .agg(sum(col("code")).as("s"), count(lit(1)).as("l"))
      // per-doc totals ride a ≤48-row window partition — bounded by the
      // block count, never by payload or corpus size
      .withColumn("s_tot", sum(col("s")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
      .withColumn("l_tot", sum(col("l")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
      .withColumn("bit",
        when(col("s") * col("l_tot") > col("s_tot") * col("l"), 1L)
          .otherwise(0L))
      .groupBy(col("id"))
      .agg(sum(col("bit") *
        expr("shiftleft(CAST(1 AS BIGINT), CAST(blk AS INT))")).as("ahash"))
  }

  def oracleSql: Map[String, String] = Map(
    "q48_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN 0
        |    ELSE LEAST(4, (OCTET_LENGTH(ENCODE(text)) - 1) // 24 + 1) END AS n_frames,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) AS n_bytes_feat,
        |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[\x00-\x3F]', '', 'g')) AS DOUBLE) AS bin0
        |FROM documents ORDER BY media_id""".stripMargin,

    "q197_ahash_dedup" ->
      """WITH nrm AS (
        |  SELECT doc_id,
        |    REGEXP_REPLACE(LOWER(TRIM(text)), '[^a-z0-9 ]', '', 'g') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, LEN(t) AS n, UNNEST(RANGE(1, LEN(t) + 1)) AS p, t
        |  FROM nrm WHERE LEN(t) >= 1),
        |ch AS (
        |  SELECT doc_id, ((p - 1) * 48) // n AS blk,
        |    ORD(SUBSTRING(t, p, 1)) AS code
        |  FROM pos),
        |blks AS (
        |  SELECT doc_id, blk, CAST(SUM(code) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS l
        |  FROM ch GROUP BY 1, 2),
        |tot AS (
        |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS st,
        |    CAST(SUM(l) AS BIGINT) AS lt
        |  FROM blks GROUP BY 1),
        |h AS (
        |  SELECT b.doc_id,
        |    CAST(SUM(CASE WHEN b.s * t.lt > t.st * b.l THEN 1 ELSE 0 END
        |      * (CAST(1 AS BIGINT) << CAST(b.blk AS INT))) AS BIGINT) AS ahash
        |  FROM blks b JOIN tot t ON b.doc_id = t.doc_id
        |  GROUP BY 1)
        |SELECT doc_id, ahash,
        |  CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_bucket,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY ahash) AS is_canonical
        |FROM h ORDER BY doc_id""".stripMargin,

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
