package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch feature extraction.
  *
  * The decode step is STUBBED (no media libraries in this environment):
  * [[decodeStub]] produces deterministic fake features from the raw bytes.
  * Everything around it — the schema contract, binary column handling,
  * partition-sized batch iteration in [[extractFeatures]], frame sampling
  * by byte offset — is the real Spark-side machinery a production decoder
  * (JNI/FFI image lib, or a Python `mapInPandas` stage in a mixed
  * pipeline) would plug into: swap `decodeStub` for the real codec and the
  * plan does not change.
  *
  * Scale notes: media blobs never pass through a shuffle here — metadata
  * extraction and feature stubs are per-row projections; `extractFeatures`
  * is mapPartitions, so a real decoder amortizes model/codec init once per
  * partition, not per row.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))), nullable = true)))

  /** Wrap any table with a text column into the media contract (stand-in
    * encode: utf-8 bytes as the opaque blob). */
  def asMediaTable(df: DataFrame, id: Column, payload: Column, format: String): DataFrame =
    df.select(
      id.cast("long").as("media_id"),
      encode(payload, "UTF-8").as("media"))
      .withColumn("meta", struct(
        lit(format).as("format"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("checksum")))

  /** "Frame sample": `maxFrames` windows of `frameBytes` bytes taken every
    * `stride` bytes — the shape of video frame sampling (seek + decode
    * window) without a codec. Windows past the end come back empty and are
    * filtered out. */
  def frameSample(media: Column, frameBytes: Int, stride: Int, maxFrames: Int): Column =
    filter(
      transform(
        sequence(lit(0), lit(maxFrames - 1)),
        i => media.substr(i * stride + 1, lit(frameBytes))),
      f => length(f) > 0)

  /** Deterministic fake "decode": 4-bin byte histogram + length, standing
    * in for pixel/audio feature extraction. Pure function of the bytes. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null) return Array.fill(5)(0.0)
    val bins = new Array[Double](4)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xFF) >> 6) += 1.0
      i += 1
    }
    bins :+ bytes.length.toDouble
  }

  /** Deterministic "resize" stub: block-average the byte stream down to
    * exactly `outLen` taps (0..255 domain) — the shape of image/audio
    * downsampling (decode → pool → re-encode) without a codec. Block i
    * covers bytes [i·n/outLen, (i+1)·n/outLen); empty blocks (input
    * shorter than outLen) and null payloads yield 0-taps, so the output
    * length is ALWAYS outLen — the fixed-shape contract a model input
    * pipeline needs. Pure function of the bytes. */
  def resizeStub(bytes: Array[Byte], outLen: Int): Array[Double] = {
    require(outLen >= 1, s"outLen must be positive, got $outLen")
    val out = new Array[Double](outLen)
    if (bytes == null || bytes.length == 0) return out
    val n = bytes.length
    var i = 0
    while (i < outLen) {
      val lo = (i.toLong * n / outLen).toInt
      val hi = ((i + 1).toLong * n / outLen).toInt
      if (hi > lo) {
        var s = 0.0
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xFF); j += 1 }
        out(i) = s / (hi - lo)
      }
      i += 1
    }
    out
  }

  /** Partition-batched resize over the media table — same mapPartitions
    * codec seam as [[extractFeatures]]. Output: (media_id, taps array of
    * exactly `outLen` doubles). */
  def resized(mediaTable: DataFrame, outLen: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("taps", ArrayType(DoubleType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    mediaTable.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, resizeStub(bytes, outLen).toSeq)
        }
      }(encoder)
  }

  /** Partition-batched feature extraction over the media table: the
    * mapPartitions seam where a real decoder (codec, model) initializes
    * once per partition. Output: (media_id, features array). */
  def extractFeatures(mediaTable: DataFrame): DataFrame = {
    val spark = mediaTable.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    mediaTable.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        // per-partition init happens here (codec/model handle)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, decodeStub(bytes).toSeq)
        }
      }(encoder)
  }
}
