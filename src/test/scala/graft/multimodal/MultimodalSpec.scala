package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit coverage of the multimodal stubs beyond the q44/q48 oracle gates:
  * the fixed-shape resize contract, frame-sampling edges, and decode
  * degenerate inputs.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resizeStub: block means, fixed output length, degenerate inputs") {
    // 8 bytes -> 4 taps of 2-byte means
    val b = Array[Byte](0, 10, 20, 30, 40, 50, 60, 70)
    assert(Multimodal.resizeStub(b, 4).toSeq == Seq(5.0, 25.0, 45.0, 65.0))
    // upsampling a 2-byte payload to 4 taps: blocks [0,0),[0,1),[1,1),[1,2)
    // — empty blocks stay 0, the shape contract holds
    val up = Multimodal.resizeStub(Array[Byte](100, 120.toByte), 4)
    assert(up.length == 4 && up.toSeq == Seq(0.0, 100.0, 0.0, 120.0))
    // unsigned byte domain: 0xFF averages as 255, not -1
    assert(Multimodal.resizeStub(Array[Byte](-1, -1), 1).toSeq == Seq(255.0))
    assert(Multimodal.resizeStub(null, 3).toSeq == Seq(0.0, 0.0, 0.0))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 2).toSeq == Seq(0.0, 0.0))
    intercept[IllegalArgumentException] { Multimodal.resizeStub(b, 0) }
  }

  test("resized: mapPartitions path emits one fixed-length row per media id") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "")).toDF("id", "payload"),
      col("id"), col("payload"), "utf8")
    val out = Multimodal.resized(media, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out.values.forall(_.length == 4))
    // 'abcdefgh' = bytes 97..104 -> pairwise means
    assert(out(1L) == Seq(97.5, 99.5, 101.5, 103.5))
    assert(out(3L) == Seq(0.0, 0.0, 0.0, 0.0)) // empty payload
  }

  test("frameSample: stride windows, tail truncation, past-end drop") {
    val df = Seq(("abcdefgh")).toDF("s")
      .select(encode(col("s"), "UTF-8").as("media"))
    val frames = df.select(
        Multimodal.frameSample(col("media"), frameBytes = 3, stride = 4,
          maxFrames = 4).as("f"))
      .head().getSeq[Array[Byte]](0)
    // windows at offsets 0 and 4 survive; 8 and 12 are past the end
    assert(frames.map(new String(_, "UTF-8")) == Seq("abc", "efg"))
  }

  test("decodeStub: null-safe, histogram + length shape") {
    assert(Multimodal.decodeStub(null).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // bytes 0x00 (bin 0), 0x40 (bin 1), 0x80 (bin 2), 0xC0 (bin 3)
    val f = Multimodal.decodeStub(Array[Byte](0x00, 0x40, 0x80.toByte, 0xC0.toByte))
    assert(f.toSeq == Seq(1.0, 1.0, 1.0, 1.0, 4.0))
  }

  test("aHash48: perceptually stable under a small edit, md5 is not") {
    import org.apache.spark.sql.functions.{col, md5, lit}
    // strong block structure: low-byte half then high-byte half
    val base = "a" * 480 + "z" * 480
    val edited = "a" * 240 + "b" + "a" * 239 + "z" * 480 // 1 char changed
    val uniform = ("az" * 480).take(960)                 // flat block means
    val df = Seq((1L, base), (2L, edited), (3L, uniform)).toDF("id0", "t")
    val h = MultimodalQueries.aHash48(df, col("id0"), col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))   // the edit does not move any block across the mean
    assert(h(1L) != h(3L))   // different structure -> different hash
    assert(h(3L) == 0L)      // no block strictly above a flat mean
    val md = df.select(col("id0"), md5(col("t")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(md(1L) != md(2L)) // the cryptographic gate separates the pair
  }
}
