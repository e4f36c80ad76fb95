package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LmQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- q214: exact repeated-substring scrub ---------------------------

  private val passage = "p1 p2 p3 p4" // 4 tokens, scrub width 4 below

  test("substring scrub: later occurrence removed, first kept") {
    val docs = Seq(
      (1L, s"u1 u2 $passage u3"),
      (2L, s"v1 $passage v2 v3") // repeats doc 1's passage
    ).toDF("doc_id", "text")
    val out = LmQueries.substringScrub(docs, col("doc_id"), col("text"), n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 0L, s"u1 u2 $passage u3"))) // first occurrence intact
    assert(out(2L) == ((7L, 4L, "v1 v2 v3")))           // passage cut, rest kept
  }

  test("substring scrub: overlapping windows merge into one covered span") {
    // doc 2 repeats a 6-token passage; its three 4-token windows overlap,
    // and coverage must count each token once (6 removed, not 3*4).
    val p6 = "p1 p2 p3 p4 p5 p6"
    val docs = Seq((1L, p6), (2L, s"x1 $p6 x2")).toDF("doc_id", "text")
    val out = LmQueries.substringScrub(docs, col("doc_id"), col("text"), n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, p6)))
    assert(out(2L) == ((6L, "x1 x2")))
  }

  test("substring scrub: fully-duplicated doc surfaces with empty text") {
    val docs = Seq((1L, passage), (2L, passage)).toDF("doc_id", "text")
    val out = LmQueries.substringScrub(docs, col("doc_id"), col("text"), n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((4L, 0L, passage)))
    assert(out(2L) == ((4L, 4L, "")))
  }

  test("substring scrub: within-document repetition is NOT scrubbed") {
    // the pass dedups ACROSS documents; a doc repeating its own passage
    // keeps both copies (within-doc repetition is q79's signal).
    val docs = Seq((1L, s"$passage $passage")).toDF("doc_id", "text")
    val out = LmQueries.substringScrub(docs, col("doc_id"), col("text"), n = 4)
      .collect()
    assert(out.head.getLong(2) == 0L)
  }

  // --- q215: BM25 -----------------------------------------------------

  test("bm25: more matching terms and higher tf rank higher; misses absent") {
    val docs = Seq(
      (1L, "fast merge table x y z"),     // all 3 query terms
      (2L, "fast x y z w v"),             // 1 term
      (3L, "fast fast x y z w"),          // same term twice
      (4L, "a b c d e f")                 // no terms
    ).toDF("doc_id", "text")
    val out = LmQueries.bm25(docs, col("doc_id"), col("text"),
        terms = Seq("fast", "merge", "table"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = out.map(_._1)
    assert(!ids.contains(4L))
    val byId = out.map(o => o._1 -> o).toMap
    assert(byId(1L)._2 == 3L && byId(2L)._2 == 1L)
    // doc 1 matches 3 terms vs doc 2's one: strictly higher score
    assert(byId(1L)._3 > byId(2L)._3)
    // doc 3 has tf=2 of 'fast' at equal length: beats doc 2's tf=1
    assert(byId(3L)._3 > byId(2L)._3)
    // output is sorted by score desc
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(-_).toSeq)
  }

  test("bm25: rarer term carries higher idf weight") {
    // 'rare' in 1 of 4 docs, 'common' in 3 of 4; equal tf and dl.
    val docs = Seq(
      (1L, "rare x y"), (2L, "common x y"),
      (3L, "common x y"), (4L, "common x y")
    ).toDF("doc_id", "text")
    val out = LmQueries.bm25(docs, col("doc_id"), col("text"),
        terms = Seq("rare", "common"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
    assert(out(2L) == out(3L)) // identical docs, identical score
  }

  // --- q216: integer-exact bigram LM bits -----------------------------

  test("lm bits: floor(log2 count) per bigram occurrence, exact") {
    // corpus: 'a b' appears 4 times (2 bits), 'b a' 3 times (1 bit),
    // 'b c' once (0 bits).
    val docs = Seq(
      (1L, "a b a b a b c"), // bigrams: ab ba ab ba ab bc
      (2L, "a b")            // ab
    ).toDF("doc_id", "text")
    val out = LmQueries.lmBits(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: ab(4c->2) *3 + ba(3c->1) *2 + bc(1c->0) = 8 bits / 6 bigrams
    assert(out(1L) == ((6L, 8L, 8.0 / 6.0)))
    // doc 2: one ab -> 2 bits
    assert(out(2L) == ((1L, 2L, 2.0)))
  }

  test("lm bits: sub-bigram docs score zero, not null") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val out = LmQueries.lmBits(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L)
  }

  // --- q217: BPE merge-rule training ----------------------------------

  test("bpe train: learns count-ordered merges with greedy replace") {
    // vocab: 'aaab' x3, 'ab' x2 -> pair counts round 1:
    //   (a,a): 2 per 'aaab' x3 = 6; (a,b): 3 + 2 = 5  -> merge (a,a) n=6
    // round 2 on {'aa␟ab'?}: 'aaab' -> aa␟a␟b (greedy left-to-right),
    //   pairs: (aa,a)=3, (a,b)=3+2=5 -> merge (a,b) n=5
    // round 3: 'aa␟ab' pairs (aa,ab)=3 -> merge (aa,ab) n=3
    // round 4: vocab fully merged -> early stop.
    val docs = Seq(
      (1L, "aaab aaab aaab ab ab")
    ).toDF("doc_id", "text")
    val out = LmQueries.bpeTrain(docs, col("doc_id"), col("text"), rounds = 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "b", 5L),
      (3L, "aa", "ab", 3L)))
  }

  test("bpe train: tie-break is deterministic (count desc, left, right)") {
    // 'xy' and 'ab' both appear twice: (a,b)=2 and (x,y)=2 tie; the
    // lexicographically first pair (a,b) must win round 1.
    val docs = Seq((1L, "xy ab xy ab")).toDF("doc_id", "text")
    val out = LmQueries.bpeTrain(docs, col("doc_id"), col("text"), rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", 2L)))
  }
}
