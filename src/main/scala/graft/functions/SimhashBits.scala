package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64 packed SimHash bit counters. */
final case class SimhashCounters(c: Array[Long])

/** Per-group SimHash accumulation as ONE typed Aggregator instead of 64
  * conditional-sum agg columns.
  *
  * The 64-column formulation was round 1's slowest query (22 s at sf0.1):
  * the generated update method is too wide to JIT, and every one of the 64
  * columns re-evaluates its branch per row. This buffer does the same work
  * in a single 64-iteration primitive loop per (token-hash, count) row —
  * JIT-friendly, mergeable (map-side combine ships one 64-long buffer per
  * group per map task), and O(1) memory per group.
  *
  * Input: (h, cnt) where `h` is the 64-bit token hash and `cnt` its
  * multiplicity in the document. Output: the 64-bit SimHash signature
  * (bit i set iff the weighted sum of bit i over tokens is positive).
  */
object SimhashBits extends Aggregator[(Long, Long), SimhashCounters, Long] {

  override def zero: SimhashCounters = SimhashCounters(new Array[Long](64))

  override def reduce(b: SimhashCounters, in: (Long, Long)): SimhashCounters = {
    val h = in._1
    val cnt = in._2
    var i = 0
    while (i < 64) {
      b.c(i) += (if (((h >>> i) & 1L) == 1L) cnt else -cnt)
      i += 1
    }
    b
  }

  override def merge(a: SimhashCounters, b: SimhashCounters): SimhashCounters = {
    var i = 0
    while (i < 64) { a.c(i) += b.c(i); i += 1 }
    a
  }

  override def finish(b: SimhashCounters): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (b.c(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def bufferEncoder: Encoder[SimhashCounters] = Encoders.product[SimhashCounters]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
