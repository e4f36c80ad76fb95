package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k buffer: parallel arrays sorted by (value desc, key
  * asc), never longer than k. */
final case class TopKBuf(vals: Array[Double], keys: Array[Long])

/** Map-side-combinable top-k per group (A8 + W5): the window
  * `row_number() <= k` formulation sorts every partition of every group;
  * this Aggregator keeps an O(k) buffer per group and merges buffers, so
  * the shuffle carries k rows per group per map task instead of the whole
  * group — the difference between sorting 100 TB and sorting k×groups
  * rows. Order: value desc, key asc (deterministic ties).
  */
class TopKByValue(k: Int) extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def better(v1: Double, k1: Long, v2: Double, k2: Long): Boolean =
    v1 > v2 || (v1 == v2 && k1 < k2)

  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf =
    merge(b, TopKBuf(Array(in._1), Array(in._2)))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val n = math.min(k, a.vals.length + b.vals.length)
    val vals = new Array[Double](n)
    val keys = new Array[Long](n)
    var (i, j, o) = (0, 0, 0)
    while (o < n) {
      val takeA = j >= b.vals.length ||
        (i < a.vals.length && better(a.vals(i), a.keys(i), b.vals(j), b.keys(j)))
      if (takeA) { vals(o) = a.vals(i); keys(o) = a.keys(i); i += 1 }
      else { vals(o) = b.vals(j); keys(o) = b.keys(j); j += 1 }
      o += 1
    }
    TopKBuf(vals, keys)
  }

  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
