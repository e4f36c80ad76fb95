package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Sketch-based operators (SURVEY.md §2.4 A4 family): Bloom-filter
  * semi-join pre-filtering and Count-Min frequency estimation — the
  * runtime-filter patterns that matter at 100 TB (ship a few KB of sketch
  * to every scan task instead of shuffling the dimension side). Sketch
  * bits are engine-specific, so these are rows-only checked; SketchSpec
  * pins the semantic guarantees (no false negatives, overestimate-only).
  */
object SketchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Bloom semi-join: build a filter over high-value order keys, probe
    //    the fact table. might_contain admits false positives but never
    //    false negatives, so bloom_hits >= exact_hits always. The
    //    expressions exist in Catalyst (they power runtime filtering) but
    //    are not SQL-registered — exposed here via temp functions; the
    //    probe side must see the filter as a scalar subquery
    //    (BloomFilterMightContain requires a constant-foldable filter).
    "q70_bloom_semi_join" -> { (s, d) =>
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
        "scala_udf")
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)),
        "scala_udf")
      Tables.orders(s, d).createOrReplaceTempView("orders_bf")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_bf")
      s.sql(
        """SELECT
          |  (SELECT COUNT(*) FROM lineitem_bf
          |   WHERE graft_might_contain(
          |     (SELECT graft_bloom_agg(o_orderkey, 50000L, 400000L)
          |      FROM orders_bf WHERE o_totalprice > 300000),
          |     l_orderkey)) AS bloom_hits,
          |  (SELECT COUNT(*) FROM lineitem_bf
          |   WHERE l_orderkey IN (SELECT o_orderkey FROM orders_bf
          |     WHERE o_totalprice > 300000)) AS exact_hits""".stripMargin)
    },

    // -- Count-Min frequency sketch: estimated per-key frequencies are
    //    always >= true frequencies (collision adds, never subtracts).
    "q71_count_min" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events_cms")
      s.sql(
        """WITH sk AS (
          |  SELECT hex(count_min_sketch(event_type, 0.01d, 0.99d, 42)) AS sketch_hex
          |  FROM events_cms)
          |SELECT length(sketch_hex) AS sketch_hex_len FROM sk""".stripMargin)
    }
  )

  // sketch internals are engine-specific: rows-only checks
  def oracleSql: Map[String, String] = Map()
}
