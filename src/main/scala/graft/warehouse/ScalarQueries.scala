package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.cents

/** Scalar-function surface (SURVEY.md §2.7): string normalization /
  * matching, date parts and arithmetic, math. These are the functions the
  * reference applies imperatively in its handlers (header normalization,
  * money parsing, ISO-date parsing) re-expressed as codegen'd Catalyst
  * built-ins — all run inside WholeStageCodegen, no UDFs.
  *
  * Float parity: only IEEE-exact operations (abs/floor/ceil/mod/sqrt,
  * greatest/least) appear in oracle-checked outputs; `round` on computed
  * doubles is avoided (engines disagree at .5 boundaries).
  */
object ScalarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- string functions over documents: the reference's header
    //    normalization (lower + replace) plus match/extract/split.
    "q20_string_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(col("lang")).as("lang_uc"),
          // int widths pinned to BIGINT: Spark length/size return int32,
          // DuckDB LENGTH/LEN return int64 (round-1 verdict).
          length(col("text")).cast("long").as("text_len"),
          regexp_extract(col("text"), "^(\\S+)", 1).as("first_word"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          replace(lower(col("source")), lit("src"), lit("source_")).as("source_norm"),
          col("text").contains("join").as("mentions_join"))
        .orderBy(col("doc_id"))
    },

    // -- date/time functions over orders: parts + date arithmetic.
    "q21_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          // Spark year()/quarter()/month() are int32; DuckDB EXTRACT is
          // int64 — pin to BIGINT (round-1 verdict).
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(date_add(to_date(col("o_orderdate")), 30)).as("latest_due"))
        .orderBy(col("yr"), col("qtr"), col("mo"))
    },

    // -- math functions over lineitem (IEEE-exact subset).
    "q23_math_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1 && col("l_orderkey") <= 500)
        .select(
          col("l_orderkey"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          (col("l_quantity") % 7).as("qty_mod7"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"))
        .orderBy(col("l_orderkey"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q20_string_funcs" ->
      """SELECT doc_id, UPPER(lang) AS lang_uc, LENGTH(text) AS text_len,
        |  REGEXP_EXTRACT(text, '^(\S+)', 1) AS first_word,
        |  LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n_tokens,
        |  REPLACE(LOWER(source), 'src', 'source_') AS source_norm,
        |  CONTAINS(text, 'join') AS mentions_join
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_date_funcs" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
        |  EXTRACT(QUARTER FROM o_orderdate) AS qtr,
        |  EXTRACT(MONTH FROM o_orderdate) AS mo,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
        |  MIN(CAST(o_orderdate AS DATE)) AS first_day,
        |  MAX(CAST(o_orderdate AS DATE) + 30) AS latest_due
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, qtr, mo""".stripMargin,

    "q23_math_funcs" ->
      """SELECT l_orderkey,
        |  ABS(l_quantity - 25) AS qty_dev,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        |  l_quantity % 7 AS qty_mod7,
        |  SQRT(l_quantity) AS qty_sqrt,
        |  GREATEST(l_tax, l_discount) AS max_rate,
        |  LEAST(l_tax, l_discount) AS min_rate
        |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey <= 500
        |ORDER BY l_orderkey""".stripMargin
  )
}
