package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Data-quality operators — the Deequ-style profiling / validation pass
  * every warehouse landing runs before consumers trust a table. The
  * reference reconciles COUNT(*) parity (README.md:30); production
  * pipelines profile and assert much more, and both faces here are one
  * map-side-combinable aggregation pass each (a profile of a 100 TB
  * table costs one scan, not one scan per metric).
  */
object QualityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- column profile: null count + exact distinct count per column,
    //    computed in ONE aggregation (Catalyst plans multi-distinct via
    //    Expand: one scan, grouped partial aggs), emitted long-form.
    "q113_profile" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val long = cols.map { c =>
        wide.select(lit(c).as("column"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"))
      }.reduce(_.unionAll(_))
      long.orderBy(col("column"))
    },

    // -- validation suite: named integrity checks, one row per check
    //    with its violation count — uniqueness, referential integrity
    //    (orphaned facts), and domain constraints. Shapes: the unique
    //    check is a groupBy-HAVING, the FK check an anti join, the
    //    domain checks conditional sums on the scan.
    "q114_quality_checks" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val dupKeys = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
        .select(lit("orderkey_unique").as("check_name"), col("violations"))
      val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_fk_orders").as("check_name"), col("violations"))
      val domains = li.agg(
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("neg_price"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount"))
      val domainRows =
        domains.select(lit("price_nonnegative").as("check_name"),
            col("neg_price").as("violations"))
          .unionAll(domains.select(lit("discount_in_unit_range").as("check_name"),
            col("bad_discount").as("violations")))
      dupKeys.unionAll(orphans).unionAll(domainRows).orderBy(col("check_name"))
    },

    // -- functional-dependency profiling: does column A determine column
    //    B? Key → #distinct-dependents > 1 marks a violating key; the FD
    //    holds iff no key violates. The discovery pass schema designers
    //    and Deequ's uniqueness/consistency checks run — here over known
    //    candidates spanning a real key (orderkey→custkey), a real
    //    hierarchy (nationkey→regionkey), and two that genuinely fail.
    //    Each FD is one groupBy + one tiny re-agg, map-side combinable.
    "q125_fd_profile" -> { (s, d) =>
      def fd(df: DataFrame, name: String, k: String, v: String) =
        df.groupBy(col(k)).agg(countDistinct(col(v)).as("nd"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(name).as("fd_name"), col("n_keys"), col("n_violating"),
            (col("n_violating") === 0L).as("holds"))
      fd(Tables.orders(s, d), "orderkey_determines_custkey",
          "o_orderkey", "o_custkey")
        .unionAll(fd(Tables.nation(s, d), "nationkey_determines_regionkey",
          "n_nationkey", "n_regionkey"))
        .unionAll(fd(Tables.lineitem(s, d), "orderkey_determines_suppkey",
          "l_orderkey", "l_suppkey"))
        .unionAll(fd(Tables.documents(s, d), "source_determines_lang",
          "source", "lang"))
        .orderBy(col("fd_name"))
    },

    // -- outlier detection with EXACT arithmetic: flag orders beyond
    //    k·sigma of their segment mean without ever computing a float
    //    sigma. (x-mu)^2 > k^2*var cross-multiplies to
    //    (n*x - S)^2 > k^2*(n*Q - S^2) with S = sum(cents),
    //    Q = sum(cents^2) — every term an exact integer (DECIMAL(38,0)
    //    here, HUGEINT in the oracle; n*Q overflows BIGINT beyond
    //    sf0.01, so the widening is load-bearing), k rational (3/2,
    //    17/10). Two scans: one map-side-combinable stats pass (5 rows,
    //    broadcast back), one flagging pass. The data is uniform, so
    //    thresholds sit below uniform's sqrt(3)-sigma max deviation.
    "q129_outlier_zscore" -> { (s, d) =>
      val dec = "decimal(38,0)"
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          graft.util.Exact.cents(col("o_totalprice")).as("cents"))
      val st = base.groupBy(col("seg")).agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast(dec)).as("s"),
        sum((col("cents").cast(dec) * col("cents").cast(dec))).as("q"))
      base.join(broadcast(st), Seq("seg"))
        .withColumn("dev", col("n").cast(dec) * col("cents").cast(dec) - col("s"))
        .withColumn("dev2", col("dev") * col("dev"))
        .withColumn("var_n2", col("n").cast(dec) * col("q") - col("s") * col("s"))
        .groupBy(col("seg"), col("n"))
        .agg(
          sum(when(col("dev2") * 4 > col("var_n2") * 9, 1L).otherwise(0L))
            .as("n_out_15"),
          sum(when(col("dev2") * 100 > col("var_n2") * 289, 1L).otherwise(0L))
            .as("n_out_17"))
        .select(col("seg"), col("n").as("n_orders"),
          col("n_out_15"), col("n_out_17"))
        .orderBy(col("seg"))
    },

    // -- record linkage (the Fellegi–Sunter shape): candidate pairs from
    //    a BLOCKING key, an integer agreement score over the remaining
    //    fields, then a match threshold — the entity-resolution pass a
    //    warehouse runs before trusting "distinct customers". Blocking
    //    on (nation, segment) keeps pair generation quadratic only per
    //    block; at 100 TB a hot block gets the q115 salted-cap guard
    //    (cap per (block, hash(id)%S) then re-cap), and the q131
    //    PassJoin segment filter is the lossless upgrade when a string
    //    field drives the score. Agreement weights are exact-integer
    //    tiers (balance within $10: +4, within $100: +2, same sign: +1),
    //    so the score — and the ≥3 match gate — never touches a float.
    "q170_linkage_score" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          graft.util.Exact.cents(col("c_acctbal")).as("bal"))
      c.as("a").join(c.as("b"),
          col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(
          col("a.c_custkey").as("cust_a"), col("b.c_custkey").as("cust_b"),
          abs(col("a.bal") - col("b.bal")).as("bal_diff_cents"),
          ((col("a.bal") >= 0) === (col("b.bal") >= 0)).as("sgn"))
        .withColumn("score",
          when(col("bal_diff_cents") <= 1000L, 4L).otherwise(0L) +
            when(col("bal_diff_cents") <= 10000L, 2L).otherwise(0L) +
            when(col("sgn"), 1L).otherwise(0L))
        .filter(col("score") >= 3)
        .select(col("cust_a"), col("cust_b"), col("bal_diff_cents"), col("score"))
        .orderBy(col("cust_a"), col("cust_b"))
    },

    // -- Benford first-digit audit: the forensic-accounting screen for
    //    fabricated or truncated numeric columns. Observed first-digit
    //    shares in exact integer permille (n·1000 div total) against the
    //    Benford expectation (a 9-row constant table — log-free, the
    //    permilles are literals), deviation flagged at >50‰. TPC-H
    //    prices are uniform-ish so they SHOULD deviate — the audit
    //    reports that honestly; the operator is the screen, not the
    //    verdict. One map-side-combined digit rollup; everything after
    //    is a 9-row frame.
    "q174_benford" -> { (s, d) =>
      val benford = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
      val exp = benford.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
        when(col("digit") === (i + 1), lit(p)).otherwise(acc)
      }
      val digits = Tables.orders(s, d)
        .select(substring(graft.util.Exact.cents(col("o_totalprice"))
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val total = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          expr("(n * 1000) div total").as("obs_permille"),
          exp.as("benford_permille"))
        .withColumn("deviates",
          abs(col("obs_permille") - col("benford_permille")) > 50)
        .orderBy(col("digit"))
    },

    // -- contingency-table independence screen: nation × market-segment
    //    observed counts vs the independence expectation e = r·c/T —
    //    the correlation audit for categorical columns (a skewed cell
    //    here means a biased join key or a selection leak). The expected
    //    value is ONE IEEE division; the ±20% deviation flag clears that
    //    division first — 5·|o·T − r·c| > r·c — so the gate is exact
    //    integers. One map-side cell rollup, margins re-aggregated FROM
    //    the cells (no second table scan), broadcast back; 125 rows.
    "q178_contingency" -> { (s, d) =>
      val cells = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("o"))
      val rows = cells.groupBy(col("c_nationkey")).agg(sum(col("o")).as("r"))
      val cols = cells.groupBy(col("c_mktsegment")).agg(sum(col("o")).as("c"))
      val tot = cells.agg(sum(col("o")).as("t"))
      cells
        .join(broadcast(rows), Seq("c_nationkey"))
        .join(broadcast(cols), Seq("c_mktsegment"))
        .crossJoin(broadcast(tot))
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"), col("o"),
          ((col("r") * col("c")).cast("double") / col("t").cast("double"))
            .as("expected"),
          (abs(col("o") * col("t") - col("r") * col("c")) * 5 >
            col("r") * col("c")).as("deviates"))
        .orderBy(col("nationkey"), col("segment"))
    },

    // -- k-anonymity audit (Sweeney 2002): group sizes over the quasi-
    //    identifier tuple (nation, segment, $2000 balance band) — any
    //    group under k is re-identifiable and must be suppressed or
    //    generalized before the table leaves the privacy boundary. The
    //    whole audit is ONE map-side-combined rollup (same cost as a
    //    count(*) per group at any scale); the band is an exact-integer
    //    floor division on cents (negative-safe — BOTH Spark `div` and
    //    DuckDB's integer `//` truncate toward zero, so the identical
    //    correction term appears on both sides).
    "q186_kanonymity" -> { (s, d) =>
      val bandCents = 200000L // $2000 generalization bands
      val qi = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"),
          graft.util.Exact.cents(col("c_acctbal")).as("bal"))
        .select(col("nationkey"), col("segment"),
          expr(s"(bal div $bandCents) - " +
            s"(CASE WHEN bal % $bandCents < 0 THEN 1 ELSE 0 END)")
            .as("bal_band"))
      kAnonymity(qi, Seq("nationkey", "segment", "bal_band"), k = 5L)
        .orderBy(col("nationkey"), col("segment"), col("bal_band"))
    },

    // -- l-diversity audit (Machanavalli et al. 2007): k-anonymity's
    //    complement — a large QI group still leaks if every member
    //    shares the sensitive value, so each (nation, segment) group
    //    must carry ≥ l DISTINCT sensitive values (order priority here).
    //    One fact⋈dim join keyed on the customer key, then a single
    //    rollup with an exact distinct — Catalyst plans the multi-
    //    distinct via Expand, still one scan of the join output.
    "q187_ldiversity" -> { (s, d) =>
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"), col("o_orderpriority"))
      lDiversity(joined, Seq("nationkey", "segment"), "o_orderpriority", l = 3L)
        .withColumnRenamed("n_sensitive", "n_priorities")
        .orderBy(col("nationkey"), col("segment"))
    }
  )

  /** k-anonymity group audit: size of every quasi-identifier group and
    * the `n >= k` flag. One map-side-combined rollup at any scale. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("k_anonymous", col("n") >= k)

  /** l-diversity group audit: rows + exact distinct sensitive values per
    * quasi-identifier group and the `distinct >= l` flag. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitive: String,
      l: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  def oracleSql: Map[String, String] = Map(
    "q113_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS "column",
           |  CAST(COUNT(*) FILTER ($c IS NULL) AS BIGINT) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "q114_quality_checks" ->
      """SELECT 'orderkey_unique' AS check_name,
        |  CAST(COALESCE((SELECT SUM(n) FROM (
        |    SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
        |    HAVING COUNT(*) > 1)), 0) AS BIGINT) AS violations
        |UNION ALL
        |SELECT 'lineitem_fk_orders',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |UNION ALL
        |SELECT 'price_nonnegative',
        |  (SELECT COUNT(*) FILTER (l_extendedprice < 0) FROM lineitem)
        |UNION ALL
        |SELECT 'discount_in_unit_range',
        |  (SELECT COUNT(*) FILTER (l_discount < 0 OR l_discount > 1) FROM lineitem)
        |ORDER BY check_name""".stripMargin,

    "q125_fd_profile" -> {
      def fd(table: String, name: String, k: String, v: String) =
        s"""SELECT '$name' AS fd_name, COUNT(*) AS n_keys,
           |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $k, COUNT(DISTINCT $v) AS nd FROM $table GROUP BY $k)""".stripMargin
      Seq(
        fd("orders", "orderkey_determines_custkey", "o_orderkey", "o_custkey"),
        fd("nation", "nationkey_determines_regionkey", "n_nationkey", "n_regionkey"),
        fd("lineitem", "orderkey_determines_suppkey", "l_orderkey", "l_suppkey"),
        fd("documents", "source_determines_lang", "source", "lang")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY fd_name")
    },

    "q129_outlier_zscore" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |st AS (
        |  SELECT seg, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(cents AS HUGEINT)) AS s,
        |    SUM(CAST(cents AS HUGEINT)*cents) AS q
        |  FROM o GROUP BY seg),
        |fl AS (
        |  SELECT o.seg, st.n,
        |    (st.n*o.cents - st.s)*(st.n*o.cents - st.s) AS dev2,
        |    st.n*st.q - st.s*st.s AS var_n2
        |  FROM o JOIN st USING (seg))
        |SELECT seg, CAST(n AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN 4*dev2 > 9*var_n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_15,
        |  CAST(SUM(CASE WHEN 100*dev2 > 289*var_n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_17
        |FROM fl GROUP BY seg, n ORDER BY seg""".stripMargin,

    "q170_linkage_score" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
        |  FROM customer),
        |p AS (
        |  SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |    abs(a.bal - b.bal) AS bal_diff_cents,
        |    (a.bal >= 0) = (b.bal >= 0) AS sgn
        |  FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
        |    AND a.c_mktsegment = b.c_mktsegment
        |    AND a.c_custkey < b.c_custkey),
        |sc AS (
        |  SELECT cust_a, cust_b, bal_diff_cents,
        |    CAST((CASE WHEN bal_diff_cents <= 1000 THEN 4 ELSE 0 END)
        |      + (CASE WHEN bal_diff_cents <= 10000 THEN 2 ELSE 0 END)
        |      + (CASE WHEN sgn THEN 1 ELSE 0 END) AS BIGINT) AS score
        |  FROM p)
        |SELECT cust_a, cust_b, bal_diff_cents, score
        |FROM sc WHERE score >= 3
        |ORDER BY cust_a, cust_b""".stripMargin,

    "q174_benford" ->
      """WITH d AS (
        |  SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
        |b(digit, benford_permille) AS (VALUES
        |  (1, CAST(301 AS BIGINT)), (2, 176), (3, 125), (4, 97), (5, 79),
        |  (6, 67), (7, 58), (8, 51), (9, 46))
        |SELECT g.digit, g.n, (g.n * 1000) // total AS obs_permille,
        |  b.benford_permille,
        |  abs((g.n * 1000) // total - b.benford_permille) > 50 AS deviates
        |FROM g JOIN b ON b.digit = g.digit CROSS JOIN t
        |ORDER BY g.digit""".stripMargin,

    "q178_contingency" ->
      """WITH cells AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS o
        |  FROM customer GROUP BY 1, 2),
        |r AS (SELECT c_nationkey, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |c AS (SELECT c_mktsegment, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM cells)
        |SELECT CAST(cells.c_nationkey AS BIGINT) AS nationkey,
        |  cells.c_mktsegment AS segment, cells.o,
        |  CAST(r.r * c.c AS DOUBLE) / CAST(t.t AS DOUBLE) AS expected,
        |  abs(cells.o * t.t - r.r * c.c) * 5 > r.r * c.c AS deviates
        |FROM cells
        |JOIN r ON r.c_nationkey = cells.c_nationkey
        |JOIN c ON c.c_mktsegment = cells.c_mktsegment
        |CROSS JOIN t
        |ORDER BY nationkey, segment""".stripMargin,

    "q186_kanonymity" ->
      """WITH q AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |    c_mktsegment AS segment,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
        |  FROM customer)
        |SELECT nationkey, segment,
        |  (bal // 200000) - (CASE WHEN bal % 200000 < 0 THEN 1 ELSE 0 END)
        |    AS bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  COUNT(*) >= 5 AS k_anonymous
        |FROM q GROUP BY 1, 2, 3
        |ORDER BY nationkey, segment, bal_band""".stripMargin,

    "q187_ldiversity" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
        |  c.c_mktsegment AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  COUNT(DISTINCT o.o_orderpriority) AS n_priorities,
        |  COUNT(DISTINCT o.o_orderpriority) >= 3 AS l_diverse
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY nationkey, segment""".stripMargin
  )
}
