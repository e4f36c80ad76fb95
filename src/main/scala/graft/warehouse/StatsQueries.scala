package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.cents

/** Window value functions, multiset intersect, and percentile aggregates —
  * the last §2.5/§2.6 inventory stragglers.
  */
object StatsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- W3 value functions: first/last/nth over explicit frames.
    "q59_window_values" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // -- §2.6: INTERSECT ALL (multiset semantics — the dual of q35's
    //    EXCEPT ALL reconciliation).
    "q60_intersect_all" -> { (s, d) =>
      val a = Tables.lineitem(s, d).filter(col("l_returnflag") === "A")
        .select(col("l_orderkey").as("orderkey"))
      val b = Tables.lineitem(s, d).filter(col("l_linestatus") === "F")
        .select(col("l_orderkey").as("orderkey"))
      a.intersectAll(b).orderBy(col("orderkey"))
    },

    // -- A8+W5: per-group top-k via the mergeable TopKByValue Aggregator —
    //    O(k) buffers, no per-group sort; cross-validates the window
    //    row_number formulation (q12) against an independent
    //    implementation through the oracle.
    "q62_topk_agg" -> { (s, d) =>
      val topk = udaf(new graft.functions.TopKByValue(3))
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top.keys")).as(Seq("pos0", "o_orderkey")))
        .select(col("o_orderpriority"), (col("pos0") + 1).cast("long").as("rk"), col("o_orderkey"))
        .orderBy(col("o_orderpriority"), col("rk"))
    },

    // -- skew salting through the correctness gate: the salted join is
    //    semantics-preserving, so its oracle is the PLAIN join — any
    //    drop/duplication introduced by the salt replication would fail
    //    the hash compare.
    "q65_salted_join" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("value"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Scale.saltedJoin(ev, dim, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("total_value_cents"))
        .orderBy(col("c_mktsegment"))
    },

    // -- §2.4: exact percentiles (Spark `percentile` and DuckDB
    //    quantile_cont share linear interpolation; quantities are small
    //    integers so results are exact). Quartiles are emitted as scalar
    //    q25/q75 columns — an array-typed output column crashes the
    //    driver's row sort (round-1 verdict #2).
    "q61_percentile" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          max(cents(col("l_quantity"))).as("max_qty_cents"))
        .orderBy(col("l_returnflag"))
    },

    // -- §2.4: APPROXIMATE percentile — the scale face of q61. Exact
    //    percentile needs a full per-group sort; percentile_approx is a
    //    one-pass mergeable sketch (map-side partials combine like any
    //    agg), the only shape that works at 100 TB. Verified with the
    //    q49 HLL pattern: the sketch's p50 must land inside the exact
    //    p45..p55 value band — its rank error (1/accuracy = 1e-4) is two
    //    orders of magnitude inside the ±5pp band, so the flag is a
    //    deterministic TRUE the oracle emits literally. The exact median
    //    rides along for reference (q61's interpolation parity).
    "q122_approx_percentile" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("c"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(c, 0.5)").as("median_cents_exact"),
          expr("percentile_approx(c, 0.5, 10000)").as("approx"),
          expr("percentile(c, 0.45)").as("lo"),
          expr("percentile(c, 0.55)").as("hi"))
        .select(col("o_orderpriority"), col("n"), col("median_cents_exact"),
          (col("approx") >= col("lo") && col("approx") <= col("hi"))
            .as("approx_within_band"))
        .orderBy(col("o_orderpriority"))
    }
  )

  /** 2-D Pareto frontier (both dimensions maximized): rows no other row
    * weakly dominates with one strict inequality. Distributed as every
    * skyline should be: (1) each partition prunes locally — a row is
    * locally dominated iff some earlier row in (x desc, y desc) order
    * has a lexicographically greater (y, x), the struct-max running
    * window makes that one comparison — then (2) the same test runs
    * globally over the SURVIVORS, a set that is typically O(skyline),
    * orders of magnitude smaller than the input (worst case — fully
    * anti-correlated dims — every row survives and the final pass
    * degenerates to a sorted single task; the local pass keeps the
    * common case linear). Equal (x, y) duplicates dominate nothing and
    * are all kept, per the standard definition. */
  private[warehouse] def skyline2d(df: DataFrame, x: String, y: String): DataFrame = {
    def prune(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(col(x).desc, col(y).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("_m", max(struct(col(y), col(x))).over(w))
        .filter(col("_m").isNull || !(col("_m") > struct(col(y), col(x))))
        .drop("_m")
    }
    val local = prune(df.withColumn("_pid", spark_partition_id()),
      Seq(col("_pid"))).drop("_pid")
    prune(local, Seq.empty)
  }

  def moreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- the skyline operator: customers not outclassed on BOTH total
    //    spend and recency — the "best customers" frontier a CRM pulls.
    //    Oracle is the O(n²) NOT EXISTS definition; the Spark plan is the
    //    two-pass local-prune + survivor-skyline above. SkylineSpec pins
    //    duplicates, anti-correlated worst cases, and brute-force
    //    equivalence on random frames.
    "q145_skyline" -> { (s, d) =>
      val c = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(sum(cents(col("o_totalprice"))).as("spend"),
          max(col("o_orderdate")).as("last_dt"))
      skyline2d(c, "spend", "last_dt")
        .select(col("cust"), col("spend"), col("last_dt").cast("date").as("last_order"))
        .orderBy(col("spend").desc, col("cust"))
    },

    // -- RFM segmentation: every customer scored 1..5 on recency,
    //    frequency, and monetary value by GLOBAL quintile, then the cell
    //    histogram. All three quintiles ride the two-pass range-
    //    partitioned NTILE (Scale.withGlobalNtile) — the scale-safe form
    //    round 1 established for q16 — with the customer key as the
    //    deterministic tie-break. 125 output cells regardless of input
    //    size.
    "q146_rfm" -> { (s, d) =>
      val c = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate")).as("last_dt"),
          count(lit(1)).as("freq"),
          sum(cents(col("o_totalprice"))).as("spend"))
      val scored = Seq(
        (Seq(col("last_dt"), col("cust")), "r"),
        (Seq(col("freq"), col("cust")), "f"),
        (Seq(col("spend"), col("cust")), "m"))
        .foldLeft(c) { case (df, (sort, out)) =>
          Scale.withGlobalNtile(df, sort, 5, out)
        }
      scored.groupBy(col("r").cast("long").as("r"),
          col("f").cast("long").as("f"), col("m").cast("long").as("m"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r"), col("f"), col("m"))
    },

    // -- rolling median (7-row trailing frame) of per-day revenue: the
    //    robust smoother a monitoring dashboard runs. The frame is
    //    BOUNDED (≤ 7 values), so collecting it per row is O(1) state —
    //    sort_array + middle-element interpolation reproduces
    //    quantile_cont(0.5) exactly ((lo+hi)/2 is IEEE-exact on cent
    //    integers). Growing frames at partition heads interpolate over
    //    fewer rows, matching SQL window semantics.
    "q151_rolling_median" -> { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("d"))
        .agg(sum(cents(col("o_totalprice"))).as("tot"))
      val w = Window.partitionBy(col("pri")).orderBy(col("d")).rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("tot")).over(w)))
        .withColumn("med7", expr(
          """CASE WHEN size(arr) % 2 = 1
            |  THEN CAST(element_at(arr, CAST((size(arr) + 1) div 2 AS INT)) AS DOUBLE)
            |  ELSE (CAST(element_at(arr, CAST(size(arr) div 2 AS INT)) AS DOUBLE)
            |      + CAST(element_at(arr, CAST(size(arr) div 2 + 1 AS INT)) AS DOUBLE)) / 2
            |END""".stripMargin))
        .select(col("pri"), col("d").cast("date").as("d"), col("tot"), col("med7"))
        .orderBy(col("pri"), col("d"))
    },

    // -- robust outlier detection by median/MAD — the q129 k-sigma dual
    //    that a heavy-tailed metric needs (mean and variance are
    //    themselves dragged by the outliers; the median and the median
    //    absolute deviation are not). Two percentile passes (value, then
    //    |value − median|) and one broadcast join back; the flag
    //    comparison is the identical single multiply in both engines.
    //    The buffered `percentile` here is the q122 face; q140's
    //    counting-selection is the declared 100 TB path for both passes.
    "q152_mad_outliers" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"), cents(col("o_totalprice")).as("c"))
      val med = o.groupBy(col("pri")).agg(expr("percentile(c, 0.5)").as("med"))
      val dev = o.join(broadcast(med), Seq("pri"))
        .withColumn("ad", abs(col("c") - col("med")))
      val mad = dev.groupBy(col("pri")).agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("pri"))
        .groupBy(col("pri"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ad") > lit(1.5) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("pri"))
    },

    // -- lag-1 autocorrelation of the daily revenue series — is
    //    yesterday's number informative about today's? q82's exact-
    //    moment discipline on a self-lagged series: the lag window rides
    //    the DAILY aggregate (bounded by the calendar domain, not row
    //    count), moments accumulate in DECIMAL(38,0), and the final
    //    statistic is division + one sqrt — IEEE-754 requires sqrt
    //    correctly rounded (unlike ln/pow), so the doubles match
    //    bit-for-bit across engines.
    "q163_autocorr" -> { (s, d) =>
      val dec = "decimal(38,0)"
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("dt"))
        .agg(sum(cents(col("o_totalprice"))).as("tot"))
      val w = Window.orderBy(col("dt"))
      val pairs = daily
        .select(col("tot").as("y"), lag(col("tot"), 1).over(w).as("x"))
        .filter(col("x").isNotNull)
      val m = pairs.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      m.select(col("n"),
        ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("autocorr_lag1"))
    },

    // -- grouped simple linear regression (slope of price on quantity per
    //    brand) from EXACT integer moments in DECIMAL(38,0) — the q82/q129
    //    discipline: no streaming float covariance (partition-order
    //    dependent), no BIGINT overflow (n·Σxy clears 9.2e18 past sf0.1).
    //    The slope is ONE IEEE division of two exactly-computed integers,
    //    bit-stable across engines and cluster layouts.
    "q149_regression" -> { (s, d) =>
      val dec = "decimal(38,0)"
      val x = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          col("l_quantity").cast("long").as("q"),
          cents(col("l_extendedprice")).as("c"))
      x.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("q").cast(dec)).as("sx"),
          sum(col("c").cast(dec)).as("sy"),
          sum(col("q").cast(dec) * col("q").cast(dec)).as("sxx"),
          sum(col("q").cast(dec) * col("c").cast(dec)).as("sxy"))
        .select(col("brand"), col("n"),
          ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope_cents_per_unit"))
        .orderBy(col("brand"))
    },

    // -- §2.4: ordered string aggregation (listagg) — deterministic via
    //    explicit WITHIN GROUP ordering on a unique key.
    "q67_listagg" -> { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation_la")
      s.sql(
        """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
          |FROM nation_la GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },

    // -- §2.4: correlation / stddev via EXACT integer moments. Spark's
    //    corr/stddev_samp stream doubles whose partial sums depend on
    //    partition boundaries — not bit-reproducible across engines or
    //    even cluster layouts. Instead: one map-side-combinable pass
    //    accumulates the six exact BIGINT moments (n, Σx, Σy, Σx², Σy²,
    //    Σxy) on cents/whole-dollar integers, and the statistics are a
    //    final deterministic double expression over them — both engines
    //    (and any cluster size) produce the identical bit pattern.
    //    Overflow headroom: y ≤ ~1.1e5 dollars → Σy² wraps only past
    //    ~7e8 rows per group (≈ sf200 lineitem).
    "q82_stats_moments" -> { (s, d) =>
      val x = cents(col("l_quantity"))
      val y = floor(col("l_extendedprice")).cast("long")
      def D(c: String) = col(c).cast("double")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          ((D("n") * D("sxy") - D("sx") * D("sy")) /
            (sqrt(D("n") * D("sxx") - D("sx") * D("sx")) *
              sqrt(D("n") * D("syy") - D("sy") * D("sy")))).as("corr_qty_price"),
          sqrt((D("n") * D("sxx") - D("sx") * D("sx")) /
            (D("n") * (D("n") - lit(1.0)))).as("stddev_qty_cents"))
        .orderBy(col("l_returnflag"))
    },

    // -- gap filling over a generated date spine: days in 1995-01 with no
    //    orders still get a zero row (sequence+explode = the Spark form of
    //    a calendar dimension; at scale the spine is generated, never
    //    materialized by hand).
    "q68_date_spine" -> { (s, d) =>
      val spine = s.range(1)
        .select(explode(sequence(
          to_date(lit("1995-01-01")), to_date(lit("1995-01-31")),
          expr("interval 1 day"))).as("day"))
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("n"), lit(0)).as("n_orders"))
        .orderBy(col("day"))
    },

    // -- equi-width histogram in exact integers: $500 bins over order
    //    totals by FLOOR division on cents (≡ width_bucket with a zero
    //    origin, minus the engine-specific edge conventions). Spark's
    //    `div` truncates toward zero, so the explicit correction term
    //    makes negative cent amounts land in the same bin DuckDB's `//`
    //    (floor division) assigns them. One map-side-combined groupBy
    //    over a few hundred bins; empty bins absent by construction.
    // -- EXACT percentiles by counting-selection — the percentile plan
    //    that survives 100 TB where q122's `percentile` (a per-group
    //    value buffer inside one aggregation task) cannot. Two steps:
    //    (1) a map-side-combined (group, value) histogram — the only
    //    row-count-sized shuffle; (2) a per-group cumulative window over
    //    DISTINCT VALUES, whose size is bounded by the value domain
    //    (cent amounts), not the row count — a billion-row group with
    //    ~10^6 distinct cents does 10^6 window rows, not 10^9. The k-th
    //    element is the value whose cumulative range [cm−c+1, cm] covers
    //    position k. Median = mean of the two middle positions (ONE IEEE
    //    division of an exact integer sum); p90 = discrete element at
    //    ceil(0.9·n) (one IEEE multiply + ceil, identical both engines).
    //    StatsSpec pins equality with q122's buffered `percentile`.
    "q140_percentile_select" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"), cents(col("o_totalprice")).as("cents"))
      val h = o.groupBy(col("pri"), col("cents")).agg(count(lit(1)).as("c"))
      val cum = h
        .withColumn("cm", sum(col("c")).over(
          Window.partitionBy(col("pri")).orderBy(col("cents"))))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("pri"))))
      val hits = expr("cm - c < (n+1) div 2 AND (n+1) div 2 <= cm")
      val hits2 = expr("cm - c < n div 2 + 1 AND n div 2 + 1 <= cm")
      val hits90 = expr(
        "cm - c < CAST(ceil(0.9 * n) AS BIGINT) AND CAST(ceil(0.9 * n) AS BIGINT) <= cm")
      cum.groupBy(col("pri"))
        .agg(
          max(col("n")).as("n_orders"),
          ((sum(when(hits, col("cents")).otherwise(0L)) +
            sum(when(hits2, col("cents")).otherwise(0L))).cast("double") / 2)
            .as("median_cents"),
          max(when(hits90, col("cents"))).as("p90_cents"))
        .orderBy(col("pri"))
    },

    "q105_histogram" -> { (s, d) =>
      val binCents = 50000L // $500 per bin
      Tables.orders(s, d)
        .select(graft.util.Exact.cents(col("o_totalprice")).as("cents"))
        .select(expr(
          s"(cents div $binCents) - (CASE WHEN cents % $binCents < 0 THEN 1 ELSE 0 END)")
          .as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("bin"), (col("bin") * binCents).as("bin_lo_cents"), col("n"))
        .orderBy(col("bin"))
    },

    // -- feature normalization in EXACT integers: min-max scale each
    //    order's price to 0..10000 basis points of its segment's range —
    //    (x - min) * 10000 div (max - min) never touches a float, so the
    //    gate is exact where a double normalization would be at the
    //    mercy of libm. Two scans: one map-side-combinable min/max pass
    //    (5 rows, broadcast back), one scaling pass — the same shape
    //    any per-group feature scaler has at 100 TB.
    "q135_feature_scale" -> { (s, d) =>
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          graft.util.Exact.cents(col("o_totalprice")).as("cents"))
      val ranges = base.groupBy(col("seg"))
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      base.join(broadcast(ranges), Seq("seg"))
        .select(col("o_orderkey"), col("seg"),
          expr("CASE WHEN hi = lo THEN CAST(0 AS BIGINT) " +
            "ELSE ((cents - lo) * 10000) div (hi - lo) END").as("scaled_bp"))
        .orderBy(col("o_orderkey"))
    },

    // -- join-key skew profiler: the diagnostic a 100 TB join plan runs
    //    BEFORE choosing salting / AQE skew handling. One map-side-
    //    combinable count per key, one tiny total, top keys by share
    //    (TakeOrderedAndProject — no global sort); share is one IEEE
    //    division of exact counts, and the heavy-hitter flag compares
    //    integers cross-multiplied (share > 0.1% ⟺ 1000*n > total).
    "q136_skew_profile" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val counts = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val total = li.agg(count(lit(1)).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("l_suppkey"), col("n"),
          (col("n").cast("double") / col("total").cast("double")).as("share"),
          (col("n") * 1000L > col("total")).as("heavy"))
        .orderBy(col("n").desc, col("l_suppkey"))
        .limit(20)
    },

    // -- weekday seasonal decomposition: daily revenue vs its weekday
    //    mean — the simplest seasonal profile a forecasting pipeline
    //    subtracts before trend/anomaly work. The residual flag
    //    |day − mean| > 20% · mean is an EXACT integer cross-multiply
    //    (|day·n − S|·5 > S after clearing the division by n), so the
    //    gate never rides float rounding; the mean itself is ONE IEEE
    //    division, engine-bit-stable. Plan: one map-side-combined daily
    //    rollup (the only table-sized shuffle), then a 7-row weekday
    //    profile broadcast back onto the daily frame.
    // -- Kaplan–Meier retention survival: S(day) = Π_{i ≤ day}
    //    (1 − churned_i / at_risk_i) over the event window — the
    //    censoring-correct retention curve (q73's cohort grid reports
    //    raw activity; KM is the estimator product analytics actually
    //    quote, because users still active at the window's end are
    //    CENSORED, not churned). Churn day = a user's last active day;
    //    last-day users are censored. Determinism: each daily hazard is
    //    one fixed IEEE tree over exact counts, and the running product
    //    folds in DAY ORDER via a sorted-list aggregate — Spark's
    //    aggregate(…, 1.0, *) ≡ DuckDB's init-less LIST_REDUCE because
    //    1.0·x ≡ x for finite non-negative x (the q215 convention).
    //    Plan: two user-keyed aggregates, then everything lives on the
    //    bounded day spine (~30 rows — the window and the list fold are
    //    bounded, not corpus-scale); the bounds row broadcasts.
    "q235_survival_km" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dt"))
      val bounds = ev.agg(min(col("dt")).as("d0"), max(col("dt")).as("dmax"))
      val users = ev.crossJoin(broadcast(bounds))
        .select(col("user_id"), datediff(col("dt"), col("d0")).as("day"),
          datediff(col("dmax"), col("d0")).as("maxday"))
        .groupBy(col("user_id"), col("maxday"))
        .agg(max(col("day")).as("last_day"))
      val total = users.agg(count(lit(1)).as("nt"))
      val ends = users.groupBy(col("last_day").as("day"))
        .agg(count(lit(1)).as("ne"))
      val deaths = users.filter(col("last_day") < col("maxday"))
        .groupBy(col("last_day").as("day")).agg(count(lit(1)).as("nd"))
      val spine = bounds
        .select(explode(sequence(lit(0), datediff(col("dmax"), col("d0"))))
          .as("day"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine
        .join(ends, Seq("day"), "left")
        .join(deaths, Seq("day"), "left")
        .crossJoin(broadcast(total))
        .select(col("day"), col("nt"),
          coalesce(col("ne"), lit(0L)).as("ne"),
          coalesce(col("nd"), lit(0L)).as("n_churned"))
        .withColumn("n_risk",
          col("nt") - sum(col("ne")).over(w) + col("ne"))
        .withColumn("fct", lit(1.0) -
          col("n_churned").cast("double") / col("n_risk").cast("double"))
        .withColumn("survival",
          aggregate(collect_list(col("fct")).over(w), lit(1.0), _ * _))
        .select(col("day").cast("long").as("day"), col("n_risk"),
          col("n_churned"), col("survival"))
        .orderBy(col("day"))
    },

    "q168_seasonality" -> { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("day_cents"))
        .withColumn("weekday", dayofweek(col("day")).cast("long"))
      val prof = daily.groupBy(col("weekday"))
        .agg(sum(col("day_cents")).as("wd_cents"), count(lit(1)).as("wd_days"))
      daily.join(broadcast(prof), Seq("weekday"))
        .select(col("day"), col("weekday"), col("day_cents"),
          (col("wd_cents").cast("double") / col("wd_days").cast("double"))
            .as("wd_mean_cents"),
          (abs(col("day_cents") * col("wd_days") - col("wd_cents")) * 5 >
            col("wd_cents")).as("is_outlier"))
        .orderBy(col("day"))
    },

    // -- decile gains table: customers ranked by lifetime spend, cut
    //    into globally-numbered deciles, with cumulative revenue share —
    //    the model-eval / marketing report behind "top 10% of customers
    //    drive X% of revenue". The decile cut runs through
    //    Scale.withGlobalNtile (two-pass range-partitioned numbering,
    //    q16/q140 discipline — never a bare global NTILE window); the
    //    cumulative window then rides a TEN-row aggregated frame, where
    //    a single partition is the point, not a bottleneck. Shares are
    //    one IEEE division of exact cents.
    "q172_decile_gains" -> { (s, d) =>
      val sp = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("spend"))
      val dec = Scale.withGlobalNtile(sp,
          Seq(col("spend").desc, col("o_custkey")), 10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"), sum(col("spend")).as("decile_cents"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = dec.agg(sum(col("decile_cents")).as("total_cents"))
      dec.withColumn("cum_cents", sum(col("decile_cents")).over(w))
        .crossJoin(broadcast(total))
        .select(col("decile"), col("n_customers"), col("decile_cents"),
          col("cum_cents"),
          (col("cum_cents").cast("double") / col("total_cents").cast("double"))
            .as("cum_share"))
        .orderBy(col("decile"))
    },

    // -- Gini coefficient of customer spend: revenue concentration in
    //    ONE number, G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over spends
    //    sorted ascending — the audit behind the q172 gains table. The
    //    rank i comes from the two-pass range-partitioned global
    //    numbering (never a bare global window); every sum is an exact
    //    BIGINT (Σ i·x ~ n²·x̄ — the decimal(38,0) widening is the
    //    declared upgrade past ~1e18, q129's pattern); the final G is
    //    one division of exact integers, identical in both engines.
    "q173_gini" -> { (s, d) =>
      val sp = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("spend"))
      Scale.withGlobalRowNumber(sp, Seq(col("spend"), col("o_custkey")), "rn")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).as("total_cents"),
          sum(col("spend") * col("rn")).as("s1"))
        .select(col("n_customers"), col("total_cents"),
          ((col("s1") * 2 - (col("n_customers") + 1) * col("total_cents"))
            .cast("double") /
            (col("n_customers") * col("total_cents")).cast("double")).as("gini"))
    },

    // -- interval concurrency (sweep line): each lineitem is "open" from
    //    its order date until it ships — [o_orderdate, l_shipdate) —
    //    and the question is each supplier's PEAK simultaneously-open
    //    line count, the capacity-planning number behind backlog SLAs.
    //    The sweep is +1/−1 deltas collapsed per (supplier, day), then a
    //    running sum along each supplier's own timeline — a
    //    high-cardinality partitioned window, never a global sort; the
    //    half-open interval makes same-day ship cancel same-day open
    //    BEFORE the peak is read, exactly the [s, r) semantics. This is
    //    the sweep-line dual of q24's range JOIN: measuring overlap
    //    instead of joining on it.
    "q175_open_concurrency" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"), col("o_orderdate").cast("date").as("od"),
          col("l_shipdate").cast("date").as("sd"))
      val deltas = li.select(col("l_suppkey"), col("od").as("day"), lit(1L).as("delta"))
        .unionAll(li.select(col("l_suppkey"), col("sd").as("day"), lit(-1L).as("delta")))
        .groupBy(col("l_suppkey"), col("day"))
        .agg(sum(col("delta")).as("net"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("active", sum(col("net")).over(w))
        .groupBy(col("l_suppkey"))
        .agg(max(col("active")).as("max_open"))
        .orderBy(col("l_suppkey"))
    },

    // -- distribution drift: total-variation distance between the early
    //    (<1998) and late price-bin histograms — the drift monitor a
    //    feature pipeline runs between training and serving windows.
    //    PSI needs a log; TV = ½·Σ|p₁ᵢ − p₂ᵢ| doesn't, so the WHOLE
    //    check stays in exact integers once cleared of denominators:
    //    Σ|n₁ᵢ·N₂ − n₂ᵢ·N₁| scaled by 500 div N₁·N₂ gives permille TV
    //    (the cross-product widens to decimal(38,0) past ~1e9 rows per
    //    side — q129's declared upgrade). One map-side (period, bin)
    //    rollup; everything after is a ~dozen-row frame.
    "q177_drift_tv" -> { (s, d) =>
      val binCents = 5000000L // $50k bins
      val h = Tables.orders(s, d)
        .select(
          (year(col("o_orderdate")) < 1998).as("early"),
          cents(col("o_totalprice")).as("c"))
        .select(col("early"), expr(s"c div $binCents").as("bin"))
        .groupBy(col("bin"))
        .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
          sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"))
      val tot = h.agg(sum(col("n_early")).as("tot_early"),
        sum(col("n_late")).as("tot_late"))
      val terms = h.crossJoin(broadcast(tot))
        .withColumn("diff_term",
          abs(col("n_early") * col("tot_late") - col("n_late") * col("tot_early")))
      val tv = terms.agg(
        expr("(500 * sum(diff_term)) div (max(tot_early) * max(tot_late))").as("tv_permille"))
      terms.crossJoin(broadcast(tv))
        .select(col("bin"), col("n_early"), col("n_late"), col("diff_term"),
          col("tv_permille"))
        .orderBy(col("bin"))
    },

    // -- equi-DEPTH histogram: 8 buckets of (near-)equal row count with
    //    their value bounds — the optimizer-statistics dual of q105's
    //    equi-WIDTH bins, robust to skew because bucket boundaries adapt
    //    to the distribution. The bucket cut is the two-pass range-
    //    partitioned global NTILE (q16 discipline); bounds and counts
    //    then roll up map-side on the 8-valued bucket key. Everything is
    //    exact integers.
    "q182_equidepth" -> { (s, d) =>
      Scale.withGlobalNtile(
          Tables.orders(s, d).select(col("o_orderkey"),
            cents(col("o_totalprice")).as("c")),
          Seq(col("c"), col("o_orderkey")), 8, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("c")).as("lo_cents"),
          max(col("c")).as("hi_cents"))
        .orderBy(col("bucket"))
    },

    // -- pairwise correlation MATRIX over (quantity, price, discount) —
    //    q82's exact-moment machinery widened to every pair in ONE scan:
    //    a single map-side-combined aggregate carries all sums, squares,
    //    and cross-products as exact integers, and the three Pearson
    //    coefficients are computed from that one 1-row frame (so adding
    //    a variable costs O(vars) more sums, never another scan). Same
    //    bit-stability argument as q82: integer partials are order-
    //    independent, the float epilogue is a fixed expression tree.
    "q184_corr_matrix" -> { (s, d) =>
      def D(c: String) = col(c).cast("double")
      def corr(n: String, sa: String, sb: String, sab: String,
          saa: String, sbb: String) =
        (D(n) * D(sab) - D(sa) * D(sb)) /
          (sqrt(D(n) * D(saa) - D(sa) * D(sa)) *
            sqrt(D(n) * D(sbb) - D(sb) * D(sb)))
      val m = Tables.lineitem(s, d)
        .select(cents(col("l_quantity")).as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"),
          cents(col("l_discount")).as("z"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("z")).as("syz"))
      m.select(lit("qty").as("var_a"), lit("price").as("var_b"), col("n"),
          corr("n", "sx", "sy", "sxy", "sxx", "syy").as("pearson"))
        .unionAll(m.select(lit("qty").as("var_a"), lit("discount").as("var_b"),
          col("n"), corr("n", "sx", "sz", "sxz", "sxx", "szz").as("pearson")))
        .unionAll(m.select(lit("price").as("var_a"), lit("discount").as("var_b"),
          col("n"), corr("n", "sy", "sz", "syz", "syy", "szz").as("pearson")))
        .orderBy(col("var_a"), col("var_b"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q67_listagg" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q68_date_spine" ->
      """SELECT CAST(gs.day AS DATE) AS day, COALESCE(d.n, 0) AS n_orders
        |FROM generate_series(DATE '1995-01-01', DATE '1995-01-31', INTERVAL 1 DAY) AS gs(day)
        |LEFT JOIN (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1) d ON CAST(gs.day AS DATE) = d.day
        |ORDER BY day""".stripMargin,
    "q59_window_values" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q60_intersect_all" ->
      """SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'A'
        |INTERSECT ALL
        |SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY orderkey""".stripMargin,

    "q62_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q65_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q82_stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |      CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sx, sy,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
        |  SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty_cents
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q61_percentile" ->
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
        |  QUANTILE_CONT(l_quantity, 0.25) AS q25,
        |  QUANTILE_CONT(l_quantity, 0.75) AS q75,
        |  MAX(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS max_qty_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The O(n²) textbook definition — the two-pass distributed plan must
    // reproduce it exactly.
    "q145_skyline" ->
      """WITH c AS (
        |  SELECT o_custkey AS cust,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
        |      AS spend,
        |    MAX(o_orderdate) AS last_dt
        |  FROM orders GROUP BY 1)
        |SELECT cust, spend, CAST(last_dt AS DATE) AS last_order
        |FROM c a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c b
        |  WHERE b.spend >= a.spend AND b.last_dt >= a.last_dt
        |    AND (b.spend > a.spend OR b.last_dt > a.last_dt))
        |ORDER BY spend DESC, cust""".stripMargin,

    "q146_rfm" ->
      """WITH c AS (
        |  SELECT o_custkey AS cust, MAX(o_orderdate) AS last_dt,
        |    COUNT(*) AS freq,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
        |      AS spend
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT cust,
        |    NTILE(5) OVER (ORDER BY last_dt, cust) AS r,
        |    NTILE(5) OVER (ORDER BY freq, cust) AS f,
        |    NTILE(5) OVER (ORDER BY spend, cust) AS m
        |  FROM c)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |  CAST(m AS BIGINT) AS m, COUNT(*) AS n_customers
        |FROM s GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin,

    "q151_rolling_median" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS pri, o_orderdate AS d,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
        |      AS tot
        |  FROM orders GROUP BY 1, 2)
        |SELECT pri, CAST(d AS DATE) AS d, tot,
        |  quantile_cont(tot, 0.5) OVER (PARTITION BY pri ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM daily ORDER BY pri, d""".stripMargin,

    "q152_mad_outliers" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM orders),
        |m AS (SELECT pri, quantile_cont(c, 0.5) AS med FROM o GROUP BY 1),
        |dev AS (SELECT o.pri, abs(c - med) AS ad FROM o JOIN m USING (pri)),
        |md AS (SELECT pri, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT dev.pri, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN ad > 1.5 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN md ON dev.pri = md.pri
        |GROUP BY 1 ORDER BY dev.pri""".stripMargin,

    "q163_autocorr" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS dt,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
        |      AS tot
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT tot AS y, LAG(tot) OVER (ORDER BY dt) AS x FROM daily),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
        |  FROM pairs WHERE x IS NOT NULL)
        |SELECT n,
        |  CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
        |         * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))
        |    AS autocorr_lag1
        |FROM m""".stripMargin,

    // HUGEINT on the DuckDB side ≡ DECIMAL(38,0) on the Spark side; the
    // slope divides two exactly-computed integers, so the doubles match
    // bit-for-bit.
    "q149_regression" ->
      """WITH x AS (
        |  SELECT p_brand AS brand, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (
        |  SELECT brand, COUNT(*) AS n,
        |    CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS sxx,
        |    CAST(SUM(CAST(q AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sxy
        |  FROM x GROUP BY 1)
        |SELECT brand, n,
        |  CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
        |    AS slope_cents_per_unit
        |FROM m ORDER BY brand""".stripMargin,

    // Same counting-selection recurrence; `//` floor ≡ Spark `div`
    // truncation on the non-negative domain, and the (lo+hi)/2 double is
    // IEEE-exact for cent sums < 2^52.
    "q140_percentile_select" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
        |  FROM orders),
        |h AS (SELECT pri, cents, COUNT(*) AS c FROM o GROUP BY 1, 2),
        |cum AS (
        |  SELECT pri, cents, c,
        |    SUM(c) OVER (PARTITION BY pri ORDER BY cents) AS cm,
        |    SUM(c) OVER (PARTITION BY pri) AS n
        |  FROM h)
        |SELECT pri, CAST(MAX(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN cm - c < (n+1)//2 AND (n+1)//2 <= cm THEN cents ELSE 0 END)
        |     + SUM(CASE WHEN cm - c < n//2+1 AND n//2+1 <= cm THEN cents ELSE 0 END)
        |    AS DOUBLE) / 2 AS median_cents,
        |  MAX(CASE WHEN cm - c < CAST(CEIL(0.9 * n) AS BIGINT)
        |        AND CAST(CEIL(0.9 * n) AS BIGINT) <= cm THEN cents END) AS p90_cents
        |FROM cum GROUP BY pri ORDER BY pri""".stripMargin,

    "q105_histogram" ->
      """SELECT bin, bin * 50000 AS bin_lo_cents, COUNT(*) AS n
        |FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 50000 AS bin
        |  FROM orders)
        |GROUP BY bin ORDER BY bin""".stripMargin,

    "q122_approx_percentile" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  QUANTILE_CONT(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5)
        |    AS median_cents_exact,
        |  TRUE AS approx_within_band
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q135_feature_scale" ->
      """WITH o AS (
        |  SELECT o_orderkey, c_mktsegment AS seg,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT seg, MIN(cents) AS lo, MAX(cents) AS hi FROM o GROUP BY seg)
        |SELECT o_orderkey, seg,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE ((cents - lo) * 10000) // (hi - lo) END AS scaled_bp
        |FROM o JOIN r USING (seg)
        |ORDER BY o_orderkey""".stripMargin,

    "q136_skew_profile" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT COUNT(*) AS total FROM lineitem)
        |SELECT l_suppkey, n,
        |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  n * 1000 > total AS heavy
        |FROM c, t
        |ORDER BY n DESC, l_suppkey LIMIT 20""".stripMargin,

    // q168: DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday — shift by 1.
    // Same churn/censor split, same bounded day spine, same hazard tree
    // and day-ordered product fold (init-less LIST_REDUCE ≡ 1.0-seeded
    // aggregate for non-negative factors).
    "q235_survival_km" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
        |b AS (SELECT MIN(dt) AS d0, MAX(dt) AS dmax FROM ev),
        |u AS (
        |  SELECT user_id, MAX(dt - d0) AS last_day, MAX(dmax - d0) AS maxday
        |  FROM ev, b GROUP BY user_id),
        |tot AS (SELECT COUNT(*) AS nt FROM u),
        |spine AS (
        |  SELECT UNNEST(RANGE(0, (SELECT MAX(maxday) FROM u) + 1)) AS day),
        |ends AS (SELECT last_day AS day, COUNT(*) AS ne FROM u GROUP BY 1),
        |deaths AS (
        |  SELECT last_day AS day, COUNT(*) AS nd FROM u
        |  WHERE last_day < maxday GROUP BY 1),
        |f AS (
        |  SELECT s.day,
        |    nt - CAST(SUM(COALESCE(e.ne, 0)) OVER
        |      (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      + COALESCE(e.ne, 0) AS n_risk,
        |    COALESCE(d.nd, 0) AS n_churned
        |  FROM spine s
        |  LEFT JOIN ends e USING (day) LEFT JOIN deaths d USING (day), tot),
        |g AS (
        |  SELECT day, n_risk, n_churned,
        |    1.0 - CAST(n_churned AS DOUBLE) / CAST(n_risk AS DOUBLE) AS fct
        |  FROM f)
        |SELECT day, n_risk, n_churned,
        |  LIST_REDUCE(LIST(fct) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
        |    (x, y) -> x * y) AS survival
        |FROM g ORDER BY day""".stripMargin,

    "q168_seasonality" ->
"""WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1),
        |wd AS (SELECT *, CAST(dayofweek(day) + 1 AS BIGINT) AS weekday FROM daily),
        |prof AS (
        |  SELECT weekday, CAST(SUM(day_cents) AS BIGINT) AS wd_cents,
        |    COUNT(*) AS wd_days
        |  FROM wd GROUP BY 1)
        |SELECT day, weekday, day_cents,
        |  CAST(wd_cents AS DOUBLE) / CAST(wd_days AS DOUBLE) AS wd_mean_cents,
        |  abs(day_cents * wd_days - wd_cents) * 5 > wd_cents AS is_outlier
        |FROM wd JOIN prof USING (weekday)
        |ORDER BY day""".stripMargin,

    "q172_decile_gains" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT *, CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey)
        |    AS BIGINT) AS decile
        |  FROM sp),
        |g AS (
        |  SELECT decile, COUNT(*) AS n_customers,
        |    CAST(SUM(spend) AS BIGINT) AS decile_cents
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(decile_cents) AS BIGINT) AS total_cents FROM g)
        |SELECT decile, n_customers, decile_cents,
        |  CAST(SUM(decile_cents) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |  CAST(SUM(decile_cents) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(total_cents AS DOUBLE)
        |    AS cum_share
        |FROM g, t ORDER BY decile""".stripMargin,

    "q173_gini" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS spend
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT spend,
        |    CAST(ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS BIGINT) AS rn
        |  FROM sp),
        |a AS (
        |  SELECT COUNT(*) AS n_customers,
        |    CAST(SUM(spend) AS BIGINT) AS total_cents,
        |    CAST(SUM(spend * rn) AS BIGINT) AS s1
        |  FROM r)
        |SELECT n_customers, total_cents,
        |  CAST(2 * s1 - (n_customers + 1) * total_cents AS DOUBLE)
        |    / CAST(n_customers * total_cents AS DOUBLE) AS gini
        |FROM a""".stripMargin,

    "q175_open_concurrency" ->
      """WITH li AS (
        |  SELECT l_suppkey, CAST(o_orderdate AS DATE) AS od,
        |    CAST(l_shipdate AS DATE) AS sd
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deltas AS (
        |  SELECT l_suppkey, day, CAST(SUM(delta) AS BIGINT) AS net FROM (
        |    SELECT l_suppkey, od AS day, 1 AS delta FROM li
        |    UNION ALL
        |    SELECT l_suppkey, sd AS day, -1 AS delta FROM li)
        |  GROUP BY 1, 2),
        |run AS (
        |  SELECT l_suppkey,
        |    SUM(net) OVER (PARTITION BY l_suppkey ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS active
        |  FROM deltas)
        |SELECT l_suppkey, CAST(MAX(active) AS BIGINT) AS max_open
        |FROM run GROUP BY 1 ORDER BY l_suppkey""".stripMargin,

    "q177_drift_tv" ->
      """WITH h AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 5000000 AS bin,
        |    CAST(SUM(CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_early,
        |    CAST(SUM(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_late
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(n_early) AS BIGINT) AS tot_early,
        |    CAST(SUM(n_late) AS BIGINT) AS tot_late
        |  FROM h),
        |terms AS (
        |  SELECT bin, n_early, n_late,
        |    abs(n_early * tot_late - n_late * tot_early) AS diff_term,
        |    tot_early, tot_late
        |  FROM h, t),
        |tv AS (
        |  SELECT CAST((500 * SUM(diff_term)) // (MAX(tot_early) * MAX(tot_late))
        |    AS BIGINT) AS tv_permille
        |  FROM terms)
        |SELECT bin, n_early, n_late, diff_term, tv_permille
        |FROM terms, tv ORDER BY bin""".stripMargin,

    "q182_equidepth" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |b AS (
        |  SELECT c, CAST(ntile(8) OVER (ORDER BY c, o_orderkey) AS BIGINT) AS bucket
        |  FROM o)
        |SELECT bucket, COUNT(*) AS n, MIN(c) AS lo_cents, MAX(c) AS hi_cents
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q184_corr_matrix" ->
      """WITH v AS (
        |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z
        |  FROM lineitem),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(z) AS BIGINT) AS sz,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
        |    CAST(SUM(z*z) AS BIGINT) AS szz, CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*z) AS BIGINT) AS sxz, CAST(SUM(y*z) AS BIGINT) AS syz
        |  FROM v)
        |SELECT 'qty' AS var_a, 'price' AS var_b, n,
        |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
        |  AS pearson FROM m
        |UNION ALL
        |SELECT 'qty', 'discount', n,
        |  (CAST(n AS DOUBLE)*CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE)*CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)))
        |  FROM m
        |UNION ALL
        |SELECT 'price', 'discount', n,
        |  (CAST(n AS DOUBLE)*CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE)*CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)))
        |  FROM m
        |ORDER BY var_a, var_b""".stripMargin
  )
}
