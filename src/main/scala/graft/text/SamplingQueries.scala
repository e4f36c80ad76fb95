package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Corpus subsampling / mixing operators — the selection stage of a
  * training-data pipeline. Sampling is systematic (key-modulo) rather
  * than RNG-based: deterministic, reproducible across runs and engines,
  * and resumable at 100 TB (a restarted job selects the same rows;
  * `TABLESAMPLE` semantics differ per engine and per partitioning).
  */
object SamplingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- stratified sampling: cap each language at 50 docs, lowest ids
    //    win (deterministic quota per stratum).
    "q63_stratified_sample" -> { (s, d) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          max(col("doc_id")).as("max_kept_id"))
        .orderBy(col("lang"))
    },

    // -- systematic (every k-th) sampling in a global key order — the
    //    deterministic eval-split a pipeline re-derives identically on
    //    every run. Position comes from the two-pass range-partitioned
    //    numbering (Scale.withGlobalRowNumber), NEVER a bare global
    //    window; the 1-in-100 filter then prunes map-side. Unlike
    //    hash-based splits (q121) this guarantees EXACTLY evenly-spaced
    //    coverage of the key order — the property systematic sampling
    //    exists for.
    "q157_systematic_sample" -> { (s, d) =>
      graft.warehouse.Scale.withGlobalRowNumber(
          Tables.orders(s, d).select(col("o_orderkey")),
          Seq(col("o_orderkey")), "rn")
        .filter(col("rn") % 100 === 1)
        .select(col("o_orderkey"), col("rn"))
        .orderBy(col("rn"))
    },

    // -- PPS (probability-proportional-to-size) systematic sampling: n
    //    deterministic draws where each document's selection count is
    //    proportional to its weight (chars here; tokens in production) —
    //    the weighted companion to q157's uniform 1-in-k. The classic
    //    survey-sampling estimator (Madow's systematic PPS): lay every
    //    document's weight end-to-end along the salted-hash order (the
    //    q104 permutation, so adjacent grid hits are independent of
    //    ingestion order), then take the n grid points j·W/n. A document
    //    is drawn floor(cum·n/W) − floor(cum_prev·n/W) times — EXACTLY n
    //    total draws by telescoping, zero-weight docs never drawn, and a
    //    document heavier than W/n is drawn multiple times (certainty
    //    sampling), all in exact BIGINT arithmetic (`div` ≡ `//` on
    //    non-negatives; cum·n stays under 2^63 up to ~10^17 total weight
    //    at n=40 — cast the product to DECIMAL(38,0) past that).
    //    Plan: the cumulative weight rides the TWO-PASS range-partitioned
    //    running sum (never a single-task global window); the total is a
    //    1-row broadcast; selection is then a map-side filter.
    "q228_pps_sample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          md5(concat(lit(PpsSalt), col("doc_id").cast("string"))).as("skey"))
      val cum = graft.warehouse.Scale.withGlobalRunningSum(
        docs, Seq(col("skey")), col("n_chars"), "cum")
      val tot = docs.agg(sum(col("n_chars")).as("tot"))
      cum.crossJoin(broadcast(tot))
        .withColumn("n_picks",
          expr(s"(cum * $PpsDraws) div tot - ((cum - n_chars) * $PpsDraws) div tot"))
        .filter(col("n_picks") >= 1)
        .select(col("doc_id"), col("n_chars"), col("n_picks"))
        .orderBy(col("doc_id"))
    },

    // -- weighted source mixture: per-source systematic rates (1-in-2 for
    //    even sources, 1-in-5 for odd) — the "mix corpora at fixed
    //    proportions" op, as one declarative filter.
    "q64_source_mixture" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("src_num",
          regexp_extract(col("source"), "([0-9]+)$", 1).cast("int"))
        .filter(
          (col("src_num") % 2 === 0 && col("doc_id") % 2 === 0) ||
          (col("src_num") % 2 === 1 && col("doc_id") % 5 === 0))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))
    },

    // -- sequence packing: concatenate the corpus in doc_id order and
    //    chunk it into fixed 512-token context windows (the GPT-style
    //    concat-and-chunk batch layout). Per document: its BPE token
    //    count, the first/last pack it lands in, and whether it straddles
    //    a pack boundary. The global prefix sum is the two-pass
    //    range-partitioned form (Scale.withGlobalRunningSum) — a bare
    //    unpartitioned window would serialize 100 TB through one task.
    "q76_sequence_pack" -> { (s, d) =>
      val L = SeqPackLen
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
        .filter(col("n_bpe") > 0)
      graft.warehouse.Scale
        .withGlobalRunningSum(toks, Seq(col("doc_id")), col("n_bpe"), "cum")
        .select(col("doc_id"), col("n_bpe"),
          expr(s"(cum - n_bpe) div $L").as("first_pack"),
          expr(s"(cum - 1) div $L").as("last_pack"),
          (expr(s"(cum - n_bpe) div $L") =!= expr(s"(cum - 1) div $L"))
            .as("spans_boundary"))
        .orderBy(col("doc_id"))
    },

    // -- token-budget mixture: the budget-accurate successor to q64's
    //    rate mixture (the round-5 verdict's stated motivation for real
    //    BPE counts). A global token budget is split into EQUAL per-source
    //    quotas (the classic small-source upsampling spec); within each
    //    source, docs are kept greedily in doc_id order while the running
    //    BPE total fits the quota — a doc that would cross it is dropped
    //    and nothing back-fills (what a streaming selector does). One
    //    source-partitioned window + a broadcast 1-row quota — scales to
    //    any source count; no global sort anywhere.
    "q84_token_budget_mixture" -> { (s, d) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
      val nSrc = toks.select(countDistinct(col("source")).as("n_src"))
      toks.withColumn("cum", sum(col("n_bpe")).over(w))
        .crossJoin(broadcast(nSrc))
        .withColumn("quota", expr(s"$TokenBudget div n_src"))
        .filter(col("cum") <= col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_bpe")).as("tokens_kept"),
          max(col("quota")).as("quota_tokens"))
        .orderBy(col("source"))
    },

    // -- per-domain cap ("domain balancing"): no single source may
    //    contribute more than DomainCap docs, and within the cap the
    //    LONGEST docs win (n_chars desc — the keep-the-substance rule;
    //    doc_id breaks ties). One source-partitioned ranking window; a
    //    heavy-hitter domain at 100 TB rides the same two-pass top-k
    //    pattern the repo uses for global numbering if a single source
    //    outgrows a partition.
    "q103_domain_cap" -> { (s, d) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("rn") <= DomainCap, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") <= DomainCap, col("n_chars")).otherwise(0L))
            .as("kept_chars"))
        .orderBy(col("source"))
    },

    // -- deterministic epoch shuffle: the training-order permutation.
    //    Position = global rank of md5(epoch_salt || doc_id) — an
    //    RNG-free permutation any engine reproduces, re-dealt per epoch
    //    by the salt. The global numbering is the two-pass range-
    //    partitioned form (Scale.withGlobalRowNumber): a bare
    //    ROW_NUMBER() OVER (ORDER BY hash) would pull 100 TB through one
    //    task, the defining anti-pattern of shuffle-the-corpus jobs.
    "q104_epoch_shuffle" -> { (s, d) =>
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(lit(EpochSalt), col("doc_id").cast("string"))).as("skey"))
      graft.warehouse.Scale
        .withGlobalRowNumber(keyed, Seq(col("skey")), "shuffle_pos")
        .select(col("doc_id"), col("skey"), col("shuffle_pos"))
        .orderBy(col("doc_id"))
    },

    // -- length-bucketed batching: assign each document to the smallest
    //    power-of-two context length holding its whitespace token count,
    //    and report the padding bill per bucket (waste = n·bucket − Σtok)
    //    — the ledger that decides bucket boundaries for padded-batch
    //    training. The bucket function is an explicit 21-arm CASE chain
    //    (codegen'd, libm-free — ceil(log2(n)) would gate an exact
    //    integer on a libm rounding); the oracle computes the same
    //    function as MIN over a generated powers table. One map-side-
    //    combined groupBy over ≤21 buckets.
    "q120_length_buckets" -> { (s, d) =>
      val n = TextFunctions.tokenCount(col("text")).cast("long")
      val bucket = (0 until 20).foldRight(lit(1L << 20): Column) { (k, rest) =>
        when(n <= (1L << k), lit(1L << k)).otherwise(rest)
      }
      Tables.documents(s, d)
        .select(n.as("n_tokens"), bucket.as("bucket_len"))
        .groupBy(col("bucket_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
          (col("n_docs") * col("bucket_len")).as("padded_tokens"),
          (col("n_docs") * col("bucket_len") - col("sum_tokens"))
            .as("waste_tokens"))
        .orderBy(col("bucket_len"))
    },

    // -- deterministic stratified train/val/test split: bucket =
    //    portable 48-bit md5 hash of the doc id mod 100, 90/5/5. The
    //    split is a pure function of the row key — reproducible across
    //    engines, runs, and repartitions, and any engine (or the oracle)
    //    re-derives membership without a stored assignment table. Per-
    //    source counts verify the strata land proportionally. 48 bits
    //    because the full md5 lower half goes negative in a signed
    //    BIGINT and 2^64 mod 100 ≠ 0 would break bucket parity
    //    (TextFunctions.portableHash48).
    "q121_split_assign" -> { (s, d) =>
      val b = pmod(TextFunctions.portableHash48(col("doc_id").cast("string")),
        lit(100L))
      Tables.documents(s, d)
        .select(col("source"),
          when(b < 90, "train").when(b < 95, "val").otherwise("test")
            .as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("split"))
    },

    // -- exact proportional sample allocation (largest-remainder /
    //    Hamilton method): split a sample budget of AllocBudget docs
    //    across sources proportionally to size, in EXACT integers —
    //    floor quotas first, then the leftover units go to the largest
    //    remainders (source-name tie-break). Σalloc = budget always;
    //    q84's equal quota is the degenerate uniform case. Everything
    //    after the fact-table count runs on the #sources-sized
    //    allocation table — the global remainder ranking is a window
    //    over dozens of rows, not data (fine at any corpus scale).
    "q123_proportional_alloc" -> { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("tot"))
      val based = counts.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($AllocBudget * n) div tot"))
        .withColumn("rem", expr(s"($AllocBudget * n) % tot"))
      val leftover = based.agg((lit(AllocBudget) - sum(col("base"))).as("lo"))
      val wRem = Window.orderBy(col("rem").desc, col("source"))
      based.withColumn("rk", row_number().over(wRem))
        .crossJoin(broadcast(leftover))
        .select(col("source"), col("n").as("n_docs"),
          (col("base") + when(col("rk") <= col("lo"), 1L).otherwise(0L))
            .as("alloc_docs"))
        .orderBy(col("source"))
    },

    // -- Neyman (optimal) allocation: q123 splits a sample budget by
    //    stratum SIZE; Neyman allocation splits it by N_h·σ_h — more
    //    budget to high-variance strata, the minimum-variance design
    //    for a stratified mean (Neyman 1934). N_h·σ_h reduces to
    //    √(n_h·Q_h − S_h²) over the exact integer moments (the q82
    //    discipline), so the only IEEE steps are one correctly-rounded
    //    √ per stratum, the source-ORDERED weight-sum fold (the q215
    //    convention), and the shared floor/fraction arithmetic both
    //    engines replay bit-for-bit. Largest-remainder integerization
    //    as in q123; the ranking window rides the ≤n_sources row frame.
    "q242_neyman_alloc" -> { (s, d) =>
      val c = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sm"),
          sum(col("n_chars") * col("n_chars")).as("q"))
      val w = c.select(col("source"), col("n"),
        sqrt((col("n") * col("q") - col("sm") * col("sm")).cast("double"))
          .as("w"))
      val sw = w.agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("sw"))
      val b = w.crossJoin(broadcast(sw))
        .withColumn("base", floor(lit(AllocBudget) * col("w") / col("sw")))
        .withColumn("frac", lit(AllocBudget) * col("w") / col("sw") -
          floor(lit(AllocBudget) * col("w") / col("sw")))
      val lo = b.agg((lit(AllocBudget.toLong) - sum(col("base"))).as("lo"))
      val wR = Window.orderBy(col("frac").desc, col("source"))
      b.withColumn("rk", row_number().over(wR))
        .crossJoin(broadcast(lo))
        .select(col("source"), col("n").as("n_docs"),
          (col("base") + when(col("rk") <= col("lo"), 1L).otherwise(0L))
            .as("alloc_docs"))
        .orderBy(col("source"))
    },

    // -- TEMPERATURE-scaled source mixture (the multilingual-training
    //    reweighting: p_s ∝ n_s^(1/T) — T=1 is q123's proportional
    //    split, T→∞ is q84's uniform quota; T=2 here, the common
    //    small-source upsampling point, because x^(1/2) is the one
    //    fractional power BOTH engines evaluate correctly-rounded
    //    (IEEE sqrt) — general T would ride pow(), whose last-bit
    //    behavior is libm-specific and not oracle-safe). The weight
    //    normalization folds in source order (the q215/q242
    //    convention), the integerization is the shared
    //    largest-remainder arithmetic, and everything after the corpus
    //    count runs on the #sources-sized table. mix_weight is the
    //    normalized sampling probability a data loader consumes.
    "q253_temperature_mixture" -> { (s, d) =>
      val c = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      val w = c.select(col("source"), col("n"),
        sqrt(col("n").cast("double")).as("w"))
      val sw = w.agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("sw"))
      val b = w.crossJoin(broadcast(sw))
        .withColumn("mix_weight", col("w") / col("sw"))
        .withColumn("base", floor(lit(AllocBudget) * col("w") / col("sw")))
        .withColumn("frac", lit(AllocBudget) * col("w") / col("sw") -
          floor(lit(AllocBudget) * col("w") / col("sw")))
      val lo = b.agg((lit(AllocBudget.toLong) - sum(col("base"))).as("lo"))
      val wR = Window.orderBy(col("frac").desc, col("source"))
      b.withColumn("rk", row_number().over(wR))
        .crossJoin(broadcast(lo))
        .select(col("source"), col("n").as("n_docs"), col("mix_weight"),
          (col("base") + when(col("rk") <= col("lo"), 1L).otherwise(0L))
            .as("alloc_docs"))
        .orderBy(col("source"))
    },

    // -- nucleus (top-p) selection per source: keep each source's
    //    largest documents until 90% of its character mass is covered —
    //    the mass-based head selector (the sampling dual of q103's
    //    count-based domain cap) that trims the long tail of tiny docs
    //    without a per-source count budget. The inclusion rule is
    //    "keep while the mass BEFORE this doc is under p·total", so the
    //    crossing doc is kept — and it clears the division: keep iff
    //    (cum − len)·10 < total·9, exact integers. One window per
    //    source key (high cardinality at corpus scale), one broadcast
    //    totals join; output is the per-source keep summary.
    "q185_nucleus_select" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("total"))
      docs.withColumn("cum", sum(col("n_chars")).over(w))
        .join(broadcast(tot), Seq("source"))
        .withColumn("keep", (col("cum") - col("n_chars")) * 10 < col("total") * 9)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"),
          max(col("total")).as("total_chars"))
        .orderBy(col("source"))
    },

    // -- weighted stride-scheduled mixture order: the TRAINING-ORDER
    //    interleave that q84/q123 only allocate. Each source gets a
    //    stream position key (2·rank − 1)/(2·w) — stride scheduling's
    //    midpoint rule — so a source holding fraction w/Σw of the token
    //    mass occupies that fraction of every PREFIX of the training
    //    order, not just of the whole corpus (the property epoch-level
    //    concatenation + shuffle only delivers in expectation; a
    //    curriculum or early-stopped run sees the declared mixture at
    //    every step). Within a source the order is the q104 salted-md5
    //    permutation. All keys are exact integers until ONE IEEE
    //    division; cross-source ties break (source, doc_id). The global
    //    numbering is the two-pass range-partitioned form — never a
    //    single-task window; the per-source rank window partitions by
    //    source (the q103 discussion covers a mega-source).
    "q220_stride_mixture" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      val tw = toks.groupBy(col("source")).agg(sum(col("n_tok")).as("w"))
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("skey"), col("doc_id"))
      val keyed = toks
        .withColumn("skey",
          md5(concat(lit(MixSalt), col("doc_id").cast("string"))))
        .withColumn("src_rank", row_number().over(wr).cast("long"))
        .join(broadcast(tw), Seq("source"))
        .withColumn("stride_key",
          (col("src_rank") * 2 - 1).cast("double") /
            (col("w") * 2).cast("double"))
      graft.warehouse.Scale.withGlobalRowNumber(keyed,
          Seq(col("stride_key"), col("source"), col("doc_id")), "global_pos")
        .select(col("doc_id"), col("source"), col("src_rank"),
          col("global_pos"))
        .orderBy(col("doc_id"))
    }
  )

  /** q103's per-source cap — shared with the generated oracle SQL. */
  private val DomainCap = 10

  /** q123's total sample budget — shared with the generated oracle SQL. */
  private val AllocBudget = 1000

  /** q104's epoch salt — a new salt is a new permutation. */
  private val EpochSalt = "epoch1:"

  /** q220's within-source shuffle salt — a new salt re-deals every
    * source's internal order while the stride interleave (a pure
    * function of rank and weight) is unchanged. */
  private val MixSalt = "mix0:"

  /** q228's draw count and hash salt — shared with the generated oracle
    * SQL. A new salt is a new systematic pass over a fresh permutation. */
  private val PpsDraws = 40
  private val PpsSalt = "pps1:"

  /** Context length for q76 — shared with the generated oracle SQL. */
  private val SeqPackLen = 512

  /** Global BPE token budget for q84 — shared with the generated oracle
    * SQL. ~5k against the sf0.01 corpus's ~20k tokens, so the greedy
    * prefix genuinely truncates most sources. */
  private val TokenBudget = 5000L

  def oracleSql: Map[String, String] = Map(
    "q63_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_sampled, MAX(doc_id) AS max_kept_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 50
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q157_systematic_sample" ->
      """WITH n AS (
        |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, rn FROM n WHERE rn % 100 = 1 ORDER BY rn""".stripMargin,

    // Same exact moments, same √, same source-ordered weight fold
    // (init-less LIST_REDUCE ≡ 0.0-seeded aggregate for non-negative
    // weights), same floor/fraction largest-remainder arithmetic.
    "q242_neyman_alloc" ->
      s"""WITH c AS (
        |  SELECT source, COUNT(*) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sm,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n, SQRT(CAST(n * q - sm * sm AS DOUBLE)) AS w
        |  FROM c),
        |sw AS (
        |  SELECT LIST_REDUCE(LIST(w ORDER BY source), (x, y) -> x + y) AS sw
        |  FROM w),
        |b AS (
        |  SELECT source, n,
        |    CAST(FLOOR($AllocBudget * w / sw) AS BIGINT) AS base,
        |    $AllocBudget * w / sw - FLOOR($AllocBudget * w / sw) AS frac
        |  FROM w, sw),
        |lo AS (SELECT $AllocBudget - CAST(SUM(base) AS BIGINT) AS lo FROM b),
        |r AS (
        |  SELECT source, n, base, frac,
        |    ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rk
        |  FROM b)
        |SELECT source, n AS n_docs,
        |  base + CASE WHEN rk <= lo THEN 1 ELSE 0 END AS alloc_docs
        |FROM r, lo ORDER BY source""".stripMargin,

    // Same sqrt weights, same source-ordered fold, same floor/remainder
    // arithmetic — the estimate replays bit-for-bit.
    "q253_temperature_mixture" ->
      s"""WITH c AS (
        |  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n, SQRT(CAST(n AS DOUBLE)) AS w FROM c),
        |sw AS (
        |  SELECT LIST_REDUCE(LIST(w ORDER BY source), (x, y) -> x + y) AS sw
        |  FROM w),
        |b AS (
        |  SELECT source, n, w / sw AS mix_weight,
        |    CAST(FLOOR($AllocBudget * w / sw) AS BIGINT) AS base,
        |    $AllocBudget * w / sw - FLOOR($AllocBudget * w / sw) AS frac
        |  FROM w, sw),
        |lo AS (SELECT $AllocBudget - CAST(SUM(base) AS BIGINT) AS lo FROM b),
        |r AS (
        |  SELECT source, n, mix_weight, base, frac,
        |    ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rk
        |  FROM b)
        |SELECT source, n AS n_docs, mix_weight,
        |  base + CASE WHEN rk <= lo THEN 1 ELSE 0 END AS alloc_docs
        |FROM r, lo ORDER BY source""".stripMargin,

    // Same salted order, same running sum, same floor arithmetic — the
    // window form is safe in DuckDB (single node); Spark uses the
    // two-pass range-partitioned sum instead.
    "q228_pps_sample" ->
      s"""WITH t AS (
        |  SELECT doc_id, n_chars,
        |    MD5('$PpsSalt' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_chars,
        |    SUM(n_chars) OVER (ORDER BY skey ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |w AS (SELECT SUM(n_chars) AS tot FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    (cum * $PpsDraws) // tot - ((cum - n_chars) * $PpsDraws) // tot
        |      AS n_picks
        |  FROM c, w)
        |SELECT doc_id, n_chars, CAST(n_picks AS BIGINT) AS n_picks
        |FROM p WHERE n_picks >= 1
        |ORDER BY doc_id""".stripMargin,

    "q64_source_mixture" ->
      """SELECT source, COUNT(*) AS n_kept
        |FROM (SELECT *, CAST(REGEXP_EXTRACT(source, '([0-9]+)$', 1) AS INT) AS src_num
        |  FROM documents)
        |WHERE (src_num % 2 = 0 AND doc_id % 2 = 0)
        |   OR (src_num % 2 = 1 AND doc_id % 5 = 0)
        |GROUP BY source ORDER BY source""".stripMargin,

    // Reuses the generated BPE recomputation (TextQueries.bpeCtes) so the
    // pack layout is checked against the SAME merges table the kernel
    // compiles in; DuckDB widens SUM(BIGINT) to HUGEINT, hence the casts.
    "q76_sequence_pack" ->
      s"""WITH RECURSIVE ${TextQueries.bpeCtes},
         |toks AS (
         |  SELECT doc_id, CAST(n_bpe AS BIGINT) AS n_bpe FROM bpecnt WHERE n_bpe > 0),
         |c AS (
         |  SELECT doc_id, n_bpe,
         |    CAST(SUM(n_bpe) OVER (ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM toks)
         |SELECT doc_id, n_bpe,
         |  (cum - n_bpe) // $SeqPackLen AS first_pack,
         |  (cum - 1) // $SeqPackLen AS last_pack,
         |  ((cum - n_bpe) // $SeqPackLen) <> ((cum - 1) // $SeqPackLen) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    // Same generated BPE replay; the greedy prefix is the per-source
    // cumulative-sum filter, and the quota scalar is recomputed the same
    // way (budget // distinct-source count).
    "q84_token_budget_mixture" ->
      s"""WITH RECURSIVE ${TextQueries.bpeCtes},
         |toks AS (
         |  SELECT d.doc_id, d.source, CAST(COALESCE(b.n_bpe, 0) AS BIGINT) AS n_bpe
         |  FROM documents d LEFT JOIN bpecnt b ON d.doc_id = b.doc_id),
         |q AS (SELECT $TokenBudget // COUNT(DISTINCT source) AS quota FROM toks),
         |c AS (
         |  SELECT doc_id, source, n_bpe,
         |    CAST(SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM toks)
         |SELECT source, COUNT(*) AS n_docs_kept,
         |  CAST(SUM(n_bpe) AS BIGINT) AS tokens_kept,
         |  MAX(q.quota) AS quota_tokens
         |FROM c, q WHERE cum <= q.quota
         |GROUP BY source ORDER BY source""".stripMargin,

    "q103_domain_cap" ->
      s"""SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rn <= $DomainCap THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q104_epoch_shuffle" ->
      s"""SELECT doc_id, skey,
        |  ROW_NUMBER() OVER (ORDER BY skey) AS shuffle_pos
        |FROM (SELECT doc_id, MD5('$EpochSalt' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // MIN over a generated powers-of-two table computes the same bucket
    // the Spark side's 21-arm CASE chain does.
    "q120_length_buckets" ->
      """WITH toks AS (
        |  SELECT CAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS BIGINT)
        |    AS n_tokens
        |  FROM documents),
        |pows AS (SELECT (1::BIGINT << x) AS p FROM RANGE(21) t(x)),
        |b AS (
        |  SELECT n_tokens,
        |    (SELECT MIN(p) FROM pows WHERE p >= n_tokens) AS bucket_len
        |  FROM toks)
        |SELECT bucket_len, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(COUNT(*) * bucket_len AS BIGINT) AS padded_tokens,
        |  CAST(COUNT(*) * bucket_len - SUM(n_tokens) AS BIGINT) AS waste_tokens
        |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin,

    // md5_number_lower's lower half is the same little-endian byte order
    // portableHash48 builds; % 2^48 keeps both engines in positive range.
    "q121_split_assign" ->
      """SELECT source, split, COUNT(*) AS n_docs FROM (
        |  SELECT source,
        |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT source,
        |      (md5_number_lower(CAST(doc_id AS VARCHAR)) % 281474976710656) % 100 AS b
        |    FROM documents))
        |GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q123_proportional_alloc" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
         |t AS (SELECT SUM(n) AS tot FROM c),
         |b AS (
         |  SELECT source, n, ($AllocBudget * n) // t.tot AS base,
         |    ($AllocBudget * n) % t.tot AS rem
         |  FROM c, t),
         |l AS (SELECT $AllocBudget - SUM(base) AS leftover FROM b),
         |r AS (
         |  SELECT source, n, base, rem,
         |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
         |  FROM b)
         |SELECT source, CAST(n AS BIGINT) AS n_docs,
         |  CAST(base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
         |    AS alloc_docs
         |FROM r, l ORDER BY source""".stripMargin,

    "q185_nucleus_select" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY source) AS total
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN (cum - n_chars) * 10 < total * 9 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN (cum - n_chars) * 10 < total * 9 THEN n_chars
        |    ELSE 0 END) AS BIGINT) AS kept_chars,
        |  CAST(MAX(total) AS BIGINT) AS total_chars
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,

    // Same exact-integer stride keys and the identical single IEEE
    // division; the global numbering's (stride_key, source, doc_id)
    // total order makes ROW_NUMBER deterministic in both engines.
    "q220_stride_mixture" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS BIGINT)
         |      AS n_tok
         |  FROM documents),
         |w AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS w
         |  FROM t GROUP BY 1),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY MD5('$MixSalt' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS BIGINT) AS src_rank
         |  FROM t),
         |k AS (
         |  SELECT r.doc_id, r.source, r.src_rank,
         |    CAST(2 * r.src_rank - 1 AS DOUBLE) / CAST(2 * w.w AS DOUBLE) AS sk
         |  FROM r JOIN w USING (source))
         |SELECT doc_id, source, src_rank,
         |  CAST(ROW_NUMBER() OVER (ORDER BY sk, source, doc_id) AS BIGINT)
         |    AS global_pos
         |FROM k ORDER BY doc_id""".stripMargin
  )
}
