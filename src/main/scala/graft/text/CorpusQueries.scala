package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.util.Checkpoints.CutOps
import graft.util.Tables

/** Corpus-hygiene operators for training-data pipelines: benchmark
  * decontamination, PII scrubbing, within-document repetition scoring,
  * and vocabulary statistics. The reference stages raw business text
  * into a warehouse (README.md:3); a training-data warehouse needs
  * these same hygiene passes before the corpus is consumable.
  *
  * All column logic is codegen'd built-ins (split/regexp/window) — no
  * UDFs — and every pipeline is one shuffle on a blocking key, never
  * all-pairs, so each survives a 100 TB corpus unchanged.
  */
object CorpusQueries {

  // q77 configuration — shared by the Spark query and the SQL generator
  // (the q57 shared-constant pattern). Production decontamination runs
  // 13-gram windows (GPT-3 appendix C); this corpus is ~50-word synthetic
  // docs, so 3-grams keep the overlap distribution informative while the
  // threshold still separates real leakage from incidental collisions.
  private[text] val ContamN = 3
  private[text] val ContamThreshold = 5
  private[text] val EvalSource = "src0"

  // q188/q189 configuration — shared by the Spark queries and the SQL
  // oracles (same pattern as the q77 constants above).
  private[text] val GopherStop =
    Seq("the", "and", "of", "a", "to", "is", "in", "with")
  private[text] val GopherMinWords = 10L
  private[text] val GopherMaxWords = 1000L
  private[text] val DsirBuckets = 256L
  private[text] val DsirTarget = "src0"

  /** Benchmark-decontamination ledger: for every train document, the
    * number of its distinct n-gram shingles that appear anywhere in the
    * eval slice, and a contamination flag at `threshold`.
    *
    * Scale shape: distinct eval shingles are one small-side relation (an
    * eval suite is KBs–MBs against a 100 TB corpus), so the semi join
    * broadcasts; if the eval side ever grows, the join degrades to one
    * shuffle on the shingle key — never a cross product. The train side
    * is one shingle explode + distinct + groupBy(id), all riding the
    * same id partitioning as [[Dedup.shingleRows]]'s window.
    */
  def contaminationLedger(docs: DataFrame, id: Column, text: Column,
      isEval: Column, n: Int = ContamN,
      threshold: Int = ContamThreshold): DataFrame = {
    val tagged = docs.select(id.as("id"), text.as("text"), isEval.as("is_eval"))
    val evalSh = Dedup.shingleRows(tagged.filter(col("is_eval")), col("id"),
        col("text"), n)
      .select(col("sh")).distinct()
    val trainSh = Dedup.shingleRows(tagged.filter(!col("is_eval")), col("id"),
        col("text"), n)
      .distinct()
    val hits = trainSh.join(evalSh, Seq("sh"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    tagged.filter(!col("is_eval")).select(col("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_hits"), lit(0L)) >= threshold).as("is_contaminated"))
  }

  // PII patterns constrained to the RE2 ∩ java.util.regex common subset
  // (no lookaround, no backrefs) so the DuckDB oracle replays them
  // verbatim. The phone pattern anchors on '+' to avoid swallowing
  // arbitrary digit runs (dates, ids) — production scrubbers run a
  // pattern battery; the plumbing (count on the raw text, sequential
  // replace) is what this operator pins down.
  private[text] val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[text] val PhonePattern = "\\+[0-9][0-9-]{6,}"

  // q87 window width — shared by the Spark query and the SQL generator.
  // Production substring dedup runs ~50-token windows (Lee et al. 2022);
  // this corpus is ~50-word docs, so 8-token windows keep maximal spans
  // informative (47 spans at sf0.01, all true duplicated passages).
  private[text] val SpanN = 8

  /** Redacted text: emails first (so their digits can't half-match the
    * phone pattern), then phone numbers. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  /** Per-document repetition score: total vs distinct trigram counts and
    * the duplicated-trigram ratio (1 − distinct/total) — the cheap
    * single-pass signal for degenerate/boilerplate text (repeated
    * n-grams are the canonical low-quality marker). Documents shorter
    * than the shingle width score 0. One shuffle on the doc id. */
  def repetitionScores(docs: DataFrame, id: Column, text: Column,
      n: Int = 3): DataFrame = {
    val sh = Dedup.shingleRows(docs.select(id.as("id"), text.as("text")),
      col("id"), col("text"), n)
    val counts = sh.groupBy(col("id")).agg(
      count(lit(1)).as("n_total"),
      countDistinct(col("sh")).as("n_distinct"))
    val tot = coalesce(col("n_total"), lit(0L))
    val dst = coalesce(col("n_distinct"), lit(0L))
    docs.select(id.as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), tot.as("n_trigrams"), dst.as("n_distinct_trigrams"),
        when(tot > lit(0L), (tot - dst).cast("double") / tot.cast("double"))
          .otherwise(lit(0.0)).as("dup_trigram_ratio"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- decontamination: eval slice = one source, train = the rest.
    "q77_decontaminate" -> { (s, d) =>
      contaminationLedger(Tables.documents(s, d), col("doc_id"), col("text"),
          col("source") === EvalSource)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // -- PII scrub: the synthetic corpus carries no PII, so the query
    //    plants a deterministic doc_id-derived email + phone per row
    //    (both engines build the identical string), then counts and
    //    redacts — the scrub genuinely fires on every row.
    "q78_pii_scrub" -> { (s, d) =>
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-010-"), col("doc_id").cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          scrubPii(aug).as("scrubbed"),
          emailCount(aug).as("n_emails"),
          phoneCount(aug).as("n_phones"))
        .orderBy(col("doc_id"))
    },

    // -- repetition / boilerplate scoring.
    "q79_repetition" -> { (s, d) =>
      repetitionScores(Tables.documents(s, d), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // -- substring-level dedup (Lee et al. 2022): maximal cross-document
    //    repeated token spans — the passage/boilerplate detection whole-
    //    document dedup (q40/q45) cannot see. Oracle-parity config keeps
    //    the raw window string as the join key (hashKeys=false) so DuckDB
    //    replays it; production callers keep the default xxhash64 key,
    //    which shrinks the shuffled key to 8 bytes.
    "q87_repeated_spans" -> { (s, d) =>
      Dedup.repeatedSpans(Tables.documents(s, d), col("doc_id"), col("text"),
          n = SpanN, hashKeys = false)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("span_start"))
    },

    // -- PAIR-ALIGNED shared spans (q87's cross-width extension, round-6
    //    verdict #8): the whole span provably appears contiguously in
    //    BOTH documents of the emitted pair, with both offsets — the
    //    exact duplicate-passage unit a span-cut pipeline removes.
    //    Diagonal (pos_a - pos_b) gaps-and-islands per pair; oracle-
    //    parity config keeps raw window strings (q87 precedent) and an
    //    unbounded occurrence cap (the SQL cannot model the stop-window
    //    drop; production callers keep both defaults).
    "q133_shared_spans" -> { (s, d) =>
      // Int.MaxValue = the declared cap-disabled oracle-parity config
      // (round 16): sharedSpans now skips the df-guard's groupBy +
      // semi-join outright when disabled — at the previous 1000000 the
      // filter dropped nothing but still paid one full shuffle of the
      // shingle stream
      Dedup.sharedSpans(Tables.documents(s, d), col("doc_id"), col("text"),
          n = SpanN, maxOccurrences = Int.MaxValue, hashKeys = false)
        .orderBy(col("id_a"), col("id_b"), col("a_start"), col("b_start"))
    },

    // -- overlapping context-window chunking: fixed 64-token chunks on a
    //    48-token stride (16-token overlap) — the RAG / training split
    //    every long document goes through before embedding or packing.
    //    Chunk boundaries derive from each doc's own token count
    //    (sequence + slice: generators, no UDFs, no shuffle beyond the
    //    final sort), so the operator is embarrassingly parallel and
    //    chunk counts stay proportional to document length at any scale.
    "q134_chunk_overlap" -> { (s, d) =>
      val C = 64; val S = 48
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") >= 1)
        .select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0), expr(s"(n - 1) div $S"))).as("chunk_id"))
        .select(col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          (col("chunk_id") * S).cast("long").as("start_tok"),
          least(lit(C), col("n") - col("chunk_id") * S).cast("long")
            .as("n_chunk_toks"),
          array_join(slice(col("toks"), col("chunk_id") * S + 1, lit(C)), " ")
            .as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // -- vocabulary statistics: corpus-wide top bigrams (the counting
    //    pass a tokenizer-training / vocab-extension job runs; one
    //    map-side-combined groupBy + TakeOrderedAndProject, no global
    //    sort).
    "q83_vocab_bigrams" -> { (s, d) =>
      Dedup.shingleRows(Tables.documents(s, d), col("doc_id"), col("text"), 2)
        .groupBy(col("sh")).agg(count(lit(1)).as("n"))
        .select(col("sh").as("bigram"), col("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },

    // -- T5-style SPAN-CORRUPTION masks (Raffel et al. 2020's denoising
    //    objective, as the deterministic DATA-PREP face: the mask
    //    schedule must be reproducible across engines/runs, so trigger
    //    positions come from the portable hash — position i opens a
    //    3-token span iff H48(doc_id:i) ≡ 0 (mod 8), giving ~3/8
    //    expected corruption before overlap merging). Overlapping and
    //    adjacent spans merge (gaps-and-islands on the covered
    //    positions — exactly the sentinel-token semantics, where runs
    //    collapse to one mask token each); outputs per doc: token
    //    count, masked-token count, and the merged span count a
    //    sentinel-vocabulary sizing needs. Plan: one posexplode, the
    //    hash filter, a ≤3-wide sequence explode, a per-doc distinct,
    //    and one doc-partitioned islands window — no pairs, no global
    //    sort.
    "q259_span_corruption" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"))
      val nTok = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
      val triggers = toks.filter(
        pmod(TextFunctions.portableHash48(
          concat(col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string"))), lit(8L)) === 0)
      val covered = triggers
        .join(nTok, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"),
          explode(sequence(col("pos"),
            least(col("pos") + 2, col("n_tokens")))).as("mpos"))
        .select(col("doc_id"), col("n_tokens"), col("mpos"))
        .distinct()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("mpos"))
      val spans = covered
        .withColumn("grp", col("mpos") - row_number().over(w))
        .groupBy(col("doc_id"), col("n_tokens"))
        .agg(count(lit(1)).as("n_masked"),
          countDistinct(col("grp")).as("n_spans"))
      nTok.join(spans.drop("n_tokens"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"))
        .orderBy(col("doc_id"))
    },

    // -- distinct-n DIVERSITY (Li et al. 2016's generation-diversity
    //    metric applied as a corpus diagnostic): per source and n ∈
    //    {1,2,3}, the share of DISTINCT n-grams among all n-gram
    //    occurrences — a template-heavy or boilerplate-dominated source
    //    scores low before any pair-level dedup runs (the cheap
    //    screening pass ahead of q45's pipeline). Plan: three
    //    shingle-row passes (window-lead construction, codegen'd), each
    //    a map-side-combined groupBy(source) with a COUNT DISTINCT —
    //    Spark's two-phase distinct aggregation, no pairs, no global
    //    sort; the union is #sources×3 rows.
    "q255_ngram_diversity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      (1 to 3).map { n =>
        Dedup.shingleRows(docs, col("doc_id"), col("text"), n,
            carry = Seq("source" -> col("source")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_grams"),
            countDistinct(col("sh")).as("n_distinct"))
          .select(col("source"), lit(n.toLong).as("n"), col("n_grams"),
            col("n_distinct"),
            (col("n_distinct").cast("double") / col("n_grams").cast("double"))
              .as("distinct_ratio"))
      }.reduce(_ unionByName _).orderBy(col("source"), col("n"))
    },

    // -- per-document keyword extraction: top-3 terms by TF-IDF. The IDF
    //    is the RAW inverse document frequency N/df (log-free: ln() is
    //    libm-dependent and not bit-stable across engines; the ranking it
    //    induces per document is identical since ln is monotone). Plan:
    //    one explode shuffled on (doc, term) for TF, a term-keyed
    //    aggregate for DF that joins back on the same term partitioning,
    //    a 1-row broadcast for N, and a doc-partitioned ranking window —
    //    no global sort, no all-pairs, survives corpus scale unchanged.
    "q99_tfidf_terms" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val terms = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val score = col("tf").cast("double") * col("n_docs").cast("double") /
        col("df").cast("double")
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("term"))).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // -- n-gram novelty scoring: what fraction of a document's distinct
    //    3-shingles appears in NO earlier document (by id order) — the
    //    dedup-aware curation signal that separates "new content" from
    //    "remix of the corpus so far", one step softer than the q41/q45
    //    pair pipelines. Plan: one shingle-keyed min-aggregate finds each
    //    shingle's first document, a join back on the same shingle key
    //    tags every occurrence, and a doc-keyed count finishes — no
    //    pairs, no quadratic face, ratios are one IEEE division.
    "q164_novelty" -> { (s, d) =>
      val sh = Dedup.shingleRows(Tables.documents(s, d),
        col("doc_id"), col("text"), 3).distinct()
      val firsts = sh.groupBy(col("sh")).agg(min(col("id")).as("first_doc"))
      sh.join(firsts, Seq("sh"))
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("id"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
        .orderBy(col("doc_id"))
    },

    // -- language-model count tables: bigram frequency PLUS the
    //    Kneser-Ney continuation count (how many DISTINCT left contexts
    //    each word follows — the numerator of the KN lower-order
    //    distribution). Counts only, by design: the smoothed
    //    probabilities are one libm-free division away and engine-
    //    dependent, the counts are exact. One multiplicity-preserving
    //    bigram explode feeds both aggregates; the continuation table
    //    joins back on the word key it was grouped by — no extra shuffle
    //    of the big side.
    "q147_kn_counts" -> { (s, d) =>
      val pairs = Tables.documents(s, d)
        .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS w1,
            |              element_at(toks, i + 1) AS w2))""".stripMargin)).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      val cont = pairs.groupBy(col("w2")).agg(countDistinct(col("w1")).as("n_contexts"))
      bc.join(cont, Seq("w2"))
        .select(col("w1"), col("w2"), col("n"), col("n_contexts"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(30)
    },

    // -- feature hashing ("hashing trick"): every token is projected to
    //    a fixed 64-dim slot by the PORTABLE 48-bit hash
    //    ([[TextFunctions.portableHash48]] ≡ DuckDB md5_number_lower %
    //    2^48), giving the bounded-width bag-of-words a linear model
    //    trains on without a vocabulary pass. One explode + one
    //    map-side-combined aggregate on the dim key — collision
    //    accounting (n_terms per slot) rides the same shuffle. The
    //    output width is the CONSTANT D regardless of corpus size: this
    //    is the whole point of the trick at 100 TB — no vocab table, no
    //    second join, no skew (the hash spreads tokens uniformly).
    "q139_feature_hash" -> { (s, d) =>
      val terms = Tables.documents(s, d).select(
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .filter(col("term") =!= "")
      terms
        .withColumn("dim", pmod(TextFunctions.portableHash48(col("term")), lit(64L)))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), countDistinct(col("term")).as("n_terms"))
        .orderBy(col("dim"))
    },

    // -- inverted index build: term → document-frequency + sorted posting
    //    list, the IR structure decontamination / exact-phrase lookups
    //    probe. One (doc, term) dedup shuffle; the posting aggregation
    //    rides the term key. Postings are CAPPED per term (lowest
    //    PostingCap doc ids) via a TWO-STAGE SALTED cap so a stop-word
    //    term never funnels its full posting list through one sort task —
    //    the segment-sharding every production index applies; see
    //    invertedIndex below for the equivalence argument. df counts ALL
    //    docs regardless of the cap. Output df >= MinDf only (the index
    //    head — bounded rows).
    "q115_inverted_index" -> { (s, d) =>
      invertedIndex(Tables.documents(s, d), MinDf, PostingCap)
    },

    // -- corpus overlap matrix: source×source 3-gram Jaccard — the
    //    provenance-level dual of q124's per-document containment, the
    //    report that decides which SOURCES to drop or down-weight before
    //    mixing a training corpus. Collapsing shingles to the (source,
    //    shingle) level FIRST bounds the intersection join's fan-out per
    //    shingle key at n_sources² (here ≤ 20², at any corpus size) —
    //    the class-collapse discipline of the dedup stack, which makes
    //    a shingle-keyed self-join safe where a doc-level one would be
    //    quadratic in the corpus. Set sizes are exact; the Jaccard is
    //    ONE IEEE division of exact integers.
    "q171_source_overlap" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"), 3,
          Seq("src" -> col("source")))
        .select(col("src"), col("sh")).distinct()
      val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.src") < col("b.src"))
        .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("src").as("src_a"), col("n").as("n_a")), Seq("src_a"))
        .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
          (col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // -- greedy max-coverage selection (the facility-location heuristic):
    //    pick K documents, each round taking the doc covering the most
    //    still-uncovered 3-gram shingles — the classic diverse-subset
    //    selector for training-data curation (submodular, so greedy is a
    //    (1−1/e)-approximation). Each round is one anti-join against the
    //    covered set (sh-keyed, O(remaining)), one map-side gain count,
    //    and a 1-ROW argmax to the driver — bounded metadata, the q112
    //    scalar pattern, never a data collect. The covered set is
    //    localCheckpoint-ed per round (q118 lesson). K is small and
    //    fixed; the oracle unrolls the same K steps.
    //
    //    Scale note: `covered` is bounded by K docs' distinct shingles —
    //    broadcast it, so the per-round anti join is a broadcast-hash
    //    probe over the cached shingle table instead of re-shuffling the
    //    corpus-sized side every round. Local-mode wall time is
    //    unchanged (job-launch + the per-round groupBy dominate at
    //    sf0.1), but at 100 TB the corpus side never moves — only the
    //    groupBy's map-side-combined per-doc partials do.
    "q181_greedy_coverage" -> { (s, d) =>
      import s.implicits._
      val k = 5
      val sh = Dedup.shingleRows(Tables.documents(s, d),
          col("doc_id"), col("text"), 3)
        .select(col("id"), col("sh")).distinct()
        .persist()
      var covered = sh.select(col("sh")).limit(0).cutLineage()
      val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      (1 to k).foreach { r =>
        val gains = sh.join(broadcast(covered), Seq("sh"), "left_anti")
          .groupBy(col("id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("id")).limit(1).head()
        val (doc, gain) = (gains.getLong(0), gains.getLong(1))
        picks += ((r.toLong, doc, gain))
        covered = covered
          .unionAll(sh.filter(col("id") === doc).select(col("sh")))
          .distinct().cutLineage()
      }
      sh.unpersist()
      picks.toSeq.toDF("round", "doc_id", "gain").orderBy(col("round"))
    },

    // -- positional phrase search: docs containing the exact phrase
    //    "fast merge" via POSITION-aware postings — the adjacency join
    //    (t₁ at p, t₂ at p+1, same doc) a positional inverted index
    //    answers; q115's index is the doc-level variant, this is the
    //    phrase-level one. Both term filters push into the posting
    //    generation (only the two query terms' postings survive the
    //    scan), and the join keys on (doc, pos) — selectivity is the
    //    PHRASE's, never the corpus's. Hit counts are per-doc phrase
    //    occurrences.
    "q183_phrase_search" -> { (s, d) =>
      val pos = Dedup.shingleRowsPos(Tables.documents(s, d),
        col("doc_id"), col("text"), 1)
      val t1 = pos.filter(col("sh") === "fast")
        .select(col("id"), col("pos"))
      val t2 = pos.filter(col("sh") === "merge")
        .select(col("id").as("id2"), col("pos").as("pos2"))
      t1.join(t2, col("id") === col("id2") && col("pos2") === col("pos") + 1)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("doc_id"))
    },

    // -- Gopher quality rules (Rae et al. 2021 §A1.1): the published
    //    per-document filter battery every web-scale corpus passes
    //    before training — word-count bounds, mean-word-length bounds,
    //    ≥2 stopwords, ≥80% alphabetic words, symbol-to-word ratio.
    //    Every gate is cleared-division exact integers (3n ≤ chars ≤ 10n
    //    instead of a float mean; 5·alpha ≥ 4·n instead of 0.8), so the
    //    verdict never touches libm. Pure per-row projections — one scan,
    //    no shuffle before the output sort, embarrassingly parallel at
    //    any corpus size. Word-count bounds are scaled to this corpus's
    //    ~50-word docs (production Gopher uses 50..100,000).
    "q188_gopher_quality" -> { (s, d) =>
      gopherFlags(Tables.documents(s, d), col("doc_id"), col("text"),
          GopherMinWords, GopherMaxWords)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // -- DSIR-shaped importance selection (Xie et al. 2023): score each
    //    background document by hashed-unigram affinity to a target
    //    slice. The published weight is Σ log(p_target(b)/p_raw(b)) over
    //    the doc's hashed features; here each bucket contributes its
    //    cleared-division SIGN (+1 if n_t·B > n_b·T, −1 if <, 0 tie) so
    //    the score — and the selection gate — is exact integers (the
    //    real-valued log-ratio is a rank refinement of the same per-
    //    bucket comparison). Scale shape: ONE token explode into a
    //    per-(doc, bucket) rollup; corpus-level bucket counts re-
    //    aggregate FROM that rollup (no second scan), and the ≤256-row
    //    leaning table broadcasts back — never a second pass over text.
    "q189_dsir_select" -> { (s, d) =>
      dsirSelect(Tables.documents(s, d), col("doc_id"), col("text"),
          col("source") === DsirTarget, DsirBuckets)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // -- URL canonicalization dedup: the normalization web-crawl dedup
    //    runs BEFORE any content hashing (lowercase scheme+host, strip
    //    the default port, drop tracking params, sort the query string,
    //    drop the fragment). The corpus carries no URLs, so the query
    //    PLANTS a deterministic messy URL per doc (the q78 PII
    //    precedent: host/path from doc_id mod classes, a doc-unique
    //    utm_ param and fragment that canonicalization must remove) —
    //    500 raw URLs genuinely collapse to the 35 host×path classes.
    //    Pure per-row string ops + one canonical-key window whose
    //    partitions are dup-group-sized, never corpus-sized.
    // -- log/document template mining (the Drain-family shape): a token
    //    is STABLE when ≥90% of docs contain it (cleared division:
    //    10·df ≥ 9·N — scale-free, no float threshold); each document's
    //    template keeps stable tokens in position and masks the rest as
    //    '<*>'; identical templates group. The ops face of the text
    //    stack — log-stream triage, boilerplate families, format-drift
    //    detection. One posexplode feeds the doc-frequency aggregate
    //    and the per-doc rebuild (the q214 ordered-rebuild idiom: sort
    //    a (pos, token) struct list, never a window over the corpus);
    //    the doc count broadcasts as one row.
    "q241_log_templates" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val tok = Dedup.shingleRowsPos(docs, col("doc_id"), col("text"), 1)
      val dfreq = tok.select(col("id"), col("sh")).distinct()
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("nd"))
      val tpl = tok.join(dfreq, Seq("sh"))
        .crossJoin(broadcast(n))
        .select(col("id"), col("pos"),
          when(col("df") * 10 >= col("nd") * 9, col("sh"))
            .otherwise(lit("<*>")).as("t"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("t")))).as("kv"))
        .select(col("id"),
          expr("array_join(transform(kv, x -> x.t), ' ')").as("template"))
      tpl.groupBy(col("template"))
        .agg(count(lit(1)).as("n_docs"), min(col("id")).as("example_doc"))
        .orderBy(col("n_docs").desc, col("template"))
        .limit(20)
    },

    "q190_url_canonical" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val url = concat(lit("HTTPS://WWW.Example"),
        (col("doc_id") % 7).cast("string"),
        lit(".COM:443/Path"), (col("doc_id") % 5).cast("string"),
        lit("/?utm_source=x"), col("doc_id").cast("string"),
        lit("&b=2&a=1#frag"), col("doc_id").cast("string"))
      val canon = urlCanonicalize(url)
      val w = Window.partitionBy(col("canonical_url"))
      Tables.documents(s, d)
        .select(col("doc_id"), canon.as("canonical_url"))
        .select(col("doc_id"), col("canonical_url"),
          count(lit(1)).over(w).as("n_dups"),
          (col("doc_id") === min(col("doc_id")).over(w)).as("is_canonical"))
        .orderBy(col("doc_id"))
    }
  )

  /** Crawl-style URL canonicalization: lowercase scheme and host, strip
    * the default `:443` port, normalize an empty path to `/`, drop
    * `utm_*` tracking params, sort the remaining query params, drop the
    * fragment. Codegen'd regexp/array built-ins only. */
  def urlCanonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val path = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val q2 = array_join(array_sort(filter(split(query, "&"),
      x => x =!= "" && !x.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), regexp_replace(hostport, ":443$", ""),
      when(path === "", "/").otherwise(path),
      when(q2 === "", "").otherwise(concat(lit("?"), q2)))
  }

  /** Gopher quality-rule battery (Rae et al. 2021 §A1.1) per document:
    * word-count bounds, mean-word-length 3..10, ≥2 stopwords, ≥80%
    * alphabetic words, symbol-to-word ratio ≤ 0.1 — every gate in
    * cleared-division exact integers. Pure per-row projections. */
  def gopherFlags(docs: DataFrame, id: Column, text: Column,
      minWords: Long, maxWords: Long,
      keep: Seq[(String, Column)] = Nil): DataFrame = {
    val toks = TextFunctions.tokens(text)
    docs
      .select(Seq(id.as("id"),
        size(toks).cast("long").as("n_words"),
        length(regexp_replace(lower(trim(text)), "\\s+", "")).cast("long")
          .as("n_chars"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        (length(text) - length(regexp_replace(text, "[#…]", ""))).cast("long")
          .as("n_symbols"),
        TextFunctions.wordHits(text, GopherStop).cast("long").as("n_stopwords"))
        ++ keep.map { case (n, c) => c.as(n) }: _*)
      .select(Seq(col("id"), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("wordcount_ok"),
        (col("n_chars") >= col("n_words") * 3 &&
          col("n_chars") <= col("n_words") * 10).as("meanlen_ok"),
        (col("n_stopwords") >= 2L).as("stopword_ok"),
        (col("n_alpha") * 5 >= col("n_words") * 4).as("alpha_ok"),
        (col("n_symbols") * 10 <= col("n_words")).as("symbol_ok"))
        ++ keep.map { case (n, _) => col(n) }: _*)
      .withColumn("passes",
        col("wordcount_ok") && col("meanlen_ok") && col("stopword_ok") &&
          col("alpha_ok") && col("symbol_ok"))
  }

  /** DSIR-shaped importance selection (Xie et al. 2023): per-bucket
    * hashed-unigram leaning sign (+1 target / −1 background / 0 tie by
    * the cleared-division comparison n_t·B vs n_b·T), summed over each
    * BACKGROUND document's tokens. One explode into a (doc, bucket)
    * rollup; corpus bucket counts re-aggregate from that rollup; the
    * ≤`buckets`-row leaning table broadcasts back. */
  def dsirSelect(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Long): DataFrame = {
    val db = docs
      .select(id.as("id"), isTarget.as("is_target"),
        explode(TextFunctions.tokens(text)).as("tok"))
      .select(col("id"), col("is_target"),
        pmod(TextFunctions.portableHash48(col("tok")), lit(buckets)).as("b"))
      .groupBy(col("id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
    val counts = db.groupBy(col("b")).agg(
      sum(when(col("is_target"), col("c")).otherwise(0L)).as("nt"),
      sum(when(!col("is_target"), col("c")).otherwise(0L)).as("nb"))
    val tot = counts.agg(sum(col("nt")).as("t_tot"), sum(col("nb")).as("b_tot"))
    val lean = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        when(col("nt") * col("b_tot") > col("nb") * col("t_tot"), 1L)
          .when(col("nt") * col("b_tot") < col("nb") * col("t_tot"), -1L)
          .otherwise(0L).as("lean"))
    db.filter(!col("is_target"))
      .join(broadcast(lean), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("c") * col("lean")).as("score"))
      .withColumn("selected", col("score") > 0)
  }

  /** Inverted-index build over a `(doc_id, text)` corpus: term → document
    * frequency (over ALL docs) + sorted posting list capped at the
    * `postingCap` LOWEST doc ids.
    *
    * The cap is applied in TWO stages so no task ever sorts a whole
    * term's postings. A stop-word-grade term at 100 TB has billions of
    * postings; a single `row_number over (partition by term)` would
    * funnel all of them through one task before the cap filter ran.
    * Instead:
    *
    *  1. per-(term, salt) cap, salt = xxhash64(doc_id) mod `saltBuckets`
    *     — every window task sees at most its bucket's share of one
    *     term, and at most `postingCap` rows per bucket survive;
    *  2. per-term re-cap over the ≤ saltBuckets×postingCap survivors —
    *     a bounded sort regardless of the term's true df.
    *
    * Stage 2 output is EXACTLY the unsalted answer: a doc id among the
    * term's `postingCap` lowest has fewer than `postingCap` ids below it
    * in the whole term, hence fewer than `postingCap` below it in its
    * own salt bucket, so stage 1 cannot drop it. df comes from the
    * map-side-combined count over all postings, unaffected by either
    * cap. Exposed (with `saltBuckets`) so CorpusQueriesSpec can pin
    * salted ≡ unsalted on a corpus that actually exercises the cap. */
  def invertedIndex(docs: DataFrame, minDf: Int, postingCap: Int,
      saltBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(saltBuckets >= 1, "saltBuckets must be positive")
    val terms = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .distinct()
    val dfC = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w1 = Window.partitionBy(col("term"), col("salt")).orderBy(col("doc_id"))
    val bucketCapped = terms
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(saltBuckets.toLong)))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= postingCap)
      .drop("salt", "rn")
    val w2 = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val postings = bucketCapped
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= postingCap)
      .groupBy(col("term"))
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings"))
    dfC.filter(col("df") >= minDf)
      .join(postings, Seq("term"))
      .select(col("term"), col("df"), col("postings"))
      .orderBy(col("term"))
  }

  /** q115 posting-segment cap + index-head threshold (shared with SQL). */
  private val PostingCap = 1000
  private val MinDf = 100

  def oracleSql: Map[String, String] = Map(
    "q77_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source, UNNEST(LIST_DISTINCT([
         |      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |      FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))])) AS sh
         |  FROM (SELECT doc_id, source,
         |      STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
         |    FROM documents)),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE source = '$EvalSource'),
         |hits AS (
         |  SELECT t.doc_id, COUNT(*) AS n
         |  FROM sh t JOIN ev ON t.sh = ev.sh
         |  WHERE t.source <> '$EvalSource' GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_ngrams,
         |  COALESCE(h.n, 0) >= $ContamThreshold AS is_contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |WHERE d.source <> '$EvalSource'
         |ORDER BY d.doc_id""".stripMargin,

    "q78_pii_scrub" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com or +1-555-010-' || CAST(doc_id AS VARCHAR) AS t
         |  FROM documents)
         |SELECT doc_id,
         |  REGEXP_REPLACE(REGEXP_REPLACE(t, '$EmailPattern', '<EMAIL>', 'g'),
         |    '$PhonePattern', '<PHONE>', 'g') AS scrubbed,
         |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '$EmailPattern')) AS BIGINT) AS n_emails,
         |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '$PhonePattern')) AS BIGINT) AS n_phones
         |FROM aug ORDER BY doc_id""".stripMargin,

    "q79_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    GREATEST(LEN(toks) - 2, 0) AS n_total,
        |    CASE WHEN LEN(toks) >= 3 THEN LEN(LIST_DISTINCT([
        |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |        FOR i IN RANGE(1, LEN(toks) - 1)]))
        |      ELSE 0 END AS n_distinct
        |  FROM t)
        |SELECT doc_id,
        |  CAST(n_total AS BIGINT) AS n_trigrams,
        |  CAST(n_distinct AS BIGINT) AS n_distinct_trigrams,
        |  CASE WHEN n_total > 0
        |    THEN CAST(n_total - n_distinct AS DOUBLE) / CAST(n_total AS DOUBLE)
        |    ELSE 0.0 END AS dup_trigram_ratio
        |FROM c ORDER BY doc_id""".stripMargin,

    // Same maximal-span closure: 0-based window starts i, 1-based-inclusive
    // DuckDB list slice toks[i+1 : i+N] = the N tokens from 0-based i;
    // min<max per window key = "occurs in ≥2 docs"; i − ROW_NUMBER() is the
    // gaps-and-islands group.
    "q87_repeated_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, i, ARRAY_TO_STRING(toks[i+1:i+$SpanN], ' ') AS sh
         |  FROM t, UNNEST(RANGE(0, GREATEST(LEN(toks) - ${SpanN - 1}, 0))) r(i)),
         |rep AS (SELECT sh FROM pos GROUP BY sh HAVING MIN(doc_id) < MAX(doc_id)),
         |hits AS (SELECT doc_id, i FROM pos WHERE sh IN (SELECT sh FROM rep)),
         |isl AS (
         |  SELECT doc_id, i,
         |    i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM hits)
         |SELECT doc_id, CAST(MIN(i) AS BIGINT) AS span_start,
         |  CAST(MAX(i) + ${SpanN - 1} AS BIGINT) AS span_end,
         |  CAST(MAX(i) - MIN(i) + $SpanN AS BIGINT) AS span_tokens
         |FROM isl GROUP BY doc_id, g
         |ORDER BY doc_id, span_start""".stripMargin,

    // Same windowing CTE as q87; occurrence pairs join on the raw window
    // string, islands run per (pair, diagonal). b_start = a_start - diag.
    "q133_shared_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, i, ARRAY_TO_STRING(toks[i+1:i+$SpanN], ' ') AS sh
         |  FROM t, UNNEST(RANGE(0, GREATEST(LEN(toks) - ${SpanN - 1}, 0))) r(i)),
         |occ AS (
         |  SELECT a.doc_id AS id_a, a.i AS pos_a, b.doc_id AS id_b, b.i AS pos_b
         |  FROM pos a JOIN pos b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |isl AS (
         |  SELECT id_a, id_b, pos_a - pos_b AS diag, pos_a,
         |    pos_a - ROW_NUMBER() OVER (
         |      PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp
         |  FROM occ)
         |SELECT id_a, id_b,
         |  CAST(MIN(pos_a) AS BIGINT) AS a_start,
         |  CAST(MIN(pos_a) - diag AS BIGINT) AS b_start,
         |  CAST(MAX(pos_a) - MIN(pos_a) + $SpanN AS BIGINT) AS n_tokens
         |FROM isl GROUP BY id_a, id_b, diag, grp
         |ORDER BY id_a, id_b, a_start, b_start""".stripMargin,

    // Same tokenization; DuckDB's inclusive list slice auto-clamps at the
    // array end exactly like Spark's slice(length=64) does.
    "q134_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, i AS chunk_id, i*48 AS start_tok,
        |  LEAST(64, LEN(toks) - i*48) AS n_chunk_toks,
        |  ARRAY_TO_STRING(toks[i*48+1 : i*48+64], ' ') AS chunk_text
        |FROM (SELECT doc_id, toks, UNNEST(RANGE(0, (LEN(toks)-1)//48 + 1)) AS i
        |      FROM t WHERE LEN(toks) >= 1)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q83_vocab_bigrams" ->
      """WITH t AS (
        |  SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT UNNEST([toks[i] || ' ' || toks[i+1]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks), 1))]) AS bigram
        |  FROM t)
        |SELECT bigram, COUNT(*) AS n FROM bg
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    // Same portable-hash trigger rule (md5 low-48 % 8), same 3-token
    // spans clipped at the doc end, same distinct coverage, same
    // gaps-and-islands merge — exact integers end to end.
    "q259_span_corruption" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, LEN(toks) AS n_tokens FROM t),
        |pos AS (
        |  SELECT doc_id, n_tokens, UNNEST(RANGE(1, n_tokens + 1)) AS i
        |  FROM n),
        |trig AS (
        |  SELECT doc_id, n_tokens, i FROM pos
        |  WHERE (md5_number_lower(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(i AS VARCHAR)) % 281474976710656) % 8 = 0),
        |cov AS (
        |  SELECT DISTINCT doc_id, n_tokens,
        |    UNNEST(RANGE(i, LEAST(i + 2, n_tokens) + 1)) AS mpos
        |  FROM trig),
        |sp AS (
        |  SELECT doc_id, COUNT(*) AS n_masked,
        |    COUNT(DISTINCT mpos - rn) AS n_spans
        |  FROM (SELECT doc_id, mpos,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY mpos) AS rn
        |    FROM cov)
        |  GROUP BY 1)
        |SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(sp.n_masked, 0) AS BIGINT) AS n_masked,
        |  CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans
        |FROM n LEFT JOIN sp ON n.doc_id = sp.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // Same window-lead n-gram positions (1..L-n+1), same counts, one
    // IEEE division — the q83/q164 comprehension per n.
    "q255_ngram_diversity" ->
      """WITH t AS (
        |  SELECT source, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |a AS (
        |  SELECT source, 1 AS n, UNNEST(toks) AS g FROM t
        |  UNION ALL
        |  SELECT source, 2 AS n, UNNEST([toks[i] || ' ' || toks[i+1]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks), 1))]) AS g FROM t
        |  UNION ALL
        |  SELECT source, 3 AS n, UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))]) AS g FROM t)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
        |  CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS distinct_ratio
        |FROM a GROUP BY 1, 2 ORDER BY source, n""".stripMargin,

    "q99_tfidf_terms" ->
      """WITH t AS (
        |  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) DESC,
        |        term) AS rank
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, score, rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q164_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, LIST_DISTINCT([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))]) AS shs
        |  FROM t),
        |x AS (SELECT doc_id, UNNEST(shs) AS sh FROM sh),
        |firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM x GROUP BY 1)
        |SELECT x.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS novelty
        |FROM x JOIN firsts f ON x.sh = f.sh
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q147_kn_counts" ->
      """WITH t AS (
        |  SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |pairs AS (
        |  SELECT UNNEST([{'w1': toks[i], 'w2': toks[i+1]}
        |    FOR i IN RANGE(1, GREATEST(LEN(toks), 1))], recursive := true)
        |  FROM t),
        |bc AS (SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
        |cont AS (SELECT w2, COUNT(DISTINCT w1) AS n_contexts FROM pairs GROUP BY 1)
        |SELECT bc.w1, bc.w2, bc.n, cont.n_contexts
        |FROM bc JOIN cont ON bc.w2 = cont.w2
        |ORDER BY bc.n DESC, bc.w1, bc.w2 LIMIT 30""".stripMargin,

    "q139_feature_hash" ->
      """WITH t AS (
        |  SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS term
        |  FROM documents),
        |ft AS (SELECT term FROM t WHERE term <> '')
        |SELECT CAST((md5_number_lower(term) % 281474976710656) % 64 AS BIGINT) AS dim,
        |  COUNT(*) AS n, COUNT(DISTINCT term) AS n_terms
        |FROM ft GROUP BY 1 ORDER BY dim""".stripMargin,

    "q115_inverted_index" ->
      s"""WITH t0 AS (
        |  SELECT doc_id,
        |    UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS term
        |  FROM documents),
        |t AS (SELECT DISTINCT doc_id, term FROM t0),
        |dfc AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
        |capped AS (
        |  SELECT term, doc_id FROM (
        |    SELECT term, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |    FROM t) WHERE rn <= $PostingCap),
        |p AS (
        |  SELECT term, STRING_AGG(doc_id, ',' ORDER BY doc_id) AS postings
        |  FROM capped GROUP BY term)
        |SELECT dfc.term, dfc.df, p.postings
        |FROM dfc JOIN p ON dfc.term = p.term
        |WHERE dfc.df >= $MinDf
        |ORDER BY dfc.term""".stripMargin,

    // q181: the greedy loop unrolled to K literal steps (the q150
    // pattern) — each step re-derives the uncovered set from x and the
    // accumulated covered CTE, so the oracle replays the exact argmax
    // sequence including ties (broken by doc_id).
    "q181_greedy_coverage" -> {
      val k = 5
      val steps = (2 to k).map { i =>
        val prevCov = if (i == 2) "" else s" UNION SELECT sh FROM c${i - 2}"
        s"""c${i - 1} AS MATERIALIZED (
          |  SELECT DISTINCT sh FROM x
          |  WHERE doc_id = (SELECT doc_id FROM g${i - 1})$prevCov),
          |u$i AS MATERIALIZED (
          |  SELECT x.doc_id, x.sh FROM x
          |  WHERE NOT EXISTS (SELECT 1 FROM c${i - 1} WHERE c${i - 1}.sh = x.sh)),
          |g$i AS (SELECT doc_id, COUNT(*) AS gain FROM u$i GROUP BY 1
          |  ORDER BY gain DESC, doc_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val rounds = (1 to k).map { i =>
        s"SELECT CAST($i AS BIGINT) AS round, doc_id, gain FROM g$i"
      }.mkString("\nUNION ALL ")
      s"""WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
        |  FROM documents),
        |s0 AS (
        |  SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))] AS shs
        |  FROM t),
        |x AS MATERIALIZED (SELECT DISTINCT doc_id, UNNEST(shs) AS sh FROM s0),
        |g1 AS (SELECT doc_id, COUNT(*) AS gain FROM x GROUP BY 1
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |$steps
        |$rounds
        |ORDER BY round""".stripMargin
    },

    // q183: the oracle counts 'fast merge' occurrences per doc through
    // the multiplicity-preserving bigram comprehension (same expansion
    // as q83's vocab bigrams) — position-join and bigram-count are the
    // same number by construction.
    "q183_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(LEN(LIST_FILTER(
        |      [toks[i] || ' ' || toks[i+1] FOR i IN RANGE(1, GREATEST(LEN(toks), 1))],
        |      x -> x = 'fast merge')) AS BIGINT) AS n_hits
        |  FROM t)
        |SELECT doc_id, n_hits FROM h WHERE n_hits > 0
        |ORDER BY doc_id""".stripMargin,

    "q171_source_overlap" ->
      """WITH t AS (
        |  SELECT source, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT source, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))] AS shs
        |  FROM t),
        |x AS (SELECT DISTINCT source, UNNEST(shs) AS sh FROM sh),
        |sz AS (SELECT source, COUNT(*) AS n FROM x GROUP BY 1),
        |i AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
        |  FROM x a JOIN x b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, inter,
        |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
        |FROM i
        |JOIN sz sa ON sa.source = src_a
        |JOIN sz sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,

    "q188_gopher_quality" -> {
      val stopCase = GopherStop.map(w =>
        s"(CASE WHEN CONTAINS(padded, ' $w ') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    ' ' || LOWER(TRIM(text)) || ' ' AS padded,
         |    STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks,
         |    LEN(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', '', 'g')) AS nc,
         |    LEN(text) - LEN(REGEXP_REPLACE(text, '[#…]', '', 'g')) AS ns
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(LEN(toks) AS BIGINT) AS n_words,
         |    CAST(nc AS BIGINT) AS n_chars,
         |    CAST(LEN(LIST_FILTER(toks, x -> REGEXP_MATCHES(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha,
         |    CAST(ns AS BIGINT) AS n_symbols,
         |    CAST($stopCase AS BIGINT) AS n_stop
         |  FROM t)
         |SELECT doc_id, n_words,
         |  n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
         |    AS wordcount_ok,
         |  n_chars >= n_words * 3 AND n_chars <= n_words * 10 AS meanlen_ok,
         |  n_stop >= 2 AS stopword_ok,
         |  n_alpha * 5 >= n_words * 4 AS alpha_ok,
         |  n_symbols * 10 <= n_words AS symbol_ok,
         |  (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords)
         |    AND (n_chars >= n_words * 3 AND n_chars <= n_words * 10)
         |    AND n_stop >= 2 AND n_alpha * 5 >= n_words * 4
         |    AND n_symbols * 10 <= n_words AS passes
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q189_dsir_select" ->
      s"""WITH db AS (
         |  SELECT doc_id, source,
         |    CAST(md5_number_lower(tok) % 281474976710656 % $DsirBuckets
         |      AS BIGINT) AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, source,
         |      UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS tok
         |    FROM documents)
         |  GROUP BY 1, 2, 3),
         |counts AS (
         |  SELECT b,
         |    CAST(SUM(CASE WHEN source = '$DsirTarget' THEN c ELSE 0 END)
         |      AS BIGINT) AS nt,
         |    CAST(SUM(CASE WHEN source <> '$DsirTarget' THEN c ELSE 0 END)
         |      AS BIGINT) AS nb
         |  FROM db GROUP BY 1),
         |tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS t_tot,
         |    CAST(SUM(nb) AS BIGINT) AS b_tot FROM counts),
         |lean AS (
         |  SELECT b, CASE WHEN nt * b_tot > nb * t_tot THEN 1
         |    WHEN nt * b_tot < nb * t_tot THEN -1 ELSE 0 END AS lean
         |  FROM counts CROSS JOIN tot)
         |SELECT db.doc_id,
         |  CAST(SUM(db.c * lean.lean) AS BIGINT) AS score,
         |  SUM(db.c * lean.lean) > 0 AS selected
         |FROM db JOIN lean ON db.b = lean.b
         |WHERE db.source <> '$DsirTarget'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same 90% stability gate (cleared), same position-ordered rebuild
    // via STRING_AGG ORDER BY pos, same (n_docs DESC, template) order.
    "q241_log_templates" ->
      """WITH t AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, i AS pos, toks[i+1] AS tok
        |  FROM t, UNNEST(RANGE(0, LEN(toks))) r(i)),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS nd FROM documents),
        |tpl AS (
        |  SELECT doc_id,
        |    STRING_AGG(CASE WHEN df * 10 >= nd * 9 THEN tok ELSE '<*>' END,
        |      ' ' ORDER BY pos) AS template
        |  FROM tok JOIN df USING (tok), nd GROUP BY doc_id)
        |SELECT template, COUNT(*) AS n_docs, MIN(doc_id) AS example_doc
        |FROM tpl GROUP BY 1 ORDER BY n_docs DESC, template LIMIT 20""".stripMargin,

    "q190_url_canonical" ->
"""WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.COM:443/Path' || CAST(doc_id % 5 AS VARCHAR)
        |      || '/?utm_source=x' || CAST(doc_id AS VARCHAR)
        |      || '&b=2&a=1#frag' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    LOWER(REGEXP_EXTRACT(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
        |    REGEXP_EXTRACT(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    REGEXP_EXTRACT(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' || REGEXP_REPLACE(hostport, ':443$', '')
        |      || CASE WHEN path = '' THEN '/' ELSE path END
        |      || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url
        |  FROM (SELECT *, ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
        |      STRING_SPLIT(query, '&'),
        |      x -> x <> '' AND NOT STARTS_WITH(x, 'utm_'))), '&') AS q2
        |    FROM parts))
        |SELECT doc_id, canonical_url,
        |  CAST(COUNT(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS n_dups,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) AS is_canonical
        |FROM canon ORDER BY doc_id""".stripMargin
  )
}
