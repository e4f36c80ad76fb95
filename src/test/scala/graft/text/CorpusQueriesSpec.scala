package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- decontamination -----------------------------------------------

  private val evalText = "alpha beta gamma delta epsilon zeta eta theta"
  private def contamDocs = Seq(
    (1L, evalText, true), // the eval doc
    // full copy of the eval doc leaked into train: 6 shared trigrams
    (2L, evalText, false),
    // partial overlap: shares exactly the 3 trigrams of the first 5 words
    (3L, "alpha beta gamma delta epsilon omega psi chi phi", false),
    // disjoint
    (4L, "one two three four five six seven eight nine ten", false)
  ).toDF("doc_id", "text", "is_eval")

  test("contamination ledger: counts shared distinct n-grams, flags at threshold") {
    val led = CorpusQueries.contaminationLedger(
        contamDocs, col("doc_id"), col("text"), col("is_eval"),
        n = 3, threshold = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(led.keySet == Set(2L, 3L, 4L)) // eval docs excluded from the ledger
    assert(led(2L) == ((6L, true)))       // 8 tokens -> 6 trigrams, all shared
    assert(led(3L) == ((3L, false)))      // below threshold
    assert(led(4L) == ((0L, false)))
  }

  test("contamination ledger: duplicate shingles within one doc count once") {
    val docs = Seq(
      (1L, "a b c x y z", true),
      (2L, "a b c q a b c q a b c", false) // 'a b c' appears 3 times
    ).toDF("doc_id", "text", "is_eval")
    val led = CorpusQueries.contaminationLedger(
        docs, col("doc_id"), col("text"), col("is_eval"), n = 3, threshold = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(led(2L) == 1L) // distinct overlap, not occurrence count
  }

  // --- PII scrub ------------------------------------------------------

  test("pii scrub: emails and phones redacted, counts match") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail-host.org or +1-555-010-7788 today"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.co and c.d@e-f.io; short plus +12 stays")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        CorpusQueries.scrubPii(col("text")).as("s"),
        CorpusQueries.emailCount(col("text")).as("ne"),
        CorpusQueries.phoneCount(col("text")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("reach me at <EMAIL> or <PHONE> today", 1L, 1L)))
    assert(out(2L) == (("no pii here at all", 0L, 0L)))
    // '+12' is too short for the phone pattern; both emails redacted
    assert(out(3L) == (("two mails: <EMAIL> and <EMAIL>; short plus +12 stays", 2L, 0L)))
  }

  // --- repetition -----------------------------------------------------

  test("repetition: duplicated trigrams raise the ratio; short docs score 0") {
    val df = Seq(
      (1L, "a b c a b c a b c"),   // 7 trigrams, 3 distinct
      (2L, "p q r s t u v w"),     // 6 trigrams, all distinct
      (3L, "just two")             // below shingle width
    ).toDF("doc_id", "text")
    val out = CorpusQueries.repetitionScores(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((7L, 3L, 4.0 / 7.0)))
    assert(out(2L) == ((6L, 6L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  // --- exact-moment statistics (q82's formula) ------------------------

  test("exact-moment corr matches a direct computation") {
    // y = 2x + noise-free affine => corr exactly 1.0 from exact moments
    val df = (1 to 100).map(i => (i.toLong, 2L * i + 5)).toDF("x", "y")
    val m = df.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy")).head()
    val Seq(n, sx, sy, sxx, syy, sxy) = (0 until 6).map(m.getLong(_).toDouble)
    val corr = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(corr - 1.0) < 1e-12)
    // sample stddev of 1..100 is sqrt(sum((i-mean)^2)/99) = sqrt(841.666..)
    val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
    assert(math.abs(sd - 29.011491975882016) < 1e-9)
  }

  // --- inverted index (q115) -----------------------------------------

  test("inverted index: df counts all docs, postings sorted and capped") {
    val docs = Seq(
      (3L, "apple banana"),
      (1L, "apple cherry"),
      (2L, "apple banana cherry cherry")
    ).toDF("doc_id", "text")
    val idx = CorpusQueries.invertedIndex(docs, minDf = 2, postingCap = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // df = 3 for apple but postings capped to the 2 LOWEST doc ids
    assert(idx("apple") == ((3L, "1,2")))
    assert(idx("banana") == ((2L, "2,3")))
    // within-doc repeats dedup before df; below-minDf terms drop out...
    assert(idx("cherry") == ((2L, "1,2")))
    assert(idx.keySet == Set("apple", "banana", "cherry"))
  }

  test("inverted index: salted two-stage cap ≡ unsalted on a hot term") {
    // 'hot' appears in 200 docs with a cap of 7 — the cap genuinely
    // bites, and doc ids are shuffled so salt buckets are non-trivial.
    // 'cool' has df 6 < cap (cap never bites); 'rare' has df 2 < minDf.
    val rnd = new scala.util.Random(42)
    val hotIds = rnd.shuffle((1L to 200L).toList)
    val docs = (
      hotIds.map(id => (id, s"hot filler$id")) ++
      (201L to 206L).map(id => (id, "cool stuff")) ++
      Seq((207L, "rare gem"), (208L, "rare gem"))
    ).toDF("doc_id", "text")
    val salted = CorpusQueries.invertedIndex(docs, minDf = 3, postingCap = 7,
        saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val unsalted = CorpusQueries.invertedIndex(docs, minDf = 3, postingCap = 7,
        saltBuckets = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(salted.toSeq == unsalted.toSeq)
    val byTerm = salted.map(t => t._1 -> ((t._2, t._3))).toMap
    // the capped posting list is the 7 LOWEST doc ids; df counts all 200
    assert(byTerm("hot") == ((200L, (1L to 7L).mkString(","))))
    assert(byTerm("cool") == ((6L, (201L to 206L).mkString(","))))
    assert(!byTerm.contains("rare"))
  }

  // --- TF-IDF keyword extraction (q99) -------------------------------

  test("tfidf: rarer terms outrank common ones, ranks are 1..k per doc") {
    val got = CorpusQueries.queries("q99_tfidf_terms")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._6)
      // ranks are exactly 1..n (n <= 3), scores non-increasing along them
      assert(sorted.map(_._6).toSeq == (1L to sorted.length).toSeq, s"doc $doc ranks")
      val scores = sorted.map(_._5)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $doc scores")
      // score really is tf * N / df for the emitted tf/df
      val n = byDoc.size.toDouble
      sorted.foreach { case (_, _, tf, df, score, _) =>
        assert(math.abs(score - tf.toDouble * n / df.toDouble) < 1e-9)
      }
    }
  }

  // --- Gopher quality rules (q188) -----------------------------------

  test("gopher flags: each rule fails on its crafted violator and only there") {
    val good = "the quick brown fox and the lazy dog walk home with great joy"
    val docs = Seq(
      (1L, good),                                        // passes all
      (2L, "the and"),                                   // too few words
      (3L, "a a a a a a a a a a the and"),               // mean word len < 3
      (4L, ("the and " + Seq.fill(10)("pneumonoultramicroscopics").mkString(" "))),
      // ^ mean word len > 10
      (5L, "1 2 3 4 5 6 7 8 9 0 11 22 the and"),         // <80% alphabetic
      (6L, good + " # # #"),                             // symbol ratio > 0.1
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
      // ^ zero stopwords
    ).toDF("doc_id", "text")
    val got = CorpusQueries.gopherFlags(docs, col("doc_id"), col("text"),
        minWords = 10L, maxWords = 1000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))))
      .toMap
    // (wordcount, meanlen, stopword, alpha, symbol, passes)
    assert(got(1L) == ((true, true, true, true, true, true)))
    assert(got(2L)._1 == false && got(2L)._6 == false)
    assert(got(3L)._2 == false && got(3L)._6 == false)
    assert(got(4L)._2 == false && got(4L)._6 == false)
    assert(got(5L)._4 == false && got(5L)._6 == false)
    assert(got(6L)._5 == false && got(6L)._6 == false)
    assert(got(7L)._3 == false && got(7L)._6 == false)
  }

  // --- DSIR importance selection (q189) ------------------------------

  test("dsir: background docs sharing target vocab are selected, others not") {
    // target slice speaks 'alpha beta gamma'; background doc 10 copies it,
    // doc 11 speaks disjoint vocab. With every token count symmetric, the
    // leaning sign is exactly vocabulary membership.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta gamma", true),
      (2L, "alpha beta gamma alpha beta gamma", true),
      (10L, "alpha beta gamma alpha beta gamma", false),
      (11L, "omega psi chi omega psi chi", false)
    ).toDF("doc_id", "text", "is_t")
    val got = CorpusQueries.dsirSelect(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 256L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got.keySet == Set(10L, 11L)) // target docs are not scored
    assert(got(10L)._1 > 0 && got(10L)._2)   // target-leaning vocab
    assert(got(11L)._1 < 0 && !got(11L)._2)  // background-only vocab
  }

  test("dsir: a tied bucket contributes zero") {
    // 'tie' appears equally (per corpus share) in target and background
    // when totals are equal — sign is 0, so a doc of only ties scores 0.
    val docs = Seq(
      (1L, "tie tie tie", true),
      (10L, "tie tie tie", false)
    ).toDF("doc_id", "text", "is_t")
    val got = CorpusQueries.dsirSelect(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 256L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 0L)
  }

  // --- URL canonicalization (q190) -----------------------------------

  test("url canonicalize: port, params, fragment, case, empty path") {
    val urls = Seq(
      (1L, "HTTPS://Host.COM:443"),                    // empty path -> '/'
      (2L, "https://host.com/a?utm_source=x&utm_b=y"), // all params tracking
      (3L, "http://HOST.com/A/B?z=1&a=2#frag"),        // sort, drop fragment
      (4L, "https://host.com:8443/x?b=1&a=1")          // non-default port kept
    ).toDF("id", "u")
    val got = urls
      .select(col("id"), CorpusQueries.urlCanonicalize(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "https://host.com/")
    assert(got(2L) == "https://host.com/a") // no dangling '?'
    assert(got(3L) == "http://host.com/A/B?a=2&z=1") // path case preserved
    assert(got(4L) == "https://host.com:8443/x?a=1&b=1")
  }
}
