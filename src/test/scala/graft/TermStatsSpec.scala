package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFeatures
import graft.ops.TermStats

class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf top terms: rational smooth idf, deterministic tie ranks") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    val out = TermStats.tfidfTopTerms(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk")
      .as[(Long, String, Long, Double)].collect().toSeq
    // n=3; df: apple 1, banana 2, cherry 2; score = tf*(n+1)/(df+1)
    assert(out == Seq(
      (1L, "apple", 1L, 4.0),            // 2*4/2
      (1L, "banana", 2L, 4.0 / 3),       // 1*4/3
      (2L, "banana", 1L, 4.0 / 3),       // tie with cherry -> term asc
      (2L, "cherry", 2L, 4.0 / 3),
      (3L, "cherry", 1L, 4.0)))          // 3*4/3
  }

  test("bm25: term-bearing docs ranked, quantized totals layout-independent") {
    val docs = Seq(
      (1L, "join join join filler filler filler filler filler"), // tf=3, long doc
      (2L, "join vector"),                                       // two query terms, short
      (3L, "filler filler filler"),                              // no query term
      (4L, "vector")).toDF("doc_id", "text")
    val out = TermStats.bm25Rank(docs, "doc_id", "text", Seq("join", "vector"), topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = out.map(r => r._1 -> r._2).toMap
    assert(!byDoc.contains(3L), "doc without query terms must not rank")
    assert(out.map(_._3) == (1L to out.size), "ranks are dense from 1")
    // doc 2 hits both terms with minimal length: must beat the tf-heavy long doc
    assert(byDoc(2L) > byDoc(1L))
    // exact same quantized scores under different partitioning
    val out2 = TermStats.bm25Rank(docs.repartition(5), "doc_id", "text",
      Seq("join", "vector"), topK = 10).as[(Long, Long, Long)].collect().toSeq
    assert(out == out2)
  }

  test("stratified sample: per-stratum head under hash order, layout-independent") {
    val rows = (1 to 40).map(i => (i.toLong, s"doc number $i", if (i % 2 == 0) "en" else "es"))
    val docs = rows.toDF("doc_id", "text", "lang")
    val out = TermStats.stratifiedSample(docs, "lang", "doc_id",
        TextFeatures.charHash(col("text")), 5)
      .select("lang", "doc_id", "rnk")
      .as[(String, Long, Long)].collect().toSet
    assert(out.count(_._1 == "en") == 5 && out.count(_._1 == "es") == 5)
    assert(out.forall(_._3 <= 5))
    // identical sample no matter how the input is partitioned
    val out2 = TermStats.stratifiedSample(docs.repartition(7), "lang", "doc_id",
        TextFeatures.charHash(col("text")), 5)
      .select("lang", "doc_id", "rnk")
      .as[(String, Long, Long)].collect().toSet
    assert(out == out2)
    // a stratum smaller than perStratum is kept whole
    val tiny = TermStats.stratifiedSample(docs.filter(col("doc_id") <= 3), "lang",
        "doc_id", TextFeatures.charHash(col("text")), 5)
    assert(tiny.count() == 3)
  }

  test("inverted index: df band drops hapaxes and stop-terms, postings sorted") {
    val d = Seq(
      (3L, "alpha beta"),
      (1L, "alpha gamma stop"),
      (2L, "alpha stop stop"), // in-doc repeats count once (distinct)
      (4L, "hapax")).toDF("doc_id", "text")
    val out = TermStats.invertedIndex(d, "doc_id", "text", minDf = 2, maxDf = 2)
      .orderBy("term").as[(String, Long, String)].collect().toSeq
    // alpha df=3 > maxDf (stop-term analogue), beta/gamma/hapax df=1 < minDf
    assert(out == Seq(("stop", 2L, "1,2")))
  }

  test("bigram LM score: in-model text scores high, unseen bigrams score low") {
    // corpus: "a b" appears 3×, so after doc0's "a b a b" the model has
    // c(a→b) dominant; "a z" in doc2 is a 1-of-n continuation
    val d = Seq(
      (0L, "a b a b"),
      (1L, "a b"),
      (2L, "a z")).toDF("doc_id", "text")
    val out = TermStats.bigramLmScore(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // model: prefix 'a' occurs 4× (3× →b, 1× →z); prefix 'b' occurs 1× (→a)
    // doc0 bigrams: (a,b) p=3/4, (b,a) p=1/1, (a,b) p=3/4
    //   → (750000 + 1000000 + 750000) DIV 3 = 833333
    // doc1: (a,b) → 750000 ; doc2: (a,z) p=1/4 → 250000
    assert(out == Seq((0L, 3L, 833333L), (1L, 1L, 750000L), (2L, 1L, 250000L)))
    // layout-independence: same result from a different partitioning
    val out2 = TermStats.bigramLmScore(d.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == out2)
  }

  test("PMI collocations: exact ppm lift, (lift DESC, bigram ASC) ties") {
    // tokens: x,y,x,y,x,z → c(x)=3 c(y)=2 c(z)=1, U=6
    // bigrams: (x,y)×2 (y,x)×1 (x,z)×1 → N=4
    // lift(x y) = 2·36·10⁶ / (3·2·4) = 3_000_000
    // lift(x z) = 1·36·10⁶ / (3·1·4) = 3_000_000  (tie → bigram ASC)
    // lift(y x) = 1·36·10⁶ / (2·3·4) = 1_500_000
    val d = Seq((1L, "x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = TermStats.pmiCollocations(d, "doc_id", "text", minCount = 1, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("x y", 2L, 3000000L), ("x z", 1L, 3000000L), ("y x", 1L, 1500000L)))
  }

  test("PMI collocations: minCount prunes, topK truncates after the sort") {
    val d = Seq((1L, "x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val pruned = TermStats.pmiCollocations(d, "doc_id", "text", minCount = 2, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(pruned == Seq(("x y", 2L, 3000000L)))
    val topped = TermStats.pmiCollocations(d, "doc_id", "text", minCount = 1, topK = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(topped.map(_._1) == Seq("x y", "x z"))
  }

  test("vocabulary growth: new types credit the first doc, totals accumulate") {
    // doc 1: a b a   → 3 tok, 2 new (a, b)
    // doc 2: b c     → 2 tok, 1 new (c)
    // doc 3: (empty) → excluded
    // doc 4: a d d   → 3 tok, 1 new (d); no new tokens in doc 5
    val d = Seq((1L, "a b a"), (2L, "b c"), (3L, "  "), (4L, "a d d"),
      (5L, "c a")).toDF("doc_id", "text")
    val out = TermStats.vocabularyGrowth(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 3L, 2L),
      (2L, 2L, 1L, 5L, 3L),
      (4L, 3L, 1L, 8L, 4L),
      (5L, 2L, 0L, 10L, 4L)))
  }

  test("vocabulary growth is layout-independent") {
    val d = (1L to 200L).map(i => (i, s"w${i % 7} w${i % 31} w${i % 3}"))
      .toDF("doc_id", "text")
    val a = TermStats.vocabularyGrowth(d.coalesce(1), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b = TermStats.vocabularyGrowth(d.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    // the final vocab_size is the corpus's distinct-type count
    assert(a.last._5 == 31L)
    // running totals are monotone and consistent with the per-doc columns
    a.sliding(2).foreach { case Seq(p, n) =>
      assert(n._4 == p._4 + n._2 && n._5 == p._5 + n._3)
      case _ => ()
    }
  }

  test("zipfProfile: deterministic ranks, ties broken by token, topK enforced") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a d d d")).toDF("doc_id", "text")
    // counts: a=3, b=3, d=3, c=1 → rank order a, b, d, c
    val out = TermStats.zipfProfile(docs, "text", topK = 3)
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    assert(out == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("d", 3L, 3L)))
  }

  test("rrfFuse: exact integer contributions, union semantics, deterministic ties") {
    def c(r: Long) = 1000000L / (60L + r)
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rnk")
    val den = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rnk")
    val out = TermStats.rrfFuse(Seq(lex, den), "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 20 in both lists: c(2)+c(1); 10/30/40 single-list
    val expScore = Map(10L -> c(1), 20L -> (c(2) + c(1)), 30L -> c(3), 40L -> c(2))
    assert(out.map(r => r._1 -> r._2).toMap == expScore)
    assert(out.map(r => r._1 -> r._3).toMap ==
      Map(10L -> 1L, 20L -> 2L, 30L -> 1L, 40L -> 1L))
    // fused rank: 20 first (two contributions), then 10; 30 vs 40 tie
    // (both c=16129... no: c(3)=15873, c(2)=16129) → 40 above 30
    assert(out.sortBy(_._4).map(_._1) == Seq(20L, 10L, 40L, 30L))
    // topK truncates the fused list, not the inputs
    val top2 = TermStats.rrfFuse(Seq(lex, den), "doc_id", topK = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(top2.sortBy(_._4).map(_._1) == Seq(20L, 10L))
    // equal-score tie breaks by ascending id
    val t1 = Seq((5L, 1L), (3L, 1L)).toDF("doc_id", "rnk")
    val tied = TermStats.rrfFuse(Seq(t1.filter(col("doc_id") === 5),
        t1.filter(col("doc_id") === 3)), "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(tied.map(_._1) == Seq(3L, 5L))
  }

  test("ngramNovelty: shared grams score low, unique docs score 1e6") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // shares all grams with doc 2
      (2L, "alpha beta gamma delta"),
      (3L, "wholly original text here"), // all grams unique
      (4L, "two toks") // < 3 tokens: absent
    ).toDF("doc_id", "text")
    val out = TermStats.ngramNovelty(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(4L))
    assert(out(1L) == ((1L, 2L, 0L, 0L)))
    assert(out(2L) == ((2L, 2L, 0L, 0L)))
    assert(out(3L) == ((3L, 2L, 2L, 1000000L)))
  }

  test("phraseMatch: token semantics, counts, 1-based first position") {
    val docs = Seq(
      (1L, "the sort merge join wins"),         // one match at pos 2
      (2L, "sort merge then sort merge again"), // two matches, first at 1
      (3L, "resort merged is not sort nor merge here"), // no consecutive pair
      (4L, "merge sort is the reverse"),        // reversed: no match
      (5L, "sort")                              // shorter than the phrase
    ).toDF("doc_id", "text")
    val out = TermStats.phraseMatch(docs, "doc_id", "text", Seq("sort", "merge"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((1L, 2L)), 2L -> ((2L, 1L))))
  }

  test("phraseMatch: overlapping occurrences all count") {
    // "a a a a" with phrase "a a": starts at 1, 2, 3
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val out = TermStats.phraseMatch(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L)))
  }

  test("allPairsCosine: exact cosine over the gated vocabulary, boundary inclusive") {
    val docs = Seq(
      (1L, "a b c"), // identical to 2 → cosine exactly 1
      (2L, "a b c"),
      (3L, "a b x")  // x has df=1 → gated out; cos(1,3) = 2/√6 ≈ 0.8165
    ).toDF("doc_id", "text")
    val at800 = graft.ops.TermStats.allPairsCosine(docs, "doc_id", "text", 800, 100)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(at800 == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val at900 = graft.ops.TermStats.allPairsCosine(docs, "doc_id", "text", 900, 100)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(at900 == Set((1L, 2L))) // 0.8165 < 0.9: truncation pair gone
    // dot/norms are over the GATED space: doc 3's x never contributes
    val full = graft.ops.TermStats.allPairsCosine(docs, "doc_id", "text", 800, 100)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(full((1L, 3L)) == ((2L, 3L, 2L)))
  }

  test("allPairsCosine: maxDf stop cut removes ubiquitous terms from the space") {
    // "the" appears in all 4 docs; with maxDf=3 it is a stop term, so
    // docs sharing ONLY "the" have no gated overlap and emit no pair.
    val docs = Seq(
      (1L, "the p q"), (2L, "the p q"), (3L, "the z1 z2"), (4L, "the z3 z4")
    ).toDF("doc_id", "text")
    val pairs = graft.ops.TermStats.allPairsCosine(docs, "doc_id", "text", 100, 3)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("phraseMatch matches a brute-force sliding scan") {
    val rnd = new scala.util.Random(114L)
    val vocab = Seq("x", "y", "z", "w")
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(4))).mkString(" "))
    }
    val phrase = Seq("x", "y", "x")
    val got = TermStats.phraseMatch(rows.toDF("doc_id", "text"), "doc_id",
        "text", phrase)
      .as[(Long, Long, Long)].collect().toSet
    val model = rows.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      val starts = toks.sliding(phrase.size).zipWithIndex
        .collect { case (w, i) if w == phrase => i + 1L }.toSeq
      if (starts.nonEmpty) Some((id, starts.size.toLong, starts.min)) else None
    }.toSet
    assert(got == model)
  }

  test("tokenRankScore: ranks by (count desc, token asc); layout-independent") {
    // corpus counts: a=3, b=2, c=1 -> ranks a=1, b=2, c=3
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TermStats.tokenRankScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1: ranks 1,1,2 -> sum 4, mean 1; doc 2: 1,2,3 -> sum 6, mean 2
    assert(out == Map(1L -> ((3L, 4L, 1L)), 2L -> ((3L, 6L, 2L))))
    // count ties rank by token asc: "x y" -> x=1, y=2
    val tie = Seq((1L, "x y")).toDF("doc_id", "text")
    val t = TermStats.tokenRankScore(tie, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().head
    assert(t == ((1L, 2L, 3L, 1L)))
    // layout independence of the distributed rank
    val big = (1 to 50).map(i => (i.toLong, s"w${i % 7} w${i % 3} shared"))
      .toDF("doc_id", "text")
    val a = TermStats.tokenRankScore(big.repartition(3), "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, Long, Long, Long)].collect().toSeq
    val b = TermStats.tokenRankScore(big.repartition(17), "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("domainMarkersPpm: brute-force phi2, signs point at the right domain") {
    val rnd = new scala.util.Random(97)
    val docs = (1 to 80).map { i =>
      val isT = i % 2 == 0
      val marker = if (isT) "alpha" else "beta"
      val body = (0 until 6).map(_ => s"common${rnd.nextInt(5)}").mkString(" ")
      (s"$marker $body", isT)
    }.toDF("text", "is_t")
    val got = TermStats.domainMarkersPpm(docs, "text", "is_t",
        minCount = 3, topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    def brute: Map[String, (Long, Long, Long)] = {
      val occ = docs.as[(String, Boolean)].collect().toSeq.flatMap { case (t, it) =>
        t.split(" ").filter(_.nonEmpty).map(w => (w, it)) }
      val tt = occ.count(_._2).toLong; val tr = occ.count(!_._2).toLong
      occ.groupBy(_._1).map { case (w, os) =>
        val a = os.count(_._2).toLong; val b = os.count(!_._2).toLong
        val num = BigInt(a) * (tr - b) - BigInt(b) * (tt - a)
        val den = BigInt(a + b) * ((tt - a) + (tr - b)) * tt * tr
        val ppm = if (den == 0) BigInt(0)
          else if (num >= 0) num * num * 1000000 / den
          else -((-num) * (-num) * 1000000 / den)
        w -> ((a, b, ppm.toLong))
      }.filter { case (_, (a, b, _)) => a + b >= 3 }
    }
    val exp = brute
    got.foreach { case (w, a, b, ppm) =>
      assert(exp(w) == ((a, b, ppm)), w) }
    // ranking: top-10 by |phi2| desc matches the model's order prefix
    val order = exp.toSeq.sortBy { case (w, (_, _, p)) => (-math.abs(p), w) }
      .take(10).map(_._1)
    assert(got.map(_._1) == order)
    // the planted markers rank top-2 with the right signs (phi2 is an
    // occurrence-level effect size: a 1-token-in-7 marker caps well
    // below 1e6 — significance is in the ORDER, not the magnitude)
    val byW = got.map(r => r._1 -> r._4).toMap
    assert(got.take(2).map(_._1).toSet == Set("alpha", "beta"))
    assert(byW("alpha") > 0L && byW("beta") < 0L)
  }

  test("tailVocabRatePpm: head cut by (count desc, token asc), per-source tail shares") {
    // corpus counts: a=4, b=3, c=2, z=1 -> top-2 head = {a, b}
    val docs = Seq(
      (1L, "a a b c", "s1"), (2L, "a b z", "s1"), (3L, "a b c", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TermStats.tailVocabRatePpm(docs, "source", "text", 2L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // s1: 7 occurrences, tail = c + z = 2 -> 285714 ppm
    assert(out("s1") == (("s1", 7L, 2L, 285714L)))
    // s2: 3 occurrences, tail = c -> 333333 ppm
    assert(out("s2") == (("s2", 3L, 1L, 333333L)))
    // count ties at the K boundary break by token asc: counts all 1,
    // K=1 keeps only "x"
    val tie = Seq((1L, "x y", "s")).toDF("doc_id", "text", "source")
    val t = TermStats.tailVocabRatePpm(tie, "source", "text", 1L)
      .as[(String, Long, Long, Long)].collect().head
    assert(t == (("s", 2L, 1L, 500000L)))
    // layout independence
    val big = (1 to 60).map(i => (i.toLong, s"w${i % 13} w${i % 5} k", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = TermStats.tailVocabRatePpm(big.repartition(3), "source", "text", 5L)
      .orderBy(col("source")).as[(String, Long, Long, Long)].collect().toSeq
    val b = TermStats.tailVocabRatePpm(big.repartition(17), "source", "text", 5L)
      .orderBy(col("source")).as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("domainRelevancePpm: rate-difference weights, sign-split mean, empty-target guard") {
    val docs = Seq((1L, "a a b", true), (2L, "a c", false))
      .toDF("doc_id", "text", "is_t")
    val out = TermStats.domainRelevancePpm(docs, "doc_id", "text", "is_t")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // target occs: a=2 b=1 (tt=3); ref: a=3 b=1 c=1 (tr=5)
    // w_a = 2e6 DIV 3 - 3e6 DIV 5 = 666666-600000 = 66666
    // w_b = 1e6 DIV 3 - 1e6 DIV 5 = 333333-200000 = 133333
    // w_c = 0 - 200000 = -200000
    // doc1: (2*66666 + 133333) DIV 3 = 266665 DIV 3 = 88888
    // doc2: 66666 - 200000 = -133334 -> -(133334 DIV 2) = -66667
    assert(out == Map(1L -> ((3L, 88888L)), 2L -> ((2L, -66667L))))
    // layout independence (map-side combine + AQE join strategy only)
    val big = (1 to 60).map(i =>
      (i.toLong, s"w${i % 11} w${i % 5} shared tail${i % 2}", i % 3 == 0))
      .toDF("doc_id", "text", "is_t")
    val r1 = TermStats.domainRelevancePpm(big.repartition(3), "doc_id", "text", "is_t")
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq
    val r2 = TermStats.domainRelevancePpm(big.repartition(19), "doc_id", "text", "is_t")
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq
    assert(r1 == r2)
    // an empty target slice must fail loudly, not return silent zeros
    val noT = Seq((1L, "a b", false)).toDF("doc_id", "text", "is_t")
    val ex = intercept[Exception] {
      TermStats.domainRelevancePpm(noT, "doc_id", "text", "is_t").collect()
    }
    assert(ex.getMessage.contains("empty target slice") ||
      Option(ex.getCause).exists(_.getMessage.contains("empty target slice")))
  }

  test("burstinessPpm: concentrated token reads 3e6, uniform token reads 0") {
    val docs = Seq(
      (1L, "a b b b b"), (2L, "a"), (3L, "a"), (4L, "a")
    ).toDF("doc_id", "text")
    val got = TermStats.burstinessPpm(docs, "doc_id", "text",
        minTotal = 1L, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // b: 4 occurrences in 1 of 4 docs -> VMR (4*16-16)/(4*4) = 3 -> 3e6
    // a: 1 occurrence in each doc -> variance 0 -> 0
    assert(got == Seq(("b", 1L, 4L, 3000000L), ("a", 4L, 4L, 0L)))
    // minTotal prunes below-threshold tokens before ranking
    val pruned = TermStats.burstinessPpm(docs, "doc_id", "text",
        minTotal = 5L, k = 10).count()
    assert(pruned == 0L)
  }

  test("repeatRuns: longest consecutive run, tie to smaller token, layout-independent") {
    val docs = Seq(
      (1L, "a a a b b c"),      // run of 3 'a'
      (2L, "x x y y z"),        // tie 2/2 -> 'x'
      (3L, "solo"),             // single token
      (4L, "p q p q p q")       // no run beyond 1 -> smallest token 'p'
    ).toDF("doc_id", "text")
    val exp = Seq(
      (1L, 6L, 3L, "a"), (2L, 5L, 2L, "x"),
      (3L, 1L, 1L, "solo"), (4L, 6L, 1L, "p"))
    val got = TermStats.repeatRuns(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == exp)
    val again = TermStats.repeatRuns(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(again == exp)
  }

  test("rboPpm: identical rankings read (1-p^D), disjoint read 0, model parity") {
    def ranking(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (id, i.toLong + 1) }
        .toDF("doc_id", "rnk")
    val a = ranking(Seq(10L, 20L, 30L, 40L, 50L))
    // identical rankings: every depth agrees fully ->
    // rbo = (1-p) * sum p^(d-1) (truncating folds, mirrored here)
    val D = 5; val p = 500000L; val M = 1000000L
    def pow(e: Int) = (0 until e).foldLeft(M)((acc, _) => acc * p / M)
    val expIdent = ((1 to D).map(d => pow(d - 1) * M / M).sum) * (M - p) / M
    val gotIdent = TermStats.rboPpm(a, ranking(Seq(10L, 20L, 30L, 40L, 50L)),
        "doc_id", D, p).as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotIdent == (5L, 500000L, 5L, 1000000L, expIdent))
    // disjoint rankings: no shared ids -> all zero
    val gotDisj = TermStats.rboPpm(a, ranking(Seq(91L, 92L, 93L)),
        "doc_id", D, p).as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotDisj == (5L, 500000L, 0L, 0L, 0L))
    // partial: brute-force the truncating spelling
    val b = ranking(Seq(30L, 10L, 99L, 40L, 98L))
    val ranksA = Map(10L -> 1L, 20L -> 2L, 30L -> 3L, 40L -> 4L, 50L -> 5L)
    val ranksB = Map(30L -> 1L, 10L -> 2L, 99L -> 3L, 40L -> 4L, 98L -> 5L)
    val ms = ranksA.keySet.intersect(ranksB.keySet).toSeq
      .map(id => math.max(ranksA(id), ranksB(id))).filter(_ <= D)
    val terms = (1 to D).map { d =>
      val ov = ms.count(_ <= d)
      pow(d - 1) * (ov * M / d) / M
    }
    val expPart = terms.sum * (M - p) / M
    val gotPart = TermStats.rboPpm(a, b, "doc_id", D, p)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotPart._5 == expPart)
  }

  test("charGramConcentration: stamped high, uniform low, short docs absent") {
    val docs = Seq(
      (1L, "aaaa"),   // bigrams aa,aa,aa: one gram owns everything
      (2L, "abcd"),   // bigrams ab,bc,cd all distinct: minimal Simpson
      (3L, "a"))      // below the gram width -> absent
      .toDF("doc_id", "text")
    val out = TermStats.charGramConcentration(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, 1000000L, 333333L)))
    assert(out(2L) == ((2L, 3L, 3L, 333333L, 1000000L)))
    assert(!out.contains(3L))
    // invariants on a mixed doc: Simpson in [1/d, 1] scaled, counts add up
    val m = TermStats.charGramConcentration(
        Seq((9L, "abab xyxy abab")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(m._2 == 12L && m._3 >= 1L && m._3 <= m._2)
    assert(m._4 >= 1000000L / m._3 && m._4 <= 1000000L)
  }
}
