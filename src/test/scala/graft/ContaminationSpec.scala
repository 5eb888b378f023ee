package graft

import graft.ops.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("ngram overlap flags docs sharing any eval n-gram, counts distinct grams") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox"
      (2L, "totally unrelated text here"), // clean
      (3L, "a b")                          // too short for a trigram: absent
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "quick brown fox runs away")).toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(corpus, eval, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 3L, 1L, 1L))  // 3 trigrams, 1 hit, flagged
    assert(out(2L) == (2L, 2L, 0L, 0L)) // 4 tokens → 2 trigrams, clean
    assert(!out.contains(3L))
  }

  test("semantic overlap: nearest seed by cosine, flag at threshold, ties to lower id") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),  // identical to seed 1 → cos 1.0
      (11L, Array(0.0f, 1.0f, 0.0f)),  // identical to seed 2 → cos 1.0
      (12L, Array(1.0f, 1.0f, 0.0f))   // cos √2/2 ≈ .707 to both → seed 1 by tie
    ).toDF("vec_id", "embedding")
    val seeds = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Contamination.semanticOverlap(corpus, seeds, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._2 == 1L && out(10L)._4 == 1L)
    assert(out(11L)._2 == 2L && out(11L)._4 == 1L)
    assert(out(12L)._2 == 1L && out(12L)._4 == 0L) // tie → lower seed; below 0.9
    assert(math.abs(out(12L)._3 - math.sqrt(0.5)) < 1e-12)
  }

  test("semantic overlap: a zero-norm seed (NULL cosine) never wins the argmax") {
    // Under ANSI (the Spark 4 default) a zero-norm vector makes the
    // whole query throw at the division — loud either way. Under
    // non-ANSI sessions cosine silently becomes NULL, and the
    // struct-min argmax must sort it LAST (the window/oracle's
    // desc-NULLS-LAST), not first — that ordering is what this pins.
    val corpus = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val seeds = Seq(
      (1L, Array(0.0f, 0.0f)),  // degenerate: cosine NULL
      (2L, Array(1.0f, 0.0f))   // true nearest
    ).toDF("vec_id", "embedding")
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val out = Contamination.semanticOverlap(corpus, seeds, "vec_id", "embedding", 0.9)
        .as[(Long, Long, Double, Long)].collect()
      assert(out.toSeq == Seq((10L, 2L, 1.0, 1L)), out.toSeq.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
  }

  test("containmentPairs: full quote scores 1e6, partial overlap exact, threshold prunes") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),          // shingles: abc bcd cde def efg fgh (6)
      (2L, "x y z w v u")               // unrelated
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d e"),               // abc bcd cde — all 3 in doc 1 → 1e6
      (11L, "c d e q r s"),             // cde deq eqr qrs — 1 of 4 in doc 1 → 250000
      (12L, "p q r")                    // none anywhere → no row
    ).toDF("doc_id", "text")
    val got = Contamination.containmentPairs(corpus, eval, "doc_id", "text",
        shingleN = 3, minContainPpm = 0L, maxShingleDf = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 3L, 3L, 1000000L), (11L, 1L, 1L, 4L, 250000L)))
    // threshold prunes the partial pair
    val thr = Contamination.containmentPairs(corpus, eval, "doc_id", "text",
        shingleN = 3, minContainPpm = 800000L, maxShingleDf = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(thr == Set((10L, 1L, 3L, 3L, 1000000L)))
  }

  test("containmentPairs: stop-shingle cap drops ubiquitous shingles from the denominator") {
    // "s t u" appears in every corpus doc → df 3 > cap 2; eval doc 20's
    // only remaining shingle is "m n o", found in doc 3 → 1e6 over the
    // 1-element denominator
    val corpus = Seq(
      (1L, "s t u a a a"), (2L, "s t u b b b"), (3L, "s t u m n o")
    ).toDF("doc_id", "text")
    val eval = Seq((20L, "s t u"), (21L, "m n o")).toDF("doc_id", "text")
    val got = Contamination.containmentPairs(corpus, eval, "doc_id", "text",
        shingleN = 3, minContainPpm = 0L, maxShingleDf = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 20 has NO surviving shingles → absent entirely; doc 21 → doc 3
    assert(got == Set((21L, 3L, 1L, 1L, 1000000L)))
  }

  test("contaminationSpans: merged extents, clean docs absent, full-coverage eval member") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      // tokens 1-7; eval 5-gram "a b c d e" hits at pos 1 and the
      // overlapping window at pos 2 ("b c d e f") does NOT exist in
      // eval, so coverage = tokens 1..5 only
      (1L, "a b c d e x y"),
      (2L, "totally clean text with no overlap at all"),
      // the eval doc itself: every window hits -> full coverage
      (3L, "a b c d e f g")
    ).toDF("doc_id", "text")
    val eval_ = Seq((10L, "a b c d e f g")).toDF("doc_id", "text")
    val got = graft.ops.Contamination.contaminationSpans(
        corpus, eval_, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 7L, 1L, 5L, 5000000L / 7L),
      (3L, 7L, 3L, 7L, 1000000L)))
  }
}
