package graft

import graft.ops.TextDedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different words entirely here now"),
    (5L, "short")).toDF("doc_id", "text")

  test("exact dedup: one group, min id canonical") {
    val out = TextDedup.exactDupGroups(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("minhash LSH: exact dups estimated at 1.0; disjoint docs never pair") {
    val out = TextDedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash pairs: identical docs at hamming 0; under-threshold pairs absent") {
    val out = TextDedup.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 0L)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngram jaccard: exact dup = 1.0, near dup in (0,1), computed exactly") {
    val out = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    // doc1 vs doc3: 7 shingles each, 6 shared -> 6/(7+7-6) = 0.75
    assert(out((1L, 3L)) == 0.75)
    assert(!out.contains((1L, 4L)))
  }

  test("ngram jaccard: stop-shingle cap removes boilerplate-driven pairs") {
    val boiler = Seq(
      (1L, "alpha beta gamma copyright notice footer"),
      (2L, "delta epsilon zeta copyright notice footer"),
      (3L, "eta theta iota copyright notice footer"),
      (4L, "kappa lambda mu copyright notice footer"),
      (5L, "alpha beta gamma copyright notice footer"), // clone of 1
      (6L, "copyright notice footer"),                  // ONLY the boilerplate
      (7L, "copyright notice footer")                   // clone of 6
    ).toDF("doc_id", "text")
    // Uncapped: the ubiquitous trigram (df = 5 distinct texts) links
    // every doc to every other — the hot-key fan-out the cap exists for.
    val loose = TextDedup.ngramJaccardPairs(boiler, "doc_id", "text", threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose.contains((1L, 2L)))
    // Capped at df > 2: the boilerplate shingle is excluded in BOTH
    // intersections and sizes; only the true clone pair survives.
    val capped = TextDedup.ngramJaccardPairs(boiler, "doc_id", "text",
        threshold = 0.1, maxShingleDf = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.keySet == Set((1L, 5L)))
    assert(capped((1L, 5L)) == 1.0)
    // docs consisting ENTIRELY of stop-shingles have an empty reduced
    // set -> undefined jaccard -> no pairs at all, even within a clique
    assert(!capped.contains((6L, 7L)))
  }

  test("ngram jaccard: hash-colliding distinct texts are not merged into one clique") {
    import org.apache.spark.unsafe.types.UTF8String
    // Find two distinct texts with the same charHash (mod 1e9+7, so a
    // birthday search over ~hundreds of thousands of probes finds one).
    val seen = scala.collection.mutable.HashMap.empty[Long, Int]
    var pair: Option[(Int, Int)] = None
    var i = 0
    while (pair.isEmpty && i < 2000000) {
      val h = graft.functions.PolyHash.hash(
        UTF8String.fromString(s"collision probe token $i"))
      seen.get(h) match {
        case Some(j) => pair = Some((j, i))
        case None    => seen(h) = i; ()
      }
      i += 1
    }
    assert(pair.nonEmpty, "no charHash collision found in 2M probes")
    val (x, y) = pair.get
    val colliding = Seq(
      (1L, s"collision probe token $x"),
      (2L, s"collision probe token $y")).toDF("doc_id", "text")
    val out = TextDedup.ngramJaccardPairs(colliding, "doc_id", "text", threshold = 0.1)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // The two texts share only "collision probe token" (1 of 2+2-1=3
    // shingles): a hash-keyed representative would have merged them
    // into one clique and reported a false 1.0.
    assert(out((1L, 2L)) == 1.0 / 3)
  }

  test("deduped corpus keeps the min-id canonical per cluster, uniques pass through") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),  // exact clone of 1
      (7L, "alpha beta gamma delta epsilon zeta"),  // exact clone of 1
      (3L, "one two three four five six seven"),
      (4L, "totally unrelated content goes here now")).toDF("doc_id", "text")
    val kept = TextDedup.dedupedCorpus(docs, "doc_id", "text", 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"kept $kept")
  }

  test("block boilerplate: shared blocks cut, doc re-assembled in order") {
    // "a b c d e" is a full 5-token block shared by 3 docs → boilerplate
    // (df > 2); each doc keeps its unique tail; doc 4's single distinct
    // block survives untouched.
    val d = Seq(
      (1L, "a b c d e unique one tail"),
      (2L, "a b c d e unique two tail"),
      (3L, "a b c d e unique three tail"),
      (4L, "totally different text here now")).toDF("doc_id", "text")
    val out = TextDedup.blockBoilerplate(d, "doc_id", "text", 5, 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, "unique one tail"),
      (2L, 2L, 1L, "unique two tail"),
      (3L, 2L, 1L, "unique three tail"),
      (4L, 1L, 1L, "totally different text here now")))
  }

  test("block boilerplate: fully-boilerplate doc yields empty text, not a dropped row") {
    val d = Seq(
      (1L, "x y z w v"),
      (2L, "x y z w v"),
      (3L, "x y z w v"),
      (4L, "x y z w v keep this suffix run")).toDF("doc_id", "text")
    val out = TextDedup.blockBoilerplate(d, "doc_id", "text", 5, 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(out.take(3).forall(r => r._3 == 0L && r._4 == ""))
    assert(out(3) == ((4L, 2L, 1L, "keep this suffix run")))
  }
}
