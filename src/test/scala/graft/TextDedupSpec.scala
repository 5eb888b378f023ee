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
}
