package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packs in id order, splits straddlers, conserves tokens") {
    // budget 10: docs (1:4)(2:3)(3:6) → doc 3 straddles the first cut
    // at token 10 (starts at 7, ends at 13); (4:10) fills seq 1's tail
    // plus all of seq 2; (5:0) carries nothing and must vanish.
    val docs = Seq((1L, 4L), (2L, 3L), (3L, 6L), (4L, 10L), (5L, 0L))
      .toDF("doc_id", "tok")
    val out = Packing.packSequences(docs, "doc_id", col("tok"), 10L)
      .as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq(
      (0L, 1L, 4L), (0L, 2L, 3L), (0L, 3L, 3L),
      (1L, 3L, 3L), (1L, 4L, 7L),
      (2L, 4L, 3L)))
  }

  test("layout-independent: 1-partition and 7-partition inputs pack identically") {
    val docs = (1L to 300L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "tok")
    val a = Packing.packSequences(docs.coalesce(1), "doc_id", col("tok"), 64L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Packing.packSequences(docs.repartition(7), "doc_id", col("tok"), 64L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    // every sequence except the last is exactly full
    val perSeq = a.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val last = perSeq.keys.max
    assert(perSeq.filter(_._1 != last).values.forall(_ == 64L))
    assert(perSeq.values.sum == (1L to 300L).map(i => (i % 13) + 1).sum)
  }

  test("a doc bigger than the budget spans ceil(tok/budget) sequences") {
    val docs = Seq((1L, 25L)).toDF("doc_id", "tok")
    val out = Packing.packSequences(docs, "doc_id", col("tok"), 10L)
      .as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((0L, 1L, 10L), (1L, 1L, 10L), (2L, 1L, 5L)))
  }

  test("empty and all-zero inputs pack to an empty result, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "tok")
    assert(Packing.packSequences(empty, "doc_id", col("tok"), 10L).count() == 0L)
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "tok")
    assert(Packing.packSequences(zeros, "doc_id", col("tok"), 10L).count() == 0L)
  }

  test("chunking: stride windows cover every token, final chunk short") {
    // 10 tokens, chunk 4, stride 3 → starts 1,4,7,10; last chunk 1 tok
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .select("chunk_id", "start_tok", "n_tok")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(out == Seq((0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L), (3L, 10L, 1L)))
  }

  test("chunking: stride == chunk partitions exactly, hashes match text") {
    val docs = Seq((1L, "a b c d"), (2L, "c d")).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "doc_id", "text", 2, 2)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    // doc 1 → chunks "a b", "c d"; doc 2 → chunk "c d". No overlap,
    // full coverage; doc 1's second chunk and doc 2's chunk are the
    // same text so chunk-grain dedup must see equal hashes.
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((1L, 0L, 1L, 2L), (1L, 1L, 3L, 2L), (2L, 0L, 1L, 2L)))
    assert(out(1)._5 == out(2)._5)
    assert(out(0)._5 != out(1)._5)
  }

  test("chunking: empty text yields no chunks; bad stride rejected") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(Packing.chunkDocuments(docs, "doc_id", "text", 4, 2).count() == 0L)
    intercept[IllegalArgumentException] {
      Packing.chunkDocuments(docs, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkDocuments(docs, "doc_id", "text", 0, 1)
    }
  }

  test("chunkWastePlan: hand-computed pads, losses and ppm at two candidate lengths") {
    val docs = Seq(
      (1L, "a b c"),                                            // 3 tokens
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")),           // 10
      (3L, (1 to 17).map(i => s"u$i").mkString(" "))            // 17
    ).toDF("doc_id", "text")
    val got = Packing.chunkWastePlan(docs, "text", Seq(8, 16))
      .orderBy("max_len")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // L=8: examples 1+2+3=6, pad 5+6+7=18, waste 18e6/48=375000;
    //      lost 0+2+9=11 of 30 tokens -> 366666
    // L=16: examples 1+1+2=4, pad 13+6+15=34, waste 34e6/64=531250;
    //      lost 0+0+1=1 -> 33333
    assert(got == Seq(
      (8L, 3L, 30L, 6L, 18L, 375000L, 11L, 366666L),
      (16L, 3L, 30L, 4L, 34L, 531250L, 1L, 33333L)))
  }
}
