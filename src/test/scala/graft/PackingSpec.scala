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
}
