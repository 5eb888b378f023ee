package graft

import scala.util.Random

import graft.ops.BpeTrainer

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference BPE: same tie-break, same greedy-leftmost
    * fold, plain Scala collections. */
  private def model(tokens: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var words = tokens.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, n) => (w.map(_.toString).toVector, n) }.toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, l, rr, f))
        words = words.map { case (syms, n) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == l && s == rr)
              acc(acc.length - 1) = l + rr
            else acc += s
          }
          (acc.toVector, n)
        }
        r += 1
      }
    }
    out.toSeq
  }

  test("merge table == in-memory BPE on the classic greedy case") {
    // "aaab" x3, "ab" x2: round 1 merges (a,a) — and greedy-leftmost
    // turns "a a a b" into [aa, a, b], NOT [a, aa, b]
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = BpeTrainer.trainMerges(docs, "text", 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = model(Seq("aaab", "aaab", "aaab", "ab", "ab"), 3)
    assert(got == want, s"got $got want $want")
    assert(got.head._2 == "a" && got.head._3 == "a" && got.head._4 == 6L)
  }

  test("merge table == in-memory BPE on random corpora, any layout") {
    val rnd = new Random(11L)
    (1 to 3).foreach { trial =>
      val alphabet = "abcd"
      val tokens = (1 to 300).map(_ =>
        (1 to (rnd.nextInt(6) + 2)).map(_ => alphabet(rnd.nextInt(4))).mkString)
      val docs = tokens.grouped(30).zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val got = BpeTrainer.trainMerges(docs.repartition(7), "text", 4)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      val want = model(tokens, 4)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("applyMerges segments with trained merges in order, layout-independent") {
    val docs = Seq((1L, "aaab aaab aaab ab ab abc")).toDF("doc_id", "text")
    val table = BpeTrainer.trainMerges(docs, "text", 2)
      .orderBy("rnk").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    val seg = BpeTrainer.applyMerges(docs.repartition(3), "text", table)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // merge 1 = (a,a) f=7... then round 2 over merged words; whatever
    // the table, apply must equal the training run's own end state:
    // replay the model
    val m = model(Seq("aaab", "aaab", "aaab", "ab", "ab", "abc"), 2)
    assert(table == m.map(t => (t._2, t._3)))
    // greedy fold: "aaab" under (a,a) then next merge
    var words = Seq("aaab", "aaab", "aaab", "ab", "ab", "abc")
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => (w.map(_.toString).toVector, n, w) }.toVector
    m.foreach { case (_, l, r, _) =>
      words = words.map { case (syms, n, w) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (acc.nonEmpty && acc.last == l && s == r) acc(acc.length - 1) = l + r
          else acc += s
        }
        (acc.toVector, n, w)
      }
    }
    words.foreach { case (syms, n, w) =>
      assert(seg(w) == ((w, n, syms.size.toLong, syms.mkString(" "))), s"word $w")
    }
  }

  test("batched merge rounds == sequential one-merge-per-job path") {
    // the batched-acceptance rule must be EXACT, not heuristic: any
    // batchK yields the same merge table as batchK = 1 (and both equal
    // the in-memory reference)
    val rnd = new Random(43L)
    val alphabet = "abcdefgh"
    val tokens = (1 to 500).map(_ =>
      (1 to (rnd.nextInt(7) + 2)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = tokens.grouped(40).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val sequential = BpeTrainer.trainMerges(docs, "text", 24, batchK = 1)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(sequential == model(tokens, 24))
    Seq(4, 16, 64).foreach { k =>
      val batched = BpeTrainer.trainMerges(docs, "text", 24, batchK = k)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(batched == sequential, s"batchK=$k diverged from sequential")
    }
  }

  test("training stops early when no pair remains") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text") // all 1-char words
    val got = BpeTrainer.trainMerges(docs, "text", 5).collect()
    assert(got.isEmpty)
  }

  test("fitHistogram: occurrence-weighted pieces-per-word distribution") {
    // merges: (a,b) then (ab,c) -> "abc" segments to 1 piece,
    // "abd" to 2 (ab,d), "xy" to 2 (x,y)
    val docs = Seq((1L, "abc abc abd"), (2L, "xy abc")).toDF("doc_id", "text")
    val got = graft.ops.BpeTrainer.fitHistogram(docs, "text",
        Seq(("a", "b"), ("ab", "c")))
      .orderBy("n_pieces").as[(Long, Long, Long)].collect().toSeq
    // n_pieces 1: abc (3 occurrences); n_pieces 2: abd, xy (1 each)
    assert(got == Seq((1L, 1L, 3L), (2L, 2L, 2L)))
  }
}
