package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook DP Levenshtein — the in-memory reference model. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("finds single-edit mutants (substitute, insert, delete)") {
    val base = "abcdefghijklmn" // 14 chars
    val docs = Seq(
      (1L, base),
      (2L, base.updated(5, 'X')), // substitution
      (3L, base.take(7) + "Q" + base.drop(7)), // insertion
      (4L, base.take(3) + base.drop(4)), // deletion
      (5L, "zyxwvutsrqponm") // unrelated
    ).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(docs, "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val expPairs = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
      d = lev(Seq(base, base.updated(5, 'X'), base.take(7) + "Q" + base.drop(7),
        base.take(3) + base.drop(4), "zyxwvutsrqponm")(a.toInt - 1),
        Seq(base, base.updated(5, 'X'), base.take(7) + "Q" + base.drop(7),
          base.take(3) + base.drop(4), "zyxwvutsrqponm")(b.toInt - 1))
      if d <= 2
    } yield (a, b, d.toLong)
    assert(got == expPairs.toSet)
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("strings below minLen are excluded from both sides") {
    val docs = Seq((1L, "short"), (2L, "short"), (3L, "longenoughstring"),
      (4L, "longenoughstrinX")).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(docs, "id", "s", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 4L, 1L)))
  }

  test("rejects parameterizations with empty segments") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(Seq((1L, "x")).toDF("id", "s"),
        "id", "s", maxDist = 10, minLen = 10)
    }
  }

  test("== brute-force model on random mutation-heavy corpora") {
    val rnd = new Random(20260814L)
    val alphabet = "abcde" // small: forces repeated grams + accidental matches
    (1 to 3).foreach { trial =>
      val bases = (0 until 25).map { _ =>
        (0 until (12 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(5))).mkString
      }
      val mutants = bases.zipWithIndex.collect {
        case (s, i) if i % 2 == 0 =>
          val p = rnd.nextInt(s.length)
          rnd.nextInt(3) match {
            case 0 => s.updated(p, alphabet(rnd.nextInt(5))) // sub
            case 1 => s.take(p) + alphabet(rnd.nextInt(5)) + s.drop(p) // ins
            case _ => s.take(p) + s.drop(p + 1) // del
          }
      }
      val all = (bases ++ mutants).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = all.toDF("id", "s")
      val got = FuzzyJoin.editDistanceJoin(df, "id", "s", maxDist = 2)
        .as[(Long, Long, Long)].collect().toSet
      val kept = all.filter(_._2.length >= 12)
      val model = (for {
        (ia, sa) <- kept; (ib, sb) <- kept
        if ia < ib
        d = lev(sa, sb)
        if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got == model, s"trial $trial: got ${got.size} vs model ${model.size}")
    }
  }

  test("sortedNeighborhoodPairs == rank-window model; layout-independent") {
    val rnd = new scala.util.Random(5150L)
    val rows = (1 to 120).map { i =>
      (i.toLong, s"k${rnd.nextInt(40)}%02d-${rnd.nextInt(10)}")
    }
    val df = rows.toDF("id", "s")
    def model(w: Int): Set[(Long, Long, Long)] = {
      val ranked = rows.sortBy { case (id, s) => (s, id) }.zipWithIndex
        .map { case ((id, _), r) => (id, r + 1L) }
      (for {
        (ia, ra) <- ranked; (ib, rb) <- ranked
        if rb > ra && rb <= ra + w
      } yield (ia, ib, rb - ra)).toSet
    }
    Seq(1, 4, 7).foreach { w =>
      val got = graft.ops.FuzzyJoin.sortedNeighborhoodPairs(
          df.repartition(9), "id", col("s"), w)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == model(w), s"winSize=$w")
    }
  }

  test("jaroWinkler: canonical vectors, fences, and the floored-transposition convention") {
    import graft.functions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Long =
      JaroWinkler.ppm(UTF8String.fromString(a), UTF8String.fromString(b))
    // Winkler's own census vectors (floored to ppm)
    assert(jw("martha", "marhta") == 961111L)
    assert(jw("dixon", "dicksonx") == 813333L)
    // jaro > 0.7 but zero common prefix: no boost
    assert(jw("crate", "trace") == 733333L)
    // the matching window excludes all of abc/bca (window 0)
    assert(jw("abc", "bca") == 0L)
    assert(jw("same", "same") == 1000000L)
    assert(jw("", "") == 1000000L)
    assert(jw("", "x") == 0L && jw("x", "") == 0L)
    // ODD transposition count: classic half-count would read 779924;
    // the floored count (DuckDB/rapidfuzz convention, what the q254
    // oracle computes) reads 800757 — pin the convention
    assert(jw("blue anvil", "large anvil") == 800757L)
    // loud raise past the 10k-char bound, fence passes
    val long = "a" * 10001
    intercept[Exception](jw(long, "a"))
    assert(jw("a" * 10000, "a" * 10000) == 1000000L)
  }

  test("jaroWinklerPairs: blocks bound candidates; threshold + lev columns hold") {
    val names = Seq(
      ("small ring", "small"), ("small rod", "small"), // jw 895555
      ("large ring", "large"), ("large rod", "large"),
      // high-JW pair in DIFFERENT blocks: must not pair
      ("alpha gamma", "alpha"), ("alphb gamma", "alphb"),
      ("zzz", "zzz")).toDF("name", "blk")
    val got = graft.ops.FuzzyJoin.jaroWinklerPairs(names, "name", "blk", 880000L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("large ring", "large rod", 895555L, 3L),
      ("small ring", "small rod", 895555L, 3L)))
    // sub-threshold pairs drop even inside a block
    val none = graft.ops.FuzzyJoin.jaroWinklerPairs(names, "name", "blk", 990000L)
    assert(none.count() == 0)
  }
}
