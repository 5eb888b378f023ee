package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive inequality-join semantics") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 20L, ts("2024-01-01 10:30:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),   // boundary: included (>=)
      (10L, ts("2024-01-01 10:29:59"), 2.0),   // inside window 1
      (10L, ts("2024-01-01 10:30:00"), 4.0),   // exactly l.ts + w: EXCLUDED
      (10L, ts("2024-01-01 11:10:00"), 8.0),   // inside window 2
      (20L, ts("2024-01-01 10:31:00"), 16.0),  // other key, inside 3
      (20L, ts("2024-01-01 09:59:00"), 32.0),  // before window 3
      (40L, ts("2024-01-01 10:00:00"), 64.0)   // key with no left rows
    ).toDF("key", "t", "v")
    val out = RangeJoin.countInWindow(left, right, "id", "key", "t", "v", 1800L)
      .select("id", "n_in_window", "sum_in_window")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 3.0)))  // rows at 10:00:00 and 10:29:59
    assert(out(2L) == ((1L, 8.0)))
    assert(out(3L) == ((1L, 16.0)))
    assert(out(4L) == ((0L, 0.0))) // no matches: zero-filled, row kept
    assert(out.size == 4)
  }

  test("right rows are never double-counted across the two probe bins") {
    // the left window straddles two bins; every right row lives in
    // exactly one bin, so nothing is counted twice and the residual
    // range filter trims the next-bin tail
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:30"))).toDF("id", "key", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:30"), 1.0), // same bin, in window
      (1L, ts("2024-01-01 10:14:59"), 2.0), // same bin, in window
      (1L, ts("2024-01-01 10:15:01"), 4.0), // next bin, in window
      (1L, ts("2024-01-01 10:15:31"), 8.0)  // next bin, past window end
    ).toDF("key", "t", "v")
    val out = RangeJoin.countInWindow(left, right, "id", "key", "t", "v", 900L)
      .select("n_in_window", "sum_in_window").as[(Long, Double)].head()
    assert(out == ((3L, 7.0)))
  }

  test("overlapJoin: hand-checked overlaps, half-open ends don't touch") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")),
      (3L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("lid", "key", "s", "e")
    val right = Seq(
      // overlaps left 1 by 30 min; touches left 2's start EXACTLY → no
      (10L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      // key 2: contained in left 3
      (11L, 2L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:20:00")),
      // key mismatch with everything
      (12L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("rid", "key", "s", "e")
    val out = RangeJoin.overlapJoin(left, right, "lid", "rid", "key",
        "s", "e", binSec = 3600L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 1L, 1800L), (3L, 11L, 2L, 300L)))
  }

  test("overlapJoin: pairs sharing many bins are emitted exactly once") {
    // both intervals span 5 one-minute bins together; the positional
    // dedup must emit one row, with the full overlap length
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")))
      .toDF("lid", "key", "s", "e")
    val right = Seq((2L, 1L, ts("2024-01-01 10:01:00"), ts("2024-01-01 10:04:00")))
      .toDF("rid", "key", "s", "e")
    val out = RangeJoin.overlapJoin(left, right, "lid", "rid", "key",
        "s", "e", binSec = 60L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 180L)))
  }

  test("overlapJoin matches the brute-force inequality join") {
    val rnd = new scala.util.Random(111L)
    def mk(n: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(86400).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + 1 + rnd.nextInt(7200))
    }
    val lrows = mk(120)
    val rrows = mk(150)
    def df(rows: Seq[(Long, Long, Long, Long)], id: String) = rows.map {
      case (i, k, s, e) => (i, k, new Timestamp(s * 1000), new Timestamp(e * 1000))
    }.toDF(id, "key", "s", "e")
    val got = RangeJoin.overlapJoin(df(lrows, "lid"), df(rrows, "rid"),
        "lid", "rid", "key", "s", "e", binSec = 1800L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val model = (for {
      (la, lk, ls, le) <- lrows
      (ra, rk, rs, re) <- rrows
      if lk == rk && ls < re && rs < le
    } yield (la, ra, lk, math.min(le, re) - math.max(ls, rs))).toSet
    assert(got == model)
  }
}
