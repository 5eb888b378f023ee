package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict order, earliest-anchor windows, monotone counts") {
    val ev = Seq(
      // u1 converts fully inside both 6h windows
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 02:00:00")),
      (1L, "purchase", ts("2024-01-01 05:00:00")),
      // u2 clicks AFTER the 6h window → stops at stage 1
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 07:00:00")),
      (2L, "purchase", ts("2024-01-01 08:00:00")),
      // u3 clicks BEFORE signing up → the click doesn't count
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "signup", ts("2024-01-01 01:00:00")),
      // u4 anchors at the EARLIEST in-window click (01:00), so the
      // 08:00 purchase misses that window even though a later click
      // (03:00) would have admitted it — first-touch semantics
      (4L, "signup", ts("2024-01-01 00:00:00")),
      (4L, "click", ts("2024-01-01 01:00:00")),
      (4L, "click", ts("2024-01-01 03:00:00")),
      (4L, "purchase", ts("2024-01-01 08:00:00")),
      // u5 never signs up
      (5L, "purchase", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Behavior.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"), windowHours = 6)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "signup", 4L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("funnel counts are layout-independent") {
    val rnd = new scala.util.Random(3)
    val ev = Seq.fill(400) {
      (rnd.nextInt(20).toLong,
        Seq("signup", "click", "purchase")(rnd.nextInt(3)),
        new Timestamp(1704067200000L + rnd.nextInt(86400 * 10) * 1000L))
    }.toDF("user_id", "event_type", "ts")
    val one = Behavior.funnel(ev.coalesce(1), "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"), 12).as[(Long, String, Long)].collect().toSet
    val many = Behavior.funnel(ev.repartition(7), "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"), 12).as[(Long, String, Long)].collect().toSet
    assert(one == many)
  }

  test("cohort retention: day-grain cells, offset 0 is the cohort size") {
    val ev = Seq(
      (1L, "purchase", ts("2024-01-01 10:00:00")), // cohort d0
      (1L, "purchase", ts("2024-01-03 10:00:00")), // offset 2
      (1L, "purchase", ts("2024-01-03 11:00:00")), // same day → one cell
      (2L, "purchase", ts("2024-01-01 23:59:59")), // cohort d0
      (2L, "purchase", ts("2024-01-02 00:00:01")), // offset 1
      (3L, "purchase", ts("2024-01-02 05:00:00")), // cohort d1
      (3L, "view", ts("2024-01-05 05:00:00"))      // wrong type → ignored
    ).toDF("user_id", "event_type", "ts")
    val d0 = 19723L // epoch day of 2024-01-01
    val got = Behavior.cohortRetention(ev, "user_id", "ts", "event_type", "purchase")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((d0, 0L, 2L), (d0, 1L, 1L), (d0, 2L, 1L), (d0 + 1, 0L, 1L)))
  }

  test("trend slope: exact ppm on linear counts, sign-split, den=0 guard") {
    def rows(g: String, x: Long, n: Int) = Seq.fill(n)((g, x))
    val df = (
      rows("up", 100, 1) ++ rows("up", 101, 3) ++ rows("up", 102, 5) ++ // +2/day
      rows("down", 100, 5) ++ rows("down", 101, 3) ++ rows("down", 102, 1) ++ // -2/day
      rows("flat", 100, 4) ++ // single x → den = 0
      rows("frac", 100, 1) ++ rows("frac", 101, 2) ++ rows("frac", 102, 4) // 1.5/day
    ).toDF("g", "x")
    val got = Behavior.trendSlopePpm(df, "g", col("x"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("up") == ((3L, 2000000L)))
    assert(got("down") == ((3L, -2000000L)))
    assert(got("flat") == ((1L, 0L)))
    assert(got("frac") == ((3L, 1500000L)))
  }

  test("trend slope truncates toward zero on both signs") {
    def rows(g: String, x: Long, n: Int) = Seq.fill(n)((g, x))
    // slope 1/3: x = 0,1,2,3 with y = 1,1,1,2 → num/den = 3/10?  compute:
    // n=4 sx=6 sy=5 sxy=9 sxx=14 → num=4*9-30=6, den=4*14-36=20 → 0.3
    val df = (rows("p", 0, 1) ++ rows("p", 1, 1) ++ rows("p", 2, 1) ++ rows("p", 3, 2) ++
      rows("n", 0, 2) ++ rows("n", 1, 1) ++ rows("n", 2, 1) ++ rows("n", 3, 1)
    ).toDF("g", "x")
    val got = Behavior.trendSlopePpm(df, "g", col("x"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got("p") == 300000L)
    assert(got("n") == -300000L)
  }

  test("transition matrix: hand-checked counts and ppm rows") {
    // user 1: a→b→a→c ; user 2: a→b ; transitions:
    // a→b ×2, b→a ×1, a→c ×1 → from a: b=500000ppm, c=250000… wait,
    // a has 3 outgoing (a→b, a→b, a→c) → b 666666, c 333333; b→a 1000000.
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 5L, "a"), (2L, 6L, "b")
    ).map { case (u, t, ty) =>
      (u, new java.sql.Timestamp(t * 1000), ty, t)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.transitionMatrixPpm(df, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 666666L), ("a", "c", 1L, 333333L),
      ("b", "a", 1L, 1000000L)))
  }

  test("transition matrix: tie timestamps resolve by the tiebreak column") {
    // both events at ts=1: order is event_id 10 then 20 → x→y, never y→x
    val df = Seq(
      (1L, 1L, "x", 10L), (1L, 1L, "y", 20L)
    ).map { case (u, t, ty, id) =>
      (u, new java.sql.Timestamp(t * 1000), ty, id)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.transitionMatrixPpm(df, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("x", "y", 1L, 1000000L)))
  }

  test("transition matrix is layout-independent") {
    val rnd = new scala.util.Random(109L)
    val rows = (1 to 3000).map { i =>
      (rnd.nextInt(40).toLong, new java.sql.Timestamp(rnd.nextInt(1000) * 1000L),
        s"t${rnd.nextInt(5)}", i.toLong)
    }
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val a = Behavior.transitionMatrixPpm(df.repartition(3), "user_id",
        "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    val b = Behavior.transitionMatrixPpm(df.repartition(13), "user_id",
        "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(a == b)
    // brute-force model: per user, (ts, event_id)-sorted consecutive
    // pairs; counts per state pair; floor-ppm over the from-state total
    val model = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._2.getTime, e._4)).map(_._3)
        .sliding(2).collect { case Seq(f, t) => (f, t) }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = model.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expect = model.map { case ((f, t), n) =>
      (f, t, n, n * 1000000L / totals(f))
    }.toSet
    assert(a == expect)
  }

  test("frequentPairsPpm: hand-checked support/confidence/lift") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // duplicate presence collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("basket", "item")
    val out = Behavior.frequentPairsPpm(rows, "basket", "item", 1L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // N=4, n_x=3, n_y=3, n_z=1; (x,y)=2, (x,z)=1
    assert(out == Map(
      ("x", "y") -> ((2L, 500000L, 666666L, 888888L)),
      ("x", "z") -> ((1L, 250000L, 333333L, 1333333L))))
    // the count gate filters before metrics
    val gated = Behavior.frequentPairsPpm(rows, "basket", "item", 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(gated.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
  }

  test("resampleForwardFill: dense grid, last-in-bucket, staleness, tie-break") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:05"), 1L, 1.0), // u1 bucket 0
      (1L, ts("2024-01-01 00:00:30"), 2L, 2.0), // same bucket, later → wins
      (1L, ts("2024-01-01 00:03:20"), 3L, 5.0), // bucket 3: gap at 1, 2
      (2L, ts("2024-01-01 00:07:00"), 4L, 4.0), // single-bucket series
      (3L, ts("2024-01-01 00:00:10"), 5L, 7.0), // same ts as e6 —
      (3L, ts("2024-01-01 00:00:10"), 6L, 9.0)  // higher tie id wins
    ).toDF("user_id", "t", "eid", "v0")
    val out = Behavior.resampleForwardFill(ev, "user_id", "t", "eid", "v0", 60L)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val base = ts("2024-01-01 00:00:00").getTime / 1000 / 60 // grid epoch-minutes
    def b(k: Long) = base + k
    assert(out.size == 6) // u1: 4 buckets, u2: 1, u3: 1
    assert(out((1L, b(0))) == ((2.0, 0L)))
    assert(out((1L, b(1))) == ((2.0, 1L)))
    assert(out((1L, b(2))) == ((2.0, 2L)))
    assert(out((1L, b(3))) == ((5.0, 0L)))
    assert(out((2L, b(7))) == ((4.0, 0L)))
    assert(out((3L, b(0))) == ((9.0, 0L)))
  }

  test("decayedActivity: power-of-two halving by bucket age, saturating at 63") {
    import graft.ops.Behavior
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    // user 1: 8 events in each of the latest three hours
    // -> 8 + 8/2 + 8/4 = 14; user 2: 5 events 70 hours old -> 5/2^70 = 0
    val ev = ((1 to 8).flatMap(_ => Seq((1L, ts(72)), (1L, ts(71)), (1L, ts(70)))) ++
      (1 to 5).map(_ => (2L, ts(2)))).toDF("user_id", "ts")
    val out = Behavior.decayedActivity(ev, "user_id", "ts", stepSec = 3600L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((24L, 3L, 14L)))
    assert(out(2L) == ((5L, 1L, 0L)))
    // truncation: 3 events one bucket old halve to 1, not 1.5
    val ev2 = Seq((9L, ts(10)), (9L, ts(9)), (9L, ts(9)), (9L, ts(9)))
      .toDF("user_id", "ts")
    val o2 = Behavior.decayedActivity(ev2, "user_id", "ts", stepSec = 3600L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(o2 == ((9L, 4L, 2L, 2L)))
  }

  test("temporalSplit: test at cutoff, per-key embargo purge, quiet keys untouched") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val cutoff = Timestamp.valueOf("2024-01-01 12:00:00").getTime / 1000
    // key 1: test at 13:30 -> embargo purges (11:30, 13:30 - 2h = 11:30]
    //   ... events strictly after 11:30 and before cutoff purge
    // key 2: no test events -> all train
    val ev = Seq(
      (1L, 10L, ts(9)), (1L, 11L, ts(11)), (1L, 12L, ts(13)), (1L, 13L, ts(15)),
      (2L, 20L, ts(9)), (2L, 21L, ts(11)))
      .toDF("user_id", "event_id", "ts")
    val out = Behavior.temporalSplit(ev, "user_id", "ts", "event_id",
        cutoffSec = cutoff, embargoSec = 2 * 3600)
      .as[(Long, Long, Long, String)].collect().map(r => r._2 -> r._4).toMap
    // key 1 first test = 13:30; embargo floor = 11:30; event 11 at
    // 11:30 is NOT strictly after -> train; 12, 13 test
    assert(out == Map(10L -> "train", 11L -> "train",
      12L -> "test", 13L -> "test", 20L -> "train", 21L -> "train"))
    // shrink embargo start: event at 11:31 would purge
    val ev2 = ev.union(Seq((1L, 14L,
      Timestamp.valueOf("2024-01-01 11:31:00"))).toDF("user_id", "event_id", "ts"))
    val o2 = Behavior.temporalSplit(ev2, "user_id", "ts", "event_id",
        cutoffSec = cutoff, embargoSec = 2 * 3600)
      .as[(Long, Long, Long, String)].collect().map(r => r._2 -> r._4).toMap
    assert(o2(14L) == "purged")
  }

  test("corrSignedR2Ppm: brute-force model, perfect lines, constant columns") {
    def brute(pts: Seq[(Long, Long)]): Long = {
      val n = BigInt(pts.size)
      val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val syy = pts.map(p => BigInt(p._2) * p._2).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (dx == 0 || dy == 0) 0L
      else (num.signum * (num * num * 1000000 / (dx * dy))).toLong
    }
    val rnd = new scala.util.Random(73)
    val rows = (1 to 150).map { i =>
      val g = s"g${i % 3}"
      val x = i.toLong
      val y = (i % 3) match {
        case 0 => 3L * i + 7                       // perfect positive line
        case 1 => -2L * i + rnd.nextInt(3)         // noisy negative
        case _ => rnd.nextInt(100).toLong          // unrelated
      }
      (g, x, y)
    }
    val got = Behavior.corrSignedR2Ppm(rows.toDF("g", "x", "y")
        .repartition(7), "g", col("x"), col("y"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val exp = rows.groupBy(_._1).map { case (g, rs) =>
      g -> brute(rs.map(r => (r._2, r._3))) }
    assert(got == exp)
    assert(got("g0") == 1000000L, "a perfect line reads exactly 1e6")
    assert(got("g1") < -900000L, "strong negative reads near -1e6")
    assert(math.abs(got("g2")) < 200000L, "noise reads near 0")
    // constant y -> dy = 0 -> 0 by definition
    val const = Seq(("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L))
    assert(Behavior.corrSignedR2Ppm(const.toDF("g", "x", "y"), "g",
      col("x"), col("y")).as[(String, Long, Long)].collect().head._3 == 0L)
  }

  test("spearmanGradePpm: monotone 1e6, reversed -1e6, constant 0") {
    // any monotone map (even wildly non-linear) has perfect rank
    // correlation -- the property Pearson on raw values lacks
    val mono = (1 to 40).map(i => ("m", i.toLong, i.toLong * i * i))
    val rev  = (1 to 40).map(i => ("r", i.toLong, 1000L - i * i))
    val const = (1 to 40).map(i => ("c", i.toLong, 7L))
    val got = Behavior.spearmanGradePpm(
        (mono ++ rev ++ const).toDF("g", "x", "y").repartition(5),
        "g", col("x"), col("y"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("m" -> 1000000L, "r" -> -1000000L, "c" -> 0L))
  }

  test("spearmanGradePpm: ties match the BigInt grade model on a seeded fixture") {
    val B = 1000L
    def brute(rows: Seq[(Long, Long)]): Long = {
      val n = rows.size.toLong
      def grades(vs: Seq[Long]): Map[Long, Long] = {
        val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sorted = cnt.keys.toSeq.sorted
        var cum = 0L
        sorted.map { v =>
          cum += cnt(v)
          v -> (B * (2 * cum - cnt(v))) / (2 * n)
        }.toMap
      }
      val gx = grades(rows.map(_._1)); val gy = grades(rows.map(_._2))
      val pts = rows.map { case (x, y) => (gx(x), gy(y)) }
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = BigInt(n) * sxy - BigInt(sx) * sy
      val dx = BigInt(n) * sxx - BigInt(sx) * sx
      val dy = BigInt(n) * syy - BigInt(sy) * sy
      if (dx == 0 || dy == 0) 0L
      else {
        val mag = (((num * num) / dx) * 1000000) / dy
        (if (num < 0) -mag else mag).toLong
      }
    }
    val rnd = new scala.util.Random(77)
    val rows = (1 to 300).map { _ =>
      val x = rnd.nextInt(12).toLong            // heavy ties on x
      val y = x * 3 + rnd.nextInt(20) - 10      // correlated, tied y
      ("t", x, y)
    }
    val got = Behavior.spearmanGradePpm(rows.toDF("g", "x", "y")
        .repartition(7), "g", col("x"), col("y"))
      .as[(String, Long, Long)].collect().head
    assert(got._2 == 300L)
    assert(got._3 == brute(rows.map(r => (r._2, r._3))))
    assert(got._3 > 500000L, "strongly correlated fixture reads high")
  }

  test("kendallGradePpm: monotone 1e6, reversed -1e6, constant 0") {
    val mono = (1 to 40).map(i => ("m", i.toLong, i.toLong * i * i))
    val rev  = (1 to 40).map(i => ("r", i.toLong, 1000L - i * i))
    val const = (1 to 40).map(i => ("c", i.toLong, 7L))
    val got = Behavior.kendallGradePpm(
        (mono ++ rev ++ const).toDF("g", "x", "y").repartition(5),
        "g", col("x"), col("y"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("m" -> 1000000L, "r" -> -1000000L, "c" -> 0L))
  }

  test("kendallGradePpm: ties match the all-pairs BigInt model on a seeded fixture") {
    val B = 100L
    def brute(rows: Seq[(Long, Long)]): Long = {
      val n = rows.size.toLong
      def grades(vs: Seq[Long]): Map[Long, Long] = {
        val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sorted = cnt.keys.toSeq.sorted
        var cum = 0L
        sorted.map { v =>
          cum += cnt(v)
          v -> (B * (2 * cum - cnt(v))) / (2 * n)
        }.toMap
      }
      val gx = grades(rows.map(_._1)); val gy = grades(rows.map(_._2))
      val pts = rows.map { case (x, y) => (gx(x), gy(y)) }
      var c = 0L; var d = 0L; var eqx = 0L; var eqy = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val sx = java.lang.Long.signum(pts(j)._1 - pts(i)._1)
        val sy = java.lang.Long.signum(pts(j)._2 - pts(i)._2)
        if (sx == 0) eqx += 1
        if (sy == 0) eqy += 1
        if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
      }
      val num = BigInt(c - d)
      val dx = BigInt(n) * (n - 1) - 2 * BigInt(eqx)
      val dy = BigInt(n) * (n - 1) - 2 * BigInt(eqy)
      if (dx == 0 || dy == 0) 0L
      else {
        val mag = (((num * num * 4) / dx) * 1000000) / dy
        (if (num < 0) -mag else mag).toLong
      }
    }
    val rnd = new scala.util.Random(91)
    val rows = (1 to 300).map { _ =>
      val x = rnd.nextInt(12).toLong            // heavy ties on x
      val y = x * 3 + rnd.nextInt(20) - 10      // correlated, tied y
      ("t", x, y)
    }
    val got = Behavior.kendallGradePpm(rows.toDF("g", "x", "y")
        .repartition(7), "g", col("x"), col("y"))
      .as[(String, Long, Long)].collect().head
    assert(got._2 == 300L)
    assert(got._3 == brute(rows.map(r => (r._2, r._3))))
    assert(got._3 > 300000L, "strongly concordant fixture reads high")
  }

  test("attribution: first/last/linear with remainder on last, unattributed bucket") {
    def e(u: Long, t: String, hm: String, id: Long, v: Double) =
      (u, t, ts(s"2024-01-01 $hm:00"), id, v)
    val ev = Seq(
      e(1L, "view", "10:00", 1L, 0.0),
      e(1L, "click", "10:30", 2L, 0.0),
      e(1L, "view", "10:45", 7L, 0.0),            // 3 touches -> odd split
      e(1L, "purchase", "11:00", 3L, 10.0),       // v = 10000
      e(2L, "purchase", "11:00", 4L, 5.0),        // no touches at all
      e(3L, "view", "08:00", 5L, 0.0),            // outside the 2 h window
      e(3L, "purchase", "11:00", 6L, 2.0)
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Behavior.attribution(ev, "user_id", "ts", "event_id",
        "event_type", expr("greatest(floor(value * 1000), 0)"),
        conversionType = "purchase", lookbackSec = 7200L)
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // 10000 div 3 = 3333 per touch; remainder 1 rides the LAST touch
    // (the 10:45 view), which is also last-touch credit holder
    assert(got == Seq(
      ("(unattributed)", 2L, 7000L, 7000L, 7000L),
      ("click", 0L, 0L, 0L, 3333L),
      ("view", 1L, 10000L, 10000L, 6667L)))
    // credit conservation: every model sums to the converted total
    assert(got.map(_._3).sum == 17000L && got.map(_._4).sum == 17000L &&
      got.map(_._5).sum == 17000L)
  }

  test("rateSpikes: hot bucket flagged against the type's own baseline") {
    val ev = (0 until 10).flatMap { b =>
      val reps = if (b == 5) 20 else 1
      (0 until reps).map(i =>
        (1L, "a", new java.sql.Timestamp((b * 3600L + i) * 1000L), 0.0))
    }.toDF("user_id", "event_type", "ts", "value")
    val got = Behavior.rateSpikes(ev, "event_type", "ts",
        bucketSec = 3600L, kTenths = 30L)
      .orderBy("bucket").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 10)
    assert(got.forall(_._4 == 2900L))       // expected_milli = 29/10
    assert(got.filter(_._5 == 1L).map(_._2) == Seq(5L))
    assert(got.find(_._2 == 5L).get._3 == 20L)
  }

  test("conversionLag: first in-window touch sets the lag, per-channel quantiles") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L, 0.0),
      (1L, "purchase", ts("2024-01-01 10:30:00"), 2L, 1.0),   // lag 1800, view
      (2L, "click", ts("2024-01-01 09:00:00"), 3L, 0.0),
      (2L, "view", ts("2024-01-01 09:10:00"), 4L, 0.0),
      (2L, "purchase", ts("2024-01-01 10:00:00"), 5L, 1.0),   // lag 3600, click
      (3L, "view", ts("2024-01-01 06:00:00"), 6L, 0.0),       // outside window
      (3L, "purchase", ts("2024-01-01 10:00:00"), 7L, 1.0)
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Behavior.conversionLag(ev, "user_id", "ts", "event_id",
        "event_type", conversionType = "purchase", lookbackSec = 7200L,
        pcts = Seq(50, 100))
      .orderBy("event_type", "pct")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 50L, 3600L), ("click", 100L, 3600L),
      ("view", 50L, 1800L), ("view", 100L, 1800L)))
  }

  test("cusumSeries == the textbook max(0, S+d) recurrence; alarms on the shift") {
    val rnd = new scala.util.Random(20260820L)
    // group a shifts level +7 at t=50; group b stays centered
    val series = for (g <- Seq("a", "b"); t <- 0 until 80) yield
      (g, t.toLong,
        (rnd.nextInt(21) - 10 + (if (g == "a" && t >= 50) 7 else 0)).toLong)
    val got = Behavior.cusumSeries(series.toDF("g", "t", "v"),
        "g", "t", col("v"), ref = 0L, threshold = 30L)
      .orderBy("g", "t")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byG = series.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (g <- Seq("a", "b")) {
      var sPos = 0L; var sNeg = 0L
      val rows = got.filter(_._1 == g)
      byG(g).zip(rows).foreach { case ((_, t, v), r) =>
        sPos = math.max(0L, sPos + v)
        sNeg = math.max(0L, sNeg - v)
        assert(r == ((g, t, v, sPos, sNeg,
          if (sPos > 30L || sNeg > 30L) 1L else 0L)), s"$g t=$t")
      }
    }
    assert(got.filter(_._1 == "a").exists(_._6 == 1L), "shift must alarm")
  }

  test("theilSenSlope == brute pairwise-median model; outlier-immune where OLS moves") {
    import graft.ops.Behavior
    val rnd = new scala.util.Random(20260824L)
    // group a: clean slope 3 + noise; group b: same but one wild outlier
    def mk(g: String, outlier: Boolean) = (0 until 40).map { t =>
      val v = 3L * t + 10 + rnd.nextInt(5) +
        (if (outlier && t == 20) 100000L else 0L)
      (g, t.toLong, v)
    }
    // mk draws from the shared rnd: materialize each group ONCE
    val fxa = mk("a", outlier = false); val fxb = mk("b", outlier = true)
    val fx = fxa ++ fxb
    val got = Behavior.theilSenSlope(fx.toDF("g", "t", "v"), "g", "t", col("v"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect()
    def brute(pts: Seq[(String, Long, Long)]): (Long, Long, Long, Long) = {
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._2 < pts(j)._2
      } yield Math.floorDiv((pts(j)._3 - pts(i)._3) * 1000000L,
        pts(j)._2 - pts(i)._2)).sorted
      val slope = slopes((slopes.size + 1) / 2 - 1)
      val ics = pts.map(p => p._3 * 1000000L - slope * p._2).sorted
      (pts.size.toLong, slopes.size.toLong, slope, ics((pts.size + 1) / 2 - 1))
    }
    for ((g, fxg) <- Seq("a" -> fxa, "b" -> fxb)) {
      val (np, npr, s, i) = brute(fxg)
      assert(got.find(_._1 == g).get == ((g, np, npr, s, i)), g)
    }
    // the robust slopes of a and b agree within noise; OLS on b explodes
    val sa = got.find(_._1 == "a").get._4; val sb = got.find(_._1 == "b").get._4
    assert(math.abs(sa - sb) < 300000L, s"robust slopes: $sa vs $sb")
  }

  test("theilSenSlope: duplicate points and the maxPoints bound raise loudly") {
    import graft.ops.Behavior
    def msgsOf(e: Throwable) =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    val dup = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L)).toDF("g", "t", "v")
    val e1 = intercept[Throwable] {
      Behavior.theilSenSlope(dup, "g", "t", col("v")).collect()
    }
    assert(msgsOf(e1).contains("duplicate series point"), msgsOf(e1))
    val long = (0 until 12).map(t => ("a", t.toLong, t.toLong)).toDF("g", "t", "v")
    val e2 = intercept[Throwable] {
      Behavior.theilSenSlope(long, "g", "t", col("v"), maxPoints = 10).collect()
    }
    assert(msgsOf(e2).contains("series bound"), msgsOf(e2))
    // in-bound control: 10 points at the cap run clean
    val ok = Behavior.theilSenSlope(
      (0 until 10).map(t => ("a", t.toLong, 2L * t)).toDF("g", "t", "v"),
      "g", "t", col("v"), maxPoints = 10).collect()
    assert(ok.length == 1 && ok.head.getLong(3) == 2000000L)
  }

  test("cusumSeries: duplicate series points raise loudly") {
    val dup = Seq(("a", 1L, 1L), ("a", 1L, 2L)).toDF("g", "t", "v")
    val e = intercept[Throwable] {
      Behavior.cusumSeries(dup, "g", "t", col("v"), 0L, 10L).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate series point"), s"got: $msgs")
  }
}
