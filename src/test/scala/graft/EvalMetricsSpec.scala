package graft

import org.apache.spark.sql.functions.col

import graft.ops.EvalMetrics

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("aucPpm: perfect separation 1e6, reversal 0, one-class group 0") {
    val rows = Seq.tabulate(20) { i =>
      ("sep", i.toLong, if (i >= 10) 1L else 0L) } ++
      Seq.tabulate(20) { i => ("rev", i.toLong, if (i < 10) 1L else 0L) } ++
      Seq.tabulate(5) { i => ("one", i.toLong, 1L) }
    val got = EvalMetrics.aucPpm(rows.toDF("g", "s", "l").repartition(5),
        "g", col("s"), col("l"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(got == Map("sep" -> 1000000L, "rev" -> 0L, "one" -> 0L))
  }

  test("aucPpm: ties match the pairwise half-weight model on a seeded fixture") {
    // brute force: P(score_pos > score_neg) + P(equal)/2, floor ppm
    def brute(rows: Seq[(Long, Long)]): Long = {
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val wins2 = (for (p <- pos; n <- neg) yield {
        if (p > n) 2L else if (p == n) 1L else 0L
      }).sum
      (BigInt(wins2) * 1000000 / (BigInt(2) * pos.size * neg.size)).toLong
    }
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { _ =>
      val l = if (rnd.nextInt(3) == 0) 1L else 0L
      // noisy signal with HEAVY ties: only 8 distinct scores
      val s = (l * 3 + rnd.nextInt(6)).toLong
      (s, l)
    }
    val got = EvalMetrics.aucPpm(rows.map { case (s, l) => ("g", s, l) }
        .toDF("g", "s", "l").repartition(7), "g", col("s"), col("l"))
      .as[(String, Long, Long, Long)].collect().head
    assert((got._2, got._3) == (rows.count(_._2 == 1L).toLong,
      rows.count(_._2 == 0L).toLong))
    assert(got._4 == brute(rows))
  }

  test("calibrationBins: hand-computed cells, top score lands in the last bin") {
    val rows = Seq(
      (50000L, 0L), (150000L, 0L),     // bin 0, bin 1
      (850000L, 1L), (850000L, 0L),    // bin 8 twice
      (1000000L, 1L)                   // exactly 1e6 -> clamped to bin 9
    )
    val got = EvalMetrics.calibrationBins(rows.toDF("s", "l"),
        col("s"), col("l"), bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 50000L, 0L, -50000L),
      (1L, 1L, 150000L, 0L, -150000L),
      (8L, 2L, 850000L, 500000L, -350000L),
      (9L, 1L, 1000000L, 1000000L, 0L)))
  }

  test("thresholdSweep matches the per-cut brute force; one row per distinct score") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 200).map { _ =>
      val l = rnd.nextInt(2).toLong
      ((l * 2 + rnd.nextInt(5)).toLong, l)
    }
    val got = EvalMetrics.thresholdSweep(rows.toDF("s", "l").repartition(6),
        col("s"), col("l"))
      .orderBy("threshold")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == rows.map(_._1).distinct.sorted)
    val npos = rows.count(_._2 == 1L).toLong
    got.foreach { case (t, tp, fp, fn, prec, rec, f1) =>
      val etp = rows.count(r => r._1 >= t && r._2 == 1L).toLong
      val efp = rows.count(r => r._1 >= t && r._2 == 0L).toLong
      assert((tp, fp, fn) == (etp, efp, npos - etp))
      assert(prec == etp * 1000000L / (etp + efp))
      assert(rec == etp * 1000000L / npos)
      assert(f1 == 2 * etp * 1000000L / (2 * etp + efp + (npos - etp)))
    }
  }

  test("cohensKappaPpm: perfect 1e6, textbook 2x2, worse-than-chance negative, constant 0") {
    def run(pairs: Seq[(String, String)]): (Long, Long, Long, Long) =
      EvalMetrics.cohensKappaPpm(pairs.toDF("a", "b").repartition(3),
        col("a"), col("b")).as[(Long, Long, Long, Long)].collect().head
    // perfect agreement over 2 classes
    assert(run(Seq(("x", "x"), ("y", "y"), ("x", "x"))) ==
      (3L, 1000000L, 555555L, 1000000L))
    // textbook 2x2: diag 45, n 60; pe = (25*30 + 35*30)/3600 = 1/2
    // kappa = (45/60 - 1/2)/(1 - 1/2) = 1/2
    val tb = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(25)(("b", "b"))
    val (n, po, pe, k) = run(tb)
    assert((n, po, pe, k) == (60L, 750000L, 500000L, 500000L))
    // systematic disagreement: kappa < 0
    assert(run(Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")))._4 < 0L)
    // both raters constant and equal: pe = 1 -> den 0 -> 0 by contract
    assert(run(Seq(("z", "z"), ("z", "z")))._4 == 0L)
  }

  test("brierPpm: sharp-honest 0, confident-wrong 1e6, hand-computed middle") {
    val rows = Seq(
      ("sharp", 1000000L, 1L), ("sharp", 0L, 0L),
      ("wrong", 1000000L, 0L), ("wrong", 0L, 1L),
      // (700000-1e6)^2 + (300000-0)^2 = 2*9e10 -> /(2*1e6) = 90000
      ("mid", 700000L, 1L), ("mid", 300000L, 0L))
    val got = EvalMetrics.brierPpm(rows.toDF("g", "s", "l"), "g",
        col("s"), col("l"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("sharp" -> 0L, "wrong" -> 1000000L, "mid" -> 90000L))
  }

  test("perClassPrf: one-sided classes report, counts hand-checked") {
    // pred/truth pairs: a:2 correct, 1 a-pred was b; b never predicted;
    // c predicted once but never true
    val pairs = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("c", "b"))
    val got = EvalMetrics.perClassPrf(pairs.toDF("p", "t"),
        col("p"), col("t"))
      .orderBy("label")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // a: tp 2, fp 1, fn 0 -> prec 666666, rec 1e6, f1 800000
      ("a", 2L, 1L, 0L, 666666L, 1000000L, 800000L),
      // b: tp 0, fp 0 (never predicted), fn 2 -> all zero except fn
      ("b", 0L, 0L, 2L, 0L, 0L, 0L),
      // c: tp 0, fp 1, fn 0
      ("c", 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("ecePpm: occupancy-weighted mean |gap| and max cell gap") {
    // bin 0: 1 row gap -50000; bin 8: 2 rows gap -350000; bin 9: 1 row gap 0
    val rows = Seq((50000L, 0L), (850000L, 1L), (850000L, 0L), (1000000L, 1L))
    val got = EvalMetrics.ecePpm(rows.toDF("s", "l"), col("s"), col("l"),
        bins = 10).as[(Long, Long, Long, Long)].collect().head
    // ece = (1*50000 + 2*350000 + 1*0) / 4 = 187500, mce = 350000
    assert(got == (4L, 3L, 187500L, 350000L))
  }

  test("isotonicCalibrationPpm: textbook pooling, minimax model parity, monotone") {
    // rates per bin: 40%, 20%, 60% -> PAVA pools the violator pair to
    // 30%, 30%, 60%
    def rows(bin: Int, n: Int, pos: Int) = {
      val s = bin * 100000L + 50000L
      Seq.fill(pos)((s, 1L)) ++ Seq.fill(n - pos)((s, 0L))
    }
    val fix = rows(0, 5, 2) ++ rows(1, 5, 1) ++ rows(2, 5, 3)
    val got = EvalMetrics.isotonicCalibrationPpm(fix.toDF("s", "l"),
        col("s"), col("l"), bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 5L, 400000L, 300000L),
      (1L, 5L, 200000L, 300000L),
      (2L, 5L, 600000L, 600000L)))
    // random weighted fixture vs an independent minimax spelling
    val rnd = new scala.util.Random(11)
    val fix2 = (0 until 8).flatMap { b =>
      val n = rnd.nextInt(9) + 1
      rows(b, n, rnd.nextInt(n + 1))
    }
    val got2 = EvalMetrics.isotonicCalibrationPpm(fix2.toDF("s", "l")
        .repartition(5), col("s"), col("l"), bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    val cells = fix2.groupBy(t => t._1 / 100000).toSeq.sortBy(_._1)
      .map { case (b, rs) => (b, rs.size.toLong, rs.count(_._2 == 1L).toLong) }
    val bs = cells.map(_._1)
    def rate(k: Int, j: Int): Long = {
      val seg = cells.filter(c => c._1 >= bs(k) && c._1 <= bs(j))
      seg.map(_._3).sum * 1000000L / seg.map(_._2).sum
    }
    val model = bs.indices.map { i =>
      (0 to i).map { k => (i until bs.size).map(j => rate(k, j)).min }.max
    }
    assert(got2.map(_._4) == model)
    assert(got2.map(_._4) == got2.map(_._4).sorted, "fitted must be monotone")
  }

  test("rougeN: clipping, identical/disjoint extremes, short sides absent") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"), // identical -> P=R=F=1e6
      (2L, "a b x", "a b c"),     // one of two bigrams shared
      (3L, "p q", "x y z"),       // no overlap -> all 0
      (4L, "solo", "a b c"),      // candidate under n tokens -> absent
      (5L, "w w w w", "w w")      // 'w w' x3 vs x1: clip at 1
    ).toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", 2)
      .select("pair_id", "cand_grams", "ref_grams", "hit_grams",
        "precision_ppm", "recall_ppm", "f1_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(out(2L) == ((2L, 2L, 2L, 1L, 500000L, 500000L, 500000L)))
    assert(out(3L) == ((3L, 1L, 2L, 0L, 0L, 0L, 0L)))
    assert(!out.contains(4L), "sub-n candidate has no defined gram bag")
    // clip: hit=min(3,1)=1; P=1e6 div 3; R=1e6; F=(2PR) div (P+R)
    assert(out(5L) == ((5L, 3L, 1L, 1L, 333333L, 1000000L, 499999L)))
  }

  test("rougeN == brute-force clipped-multiset model on random pairs") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val n = 2
    val pairs = (0 until 50).map { i =>
      def txt() = (0 until rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, txt(), txt())
    }
    def bag(t: String): Map[String, Long] = {
      val ts = t.split(" ").filter(_.nonEmpty)
      if (ts.length < n) Map.empty
      else ts.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }
    val model = pairs.flatMap { case (id, c, r) =>
      val (cb, rb) = (bag(c), bag(r))
      if (cb.isEmpty || rb.isEmpty) None
      else {
        val hit = cb.keySet.intersect(rb.keySet).toSeq
          .map(g => math.min(cb(g), rb(g))).sum
        val (ct, rt) = (cb.values.sum, rb.values.sum)
        val p = hit * 1000000L / ct
        val q = hit * 1000000L / rt
        val f = if (p + q == 0) 0L else 2 * p * q / (p + q)
        Some((id, ct, rt, hit, p, q, f))
      }
    }.toSet
    val got = EvalMetrics.rougeN(
        pairs.toDF("pair_id", "cand", "ref").repartition(7),
        "pair_id", "cand", "ref", n)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == model)
  }

  test("krippendorffAlphaPpm: hand cases + BigInt model on a seeded fixture") {
    def run(rs: Seq[(Long, String)]): (Long, Long, Long) =
      EvalMetrics.krippendorffAlphaPpm(
          rs.toDF("unit", "value").repartition(5), "unit", "value")
        .as[(Long, Long, Long)].collect().head
    def brute(ratings: Seq[(Long, String)]): Long = {
      val byU = ratings.groupBy(_._1).filter(_._2.size >= 2)
      if (byU.isEmpty) return 0L
      val n = byU.values.map(_.size).sum
      val nv = byU.values.flatten.toSeq.groupBy(_._2)
        .view.mapValues(_.size.toLong)
      val de = BigInt(n) * n - nv.values.map(c => BigInt(c) * c).sum
      if (de == 0) return 1000000L
      val L = BigInt(27720)
      val sdo = byU.values.map { rs =>
        val m = rs.size
        val ssq = rs.groupBy(_._2).values.map(g => BigInt(g.size) * g.size).sum
        (BigInt(m) * m - ssq) * (L / (m - 1))
      }.sum
      (BigInt(1000000) - (BigInt(n - 1) * sdo * 1000000) / (L * de)).toLong
    }
    // perfect within-unit agreement across varied values -> 1e6
    assert(run(Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (2L, "b")))
      == ((2L, 5L, 1000000L)))
    // one agreeing pair + one disagreeing pair over a 3/1 margin:
    // D_o = D_e = 1/2 -> exactly chance-level, alpha = 0
    assert(run(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")))
      == ((2L, 4L, 0L)))
    // no value variation anywhere -> D_e = 0 convention, 1e6
    assert(run(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")))
      == ((2L, 4L, 1000000L)))
    // single-rating units are excluded (unit 9 drops, result unchanged)
    assert(run(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (9L, "c")))
      == ((2L, 4L, 0L)))
    // seeded mixed fixture vs the exact rational model
    val rnd = new scala.util.Random(20260815L)
    val fixture = (1 to 40).flatMap { u =>
      (0 until (2 + rnd.nextInt(7))).map(_ =>
        (u.toLong, ("" + ('a' + rnd.nextInt(4)).toChar)))
    }
    val got = run(fixture)
    assert(got._1 == 40L && got._3 == brute(fixture))
    // systematic disagreement reads negative: two raters always differ
    val anti = (1 to 12).map(u => (u.toLong, if (u % 2 == 0) "a" else "b")) ++
      (1 to 12).map(u => (u.toLong, if (u % 2 == 0) "b" else "a"))
    assert(run(anti)._3 < 0L)
  }

  test("retrievalMetrics: hand fixture, zero-relevant and zero-hit queries") {
    import graft.ops.EvalMetrics
    // q1: docs d1..d5 ranked 1..5; relevant {d2, d4, d9} (d9 unretrieved)
    // q2: ranked but nothing relevant; q3: relevant {x1,x2}, zero hits
    val results = (1 to 5).map(i => ("q1", s"d$i", i.toLong)) ++
      (1 to 5).map(i => ("q2", s"e$i", i.toLong)) ++
      (1 to 5).map(i => ("q3", s"f$i", i.toLong))
    val relevant = Seq(("q1", "d2"), ("q1", "d4"), ("q1", "d9"),
      ("q3", "x1"), ("q3", "x2"))
    val got = EvalMetrics.retrievalMetrics(results.toDF("q", "doc", "rank"),
        relevant.toDF("q", "doc"), "q", "doc", "rank", k = 5)
      .orderBy("q")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // q1: rr = 1e6 div 2; p = 2e6 div 5; r = 2e6 div 3;
    //     ap = (1e6·1 div 2 + 1e6·2 div 4) div min(3,5) = 1e6 div 3
    assert(got(0) == (("q1", 3L, 2L, 500000L, 400000L, 666666L, 333333L)))
    assert(got(1) == (("q2", 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(2) == (("q3", 2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("retrievalMetrics == brute model on a seeded fixture; dup rank raises") {
    import graft.ops.EvalMetrics
    val rnd = new scala.util.Random(20260823L)
    val k = 8
    val results = for (q <- 1 to 12; r <- 1 to 15) yield
      (s"q$q", s"d${rnd.nextInt(40)}_$q$r", r.toLong) // unique docs per row
    val relevant = for (q <- 1 to 12; _ <- 1 to 6) yield {
      val pick = results.filter(_._1 == s"q$q")(rnd.nextInt(15))
      if (rnd.nextBoolean()) (pick._1, pick._2) else (s"q$q", s"miss${rnd.nextInt(30)}")
    }
    val got = EvalMetrics.retrievalMetrics(results.toDF("q", "doc", "rank"),
        relevant.toDF("q", "doc"), "q", "doc", "rank", k)
      .orderBy("q").as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val relSet = relevant.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    got.foreach { case (q, nRel, nHits, rr, p, r, ap) =>
      val rel = relSet.getOrElse(q, Set.empty[String])
      val hits = results.filter(t => t._1 == q && t._3 <= k && rel(t._2))
        .map(_._3).sorted
      assert(nRel == rel.size && nHits == hits.size, q)
      assert(rr == (if (hits.isEmpty) 0L else 1000000L / hits.head), q)
      assert(p == hits.size.toLong * 1000000L / k, q)
      assert(r == (if (rel.isEmpty) 0L else hits.size.toLong * 1000000L / rel.size), q)
      val apExp = if (rel.isEmpty || hits.isEmpty) 0L
        else hits.zipWithIndex.map { case (rank, i) =>
          (i + 1).toLong * 1000000L / rank }.sum / math.min(rel.size, k)
      assert(ap == apExp, q)
    }
    val dup = Seq(("q1", "a", 1L), ("q1", "b", 1L)).toDF("q", "doc", "rank")
    val e = intercept[Throwable] {
      EvalMetrics.retrievalMetrics(dup, Seq(("q1", "a")).toDF("q", "doc"),
        "q", "doc", "rank", 5).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate rank"), s"got: $msgs")
  }

  test("ndcgAtK == brute model with the pinned table; perfect ranking reads 1e6") {
    import graft.ops.EvalMetrics
    val k = 6
    val disc = EvalMetrics.ndcgDiscount(k)
    def brute(res: Seq[(String, String, Long)],
              gr: Seq[(String, String, Long)], q: String): (Long, Long, Long) = {
      val gm = gr.filter(_._1 == q).groupBy(_._2).view
        .mapValues(_.map(_._3).max).toMap
      val dcg = res.filter(t => t._1 == q && t._3 <= k)
        .map(t => ((1L << gm.getOrElse(t._2, 0L)) - 1) * disc(t._3.toInt - 1))
        .sum
      val idcg = gm.values.toSeq.sortBy(-_).take(k).zipWithIndex
        .map { case (g, i) => ((1L << g) - 1) * disc(i) }.sum
      (dcg, idcg,
        if (idcg > 0) (BigInt(dcg) * 1000000 / idcg).toLong else 0L)
    }
    val rnd = new scala.util.Random(20260827L)
    val res = for (q <- 1 to 8; r <- 1 to 10) yield
      (s"q$q", s"d${r}_$q", r.toLong)
    val gr = for (q <- 1 to 8; _ <- 1 to 7) yield
      (s"q$q", s"d${rnd.nextInt(14) + 1}_$q", rnd.nextInt(5).toLong)
    val got = EvalMetrics.ndcgAtK(res.toDF("q", "doc", "rank"),
        gr.toDF("q", "doc", "g"), "q", "doc", "rank", "g", k)
      .orderBy("q").as[(String, Long, Long, Long, Long)].collect()
    got.foreach { case (q, nG, dcg, idcg, ndcg) =>
      val exp = brute(res, gr, q)
      assert(nG == gr.filter(_._1 == q).map(_._2).distinct.size, q)
      assert((dcg, idcg, ndcg) == exp, q)
    }
    // perfect ranking: docs ordered by their own grade -> exactly 1e6
    val pres = (1 to 4).map(i => ("p", s"x$i", i.toLong))
    val pgr = (1 to 4).map(i => ("p", s"x$i", (5 - i).toLong))
    val perfect = EvalMetrics.ndcgAtK(pres.toDF("q", "doc", "rank"),
        pgr.toDF("q", "doc", "g"), "q", "doc", "rank", "g", k)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(perfect._5 == 1000000L)
    // grade bound raises loudly just past 20; 20 itself is clean
    val e = intercept[Throwable] {
      EvalMetrics.ndcgAtK(pres.toDF("q", "doc", "rank"),
        Seq(("p", "x1", 21L)).toDF("q", "doc", "g"),
        "q", "doc", "rank", "g", k).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("grade bound"), s"got: $msgs")
    val ok = EvalMetrics.ndcgAtK(pres.toDF("q", "doc", "rank"),
      Seq(("p", "x1", 20L)).toDF("q", "doc", "g"),
      "q", "doc", "rank", "g", k).collect()
    assert(ok.length == 1)
  }
}
