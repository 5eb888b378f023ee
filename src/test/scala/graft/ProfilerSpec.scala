package graft

import org.apache.spark.sql.functions._

import graft.ops.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("discrete quantiles pick the ceil(n·p/100)-ranked row per group") {
    // group a: values 1..10 → p50 = row 5, p90 = row 9, p100 = row 10
    val df = (1 to 10).map(v => ("a", v.toLong, v.toLong)) .toDF("g", "id", "v")
    val out = Profiler.discreteQuantiles(df, "g", col("v"), Seq(50, 90, 100))
      .orderBy("pct").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 50L, 5L), ("a", 90L, 9L), ("a", 100L, 10L)))
  }

  test("quantiles are layout-independent under value ties") {
    // all values equal: the compaction collapses the tie into one row,
    // so the chosen VALUE is stable under any partitioning
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toLong, 7L)).toDF("g", "id", "v")
    val a = Profiler.discreteQuantiles(df.repartition(3), "g", col("v"), Seq(50))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val b = Profiler.discreteQuantiles(df.repartition(17), "g", col("v"), Seq(50))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.forall(_._3 == 7L))
  }

  test("duplicated values land the rank inside the right cumulative interval") {
    // group a: 1,2,2,2,3 (n=5) → p50 rank 3 → value 2; p90 rank 5 → 3;
    // p20 rank 1 → 1. The compacted frame has 3 rows, the answers must
    // match the row-level rank formula exactly.
    val df = Seq(1L, 2L, 2L, 2L, 3L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }.toDF("g", "id", "v")
    val out = Profiler.discreteQuantiles(df, "g", col("v"), Seq(20, 50, 90))
      .orderBy("pct").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 20L, 1L), ("a", 50L, 2L), ("a", 90L, 3L)))
  }

  test("a single row answers every percentile with its own value") {
    val df = Seq(("a", 1L, 42L)).toDF("g", "id", "v")
    val out = Profiler.discreteQuantiles(df, "g", col("v"), Seq(1, 50, 99))
    assert(out.select("value").as[Long].collect().toSeq == Seq(42L, 42L, 42L))
  }

  test("histogram quantiles bracket the exact quantile within one bin") {
    val rnd = new scala.util.Random(57L)
    val rows = (1 to 3000).map(i => (s"g${i % 2}", (rnd.nextInt(500)).toLong))
    val df = rows.toDF("g", "v")
    val w = 16L
    val pcts = Seq(25, 50, 90, 99)
    val got = Profiler.histogramQuantiles(df, "g", col("v"), pcts, w)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 2 * pcts.size)
    // model: exact quantile must land inside the reported bracket, and
    // the bracket must be the exact quantile's own bin
    val byG = rows.groupBy(_._1)
    got.foreach { case (g, p, lo, hi) =>
      assert(hi - lo == w - 1)
      val sorted = byG(g).map(_._2).sorted
      val r = (sorted.size.toLong * p + 99) / 100
      val exact = sorted((r - 1).toInt)
      assert(exact >= lo && exact <= hi,
        s"$g p$p: exact $exact outside [$lo,$hi]")
    }
  }

  test("histogram cells merge: halves unioned equal the whole (mergeable state)") {
    val rows = (1 to 1000).map(i => ("g", (i % 97).toLong))
    val (h1, h2) = rows.splitAt(500)
    val whole = Profiler.histogramCells(rows.toDF("g", "v"), "g", col("v"), 8L)
      .as[(String, Long, Long)].collect().toSet
    val merged = Profiler.histogramCells(h1.toDF("g", "v"), "g", col("v"), 8L)
      .unionByName(Profiler.histogramCells(h2.toDF("g", "v"), "g", col("v"), 8L))
      .groupBy("g", "bin").agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("histogram drift: 0 for identical groups, 2e6 for disjoint, symmetric model") {
    // identical distributions → every share matches → 0
    val same = ((1 to 200).map(i => ("a", (i % 50).toLong)) ++
      (1 to 200).map(i => ("b", (i % 50).toLong))).toDF("g", "v")
    val d0 = Profiler.histogramDriftPpm(same, "g", col("v"), 8L)
      .as[(String, String, Long)].collect()
    assert(d0.toSeq == Seq(("a", "b", 0L)))
    // disjoint supports → Σ shares_a + Σ shares_b ≈ 2e6 (floor-div slack)
    val disj = ((1 to 100).map(i => ("a", (i % 20).toLong)) ++
      (1 to 100).map(i => ("b", 1000L + (i % 20)))).toDF("g", "v")
    val d2 = Profiler.histogramDriftPpm(disj, "g", col("v"), 8L)
      .as[(String, String, Long)].collect().head._3
    assert(d2 > 1990000L && d2 <= 2000000L, s"disjoint drift $d2")
    // random fixture vs in-memory model
    val rnd = new scala.util.Random(19L)
    val rows = (1 to 600).map(i =>
      (s"g${i % 3}", (rnd.nextInt(if (i % 3 == 0) 100 else 60)).toLong))
    val got = Profiler.histogramDriftPpm(rows.toDF("g", "v"), "g", col("v"), 8L)
      .as[(String, String, Long)].collect().toSet
    val cells = rows.groupBy(r => (r._1, r._2 / 8)).view.mapValues(_.size.toLong).toMap
    val ns = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def share(g: String, bin: Long) =
      cells.get((g, bin)).map(_ * 1000000L / ns(g)).getOrElse(0L)
    val gs = ns.keys.toSeq.sorted
    val model = (for {
      i <- gs.indices; j <- (i + 1) until gs.size
      bins = cells.keys.collect { case (g, b) if g == gs(i) || g == gs(j) => b }.toSet
    } yield (gs(i), gs(j),
      bins.toSeq.map(b => math.abs(share(gs(i), b) - share(gs(j), b))).sum)).toSet
    assert(got == model)
  }

  test("matches the row-level rank formula on a random skewed fixture") {
    val rnd = new scala.util.Random(31L)
    val rows = (1 to 4000).map { i =>
      // heavy duplication: ~40 distinct values across 2 groups
      (s"g${i % 2}", i.toLong, (rnd.nextInt(40) + 1).toLong)
    }
    val df = rows.toDF("g", "id", "v")
    val pcts = Seq(1, 25, 50, 75, 99, 100)
    val got = Profiler.discreteQuantiles(df, "g", col("v"), pcts)
      .as[(String, Long, Long)].collect().toSet
    // brute-force model: sort each group's values, pick ceil(n·p/100)
    val model = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._3).sorted
      pcts.map { p =>
        val r = (sorted.size.toLong * p + 99) / 100
        (g, p.toLong, sorted((r - 1).toInt))
      }
    }.toSet
    assert(got == model)
  }

  test("cdfPpm: strictly-below cumulative share, per group, floor ppm") {
    val df = Seq(
      ("en", 10L), ("en", 10L), ("en", 20L), ("en", 30L),
      ("fr", 5L), ("fr", 7L)
    ).toDF("lang", "len")
    val out = Profiler.cdfPpm(df, "lang", col("len"))
      .as[(String, Long, Long, Long)].collect().toSet
    // en: n=4 → 10:0 below (0), 20:2 below (500000), 30:3 below (750000)
    // fr: n=2 → 5:0, 7:1 below (500000)
    assert(out == Set(
      ("en", 10L, 2L, 0L), ("en", 20L, 1L, 500000L), ("en", 30L, 1L, 750000L),
      ("fr", 5L, 1L, 0L), ("fr", 7L, 1L, 500000L)))
    // the compaction invariant: one output row per (group, distinct value)
    assert(Profiler.cdfPpm(df, "lang", col("len")).count() == 5L)
  }

  test("columnProfile: counts, NDV, lexicographic min/max, nulls excluded") {
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, Some("a"), None),
      (3L, None, Some(9L)),
      (4L, Some("a"), Some(100L))
    ).toDF("id", "name", "qty")
    val out = Profiler.columnProfile(df, Seq("id", "name", "qty"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("id") == ((4L, 4L, "1", "4")))
    assert(out("name") == ((3L, 2L, "a", "b")))
    // lexicographic contract: "10" < "100" < "9" as strings
    assert(out("qty") == ((3L, 3L, "10", "9")))
  }

  test("iqrOutlierFences: hand-checked quartiles and fence counts") {
    // group a: 1..8 plus 100 (n=9) → q1 = rank ceil(9·25/100)=3 → 3,
    // q3 = rank ceil(9·75/100)=7 → 7; IQR = 4, fences (k=1.5):
    // lo = 3 − 6 = −3, hi = 7 + 6 = 13 → only 100 is above.
    val df = ((1L to 8L) :+ 100L).map(v => ("a", v)).toDF("g", "v")
    val out = Profiler.iqrOutlierFences(df, "g", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 3L, 7L, 9L, 0L, 1L)))
  }

  test("iqrOutlierFences matches a brute-force model across groups") {
    val rnd = new scala.util.Random(83L)
    val rows = (1 to 2000).map { i =>
      val heavy = if (rnd.nextInt(50) == 0) rnd.nextInt(5000).toLong else 0L
      (s"g${i % 3}", rnd.nextInt(200).toLong + heavy)
    }
    val got = Profiler.iqrOutlierFences(rows.toDF("g", "v"), "g", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val model = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      def q(p: Long) = sorted((((n * p + 99) / 100) - 1).toInt)
      val (q1, q3) = (q(25), q(75))
      val below = sorted.count(v => 10 * v < 10 * q1 - 15 * (q3 - q1)).toLong
      val above = sorted.count(v => 10 * v > 10 * q3 + 15 * (q3 - q1)).toLong
      (g, q1, q3, n, below, above)
    }.toSet
    assert(got == model)
  }

  test("iqrOutlierFences is layout-independent") {
    val df = (1 to 500).map(i => (s"g${i % 2}", (i * i % 97).toLong)).toDF("g", "v")
    val a = Profiler.iqrOutlierFences(df.repartition(3), "g", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val b = Profiler.iqrOutlierFences(df.repartition(17), "g", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("embeddingDimStats: hand-checked two-quantum moments") {
    val feats = Seq(
      (1L, Array(1.5f, -0.5f)),
      (2L, Array(0.25f, 2.0f))
    ).toDF("id", "v")
    val out = Profiler.embeddingDimStats(feats, "v")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((2L, 1750000L, 2312500L, 250000L, 1500000L)))
    assert(out(2L) == ((2L, 1500000L, 4250000L, -500000L, 2000000L)))
  }

  test("winsorize: values clip to the exact group percentile band") {
    val df = (1 to 10).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "id", "v0")
    val out = Profiler.winsorize(df, "g", "id", col("v0"), 20, 90)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    // lo = rank (10·20+99)div100 = 2 → 2.0; hi = rank 9 → 9.0
    assert(out(1L) == 2.0 && out(2L) == 2.0)
    assert(out(10L) == 9.0 && out(9L) == 9.0)
    assert((3 to 8).forall(i => out(i.toLong) == i.toDouble))
  }

  test("quantileNormalize: group ranks map onto the global grid") {
    // group a: 1..8 (low), group b: 101..108 (high); global grid spans both
    val rows = (1 to 8).map(i => ("a", i.toLong, i.toLong)) ++
      (1 to 8).map(i => ("b", 100L + i, 100L + i))
    val df = rows.toDF("g", "id", "v0")
    val out = Profiler.quantileNormalize(df, "g", "id", col("v0"), 4L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    assert(out.size == 16)
    // same within-group rank → same pct and SAME global target
    (1 to 8).foreach { i =>
      val (prA, pctA, vnA) = out(("a", i.toLong))
      val (prB, pctB, vnB) = out(("b", 100L + i))
      assert(prA == prB && pctA == pctB && vnA == vnB, s"rank $i diverged")
    }
    // highest rank in each group lands on the global top bin (bin_lo of 108)
    assert(out(("a", 8L))._3 == (108L / 4) * 4)
    // pr_ppm is inclusive: rank 8 of 8 = exactly 1e6 → pct 100
    assert(out(("a", 8L))._1 == 1000000L && out(("a", 8L))._2 == 100L)
  }

  test("datasetDigest: layout-independent; any single-cell change shows") {
    val rows = (1 to 500).map(i => (i.toLong, i * 7L % 97, i * 13L % 89))
    val df = rows.toDF("a", "b", "c")
    val cols = Seq(col("a"), col("b"), col("c"))
    def digest(d: org.apache.spark.sql.DataFrame) =
      Profiler.datasetDigest(d, pmod(col("a"), lit(4L)), cols)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val base = digest(df)
    assert(base.size == 4 && base.toSeq.map(_._2).sum == 500)
    // identical content, different layout → identical digest
    assert(digest(df.repartition(13).sortWithinPartitions("c")) == base)
    // one changed cell → that shard's digest differs, others unchanged
    val mutated = rows.map { case (a, b, c) =>
      if (a == 250L) (a, b, c + 1) else (a, b, c) }.toDF("a", "b", "c")
    val changed = digest(mutated)
    assert(changed != base)
    assert((base -- changed).map(_._1) == Set(250L % 4))
    // hand-check one row's hash: fold((0*31 + v) % p)
    val p = 1000000007L
    val one = Profiler.datasetDigest(Seq((3L, 5L, 9L)).toDF("a", "b", "c"),
        lit(0L), cols).as[(Long, Long, Long, Long, Long, Long)].collect().head
    val h = ((3L * 31 + 5L) % p * 31 + 9L) % p
    assert(one == ((0L, 1L, h, h, h, h)))
  }

  test("keySkewProfile: ranks, share and ratio-to-mean in exact ppm") {
    import graft.ops.Profiler
    // key "a" x6, "b" x3, "c" x1: total 10, 3 keys, mean 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Profiler.keySkewProfile(df, col("k"), topK = 2)
      .as[(Int, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1, "a", 6L, 600000L, 1800000L),
      (2, "b", 3L, 300000L, 900000L)))
    // uniform keys read exactly 10^6 ppm of the mean
    val uni = (1 to 4).flatMap(i => Seq.fill(5)(s"k$i")).toDF("k")
    val u = Profiler.keySkewProfile(uni, col("k"), topK = 4)
      .as[(Int, String, Long, Long, Long)].collect()
    assert(u.forall(r => r._4 == 250000L && r._5 == 1000000L))
  }

  test("fdViolations: only multi-valued keys, majority by (cnt desc, val asc)") {
    import graft.ops.Profiler
    val df = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "de"),        // violated: majority en
      ("s2", "fr"), ("s2", "fr"),                        // clean
      ("s3", "pt"), ("s3", "es"))                        // tie: majority es (asc)
      .toDF("src", "lang")
    val out = Profiler.fdViolations(df, col("src"), col("lang"))
      .as[(String, Long, Long, String, Long)].collect().toSet
    assert(out == Set(
      ("s1", 3L, 2L, "en", 1L),
      ("s3", 2L, 2L, "es", 1L)))
  }

  test("contractChecks: one pass, per-check violation counts and ppm") {
    import graft.ops.Profiler
    val df = Seq(
      (1L, "abc", 3L), (2L, "abcd", 3L), (3L, "", 0L), (4L, "xy", 9L))
      .toDF("id", "s", "n_chars")
    val out = Profiler.contractChecks(df, Seq(
        "len_matches" -> (col("n_chars") =!= length(col("s"))),
        "nonempty" -> (length(col("s")) === 0)))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("len_matches", 4L, 2L, 500000L),
      ("nonempty", 4L, 1L, 250000L)))
  }

  test("giniDiversityPpm: one-value column is 0; uniform over k reads 1e6*(1-1/k)") {
    import graft.ops.Profiler
    val df = (1 to 12).map(i => ("only", s"v${i % 4}")).toDF("mono", "quad")
    val out = Profiler.giniDiversityPpm(df, Seq("mono", "quad"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("mono") == (("mono", 12L, 1L, 0L)))
    assert(out("quad") == (("quad", 12L, 4L, 750000L)))
  }

  test("kAnonymityAudit: groups below k counted with their row mass") {
    val df = (Seq.fill(12)(("en", "s1")) ++ Seq.fill(3)(("en", "s2")) ++
      Seq.fill(1)(("es", "s1")) ++ Seq.fill(10)(("es", "s2")))
      .toDF("lang", "source")
    val out = Profiler.kAnonymityAudit(df, Seq("lang", "source"), 10L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // groups: 12, 3, 1, 10 -> below 10: the 3 and the 1 (4 rows at risk)
    assert(out == ((10L, 4L, 26L, 2L, 4L, 1L)))
  }

  test("lDiversityAudit: homogeneous classes flagged even when k-anonymous") {
    import graft.ops.Profiler
    // class A: 10 rows, ONE sensitive value (k-anonymous at 10, l=1);
    // class B: 4 rows, 4 distinct values; class C: 5 rows, 2 values.
    val df = (Seq.fill(10)(("en", "s1", 100.0)) ++
      (1 to 4).map(i => ("en", "s2", i * 1.5)) ++
      Seq(("es", "s1", 1.0), ("es", "s1", 1.0), ("es", "s1", 2.0),
        ("es", "s1", 2.0), ("es", "s1", 2.0)))
      .toDF("lang", "source", "bal")
    val out = Profiler.lDiversityAudit(df, Seq("lang", "source"), "bal", 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // l-values: A=1, B=4, C=2 -> below 3: A and C (15 rows at risk)
    assert(out == ((3L, 3L, 19L, 2L, 15L, 1L)))
    val e = intercept[IllegalArgumentException] {
      Profiler.lDiversityAudit(df, Seq("lang", "bal"), "bal", 3L)
    }
    assert(e.getMessage.contains("quasi-identifier"))
  }

  test("tClosenessAudit: EMD exact on a hand grid; mirrored class passes") {
    import graft.ops.Profiler
    // bins of width 10: A all in bin 0, B all in bin 1, C split 2/2 —
    // C mirrors the global 6/6 distribution exactly (EMD 0); A and B
    // each read |4·12−6·4|·1e6/(1·4·12) = 500000.
    val rows = Seq.fill(4)(("A", "x", 3L)) ++ Seq.fill(4)(("B", "x", 13L)) ++
      Seq.fill(2)(("C", "x", 7L)) ++ Seq.fill(2)(("C", "x", 17L))
    val out = Profiler.tClosenessAudit(rows.toDF("qa", "qb", "v"),
        Seq("qa", "qb"), col("v"), 10L, 400000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out == ((400000L, 2L, 3L, 12L, 2L, 8L, 500000L)))
    // negative values bin sign-split floor; a lone class IS the global
    // distribution, so EMD = 0 even across the sign boundary
    val solo = Profiler.tClosenessAudit(
        Seq(("A", -10L), ("A", 5L)).toDF("q", "v"), Seq("q"), col("v"),
        10L, 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(solo == ((0L, 2L, 1L, 2L, 0L, 0L, 0L)))
  }

  test("ksStatPpm: hand extremes + all-pairs BigInt model on a seeded fixture") {
    import graft.ops.Profiler
    def run(rows: Seq[(String, Long)]): Map[(String, String), (Long, Long, Long)] =
      Profiler.ksStatPpm(rows.toDF("g", "v").repartition(5), "g", col("v"))
        .as[(String, String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // identical distributions -> 0; fully separated -> exactly 1e6
    val same = (1 to 30).flatMap(i => Seq(("A", i.toLong), ("B", i.toLong)))
    assert(run(same)(("A", "B")) == ((30L, 30L, 0L)))
    val split = (1 to 20).map(i => ("A", i.toLong)) ++
      (1 to 10).map(i => ("B", i.toLong + 100))
    assert(run(split)(("A", "B")) == ((20L, 10L, 1000000L)))
    // seeded three-group fixture vs the exact rational model
    val rnd = new scala.util.Random(20260816L)
    val fx = (1 to 200).map(_ => ("A", rnd.nextInt(40).toLong)) ++
      (1 to 150).map(_ => ("B", rnd.nextInt(40).toLong + 5)) ++
      (1 to 80).map(_ => ("C", (rnd.nextInt(20) * 2).toLong))
    def brute(a: Seq[Long], b: Seq[Long]): Long = {
      val na = a.size.toLong; val nb = b.size.toLong
      val vs = (a ++ b).distinct.sorted
      val d = vs.map(v => (BigInt(a.count(_ <= v)) * nb -
        BigInt(b.count(_ <= v)) * na).abs).max
      ((d * 1000000) / (BigInt(na) * nb)).toLong
    }
    val byG = fx.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = run(fx)
    for (a <- Seq("A", "B"); b <- Seq("B", "C") if a < b)
      assert(got((a, b)) ==
        ((byG(a).size.toLong, byG(b).size.toLong, brute(byG(a), byG(b)))),
        s"pair ($a,$b)")
    assert(got(("A", "B"))._3 > 0L)
  }

  /** The in-memory qsketch cell key (subBits=4) of a non-negative v. */
  private def cellOf(v: Long): (Long, Long) = {
    if (v == 0L) (-1L, 0L)
    else {
      val e = 63L - java.lang.Long.numberOfLeadingZeros(v)
      (e, v >> math.max(e - 4L, 0L))
    }
  }

  test("ksStatFromCells: == BigInt cell model; bracketed by the exact KS") {
    import graft.ops.{Profiler, Sketches}
    val rnd = new scala.util.Random(20260817L)
    val fx = (1 to 300).map(_ => ("A", rnd.nextInt(5000).toLong)) ++
      (1 to 220).map(_ => ("B", rnd.nextInt(5000).toLong + 800)) ++
      (1 to 90).map(_ => ("C", (rnd.nextInt(100) * 37).toLong))
    val df = fx.toDF("g", "v").repartition(5)
    val got = Profiler.ksStatFromCells(
        Sketches.qsketchCells(df, "g", col("v"), subBits = 4), "g")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val byG = fx.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def cellsModel(a: Seq[Long], b: Seq[Long]): Long = {
      val ca = a.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      val na = a.size.toLong; val nb = b.size.toLong
      val keys = (ca.keySet ++ cb.keySet).toSeq.sorted
      var cuma = 0L; var cumb = 0L; var d = BigInt(0)
      keys.foreach { k =>
        cuma += ca.getOrElse(k, 0L); cumb += cb.getOrElse(k, 0L)
        d = d.max((BigInt(cuma) * nb - BigInt(cumb) * na).abs)
      }
      ((d * 1000000) / (BigInt(na) * nb)).toLong
    }
    def exactModel(a: Seq[Long], b: Seq[Long]): Long = {
      val na = a.size.toLong; val nb = b.size.toLong
      val d = (a ++ b).distinct.sorted.map(v =>
        (BigInt(a.count(_ <= v)) * nb - BigInt(b.count(_ <= v)) * na).abs).max
      ((d * 1000000) / (BigInt(na) * nb)).toLong
    }
    // the worst a cell can hide is its own mass share from each side
    def bracketPpm(a: Seq[Long], b: Seq[Long]): Long = {
      val ca = a.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      (ca.keySet ++ cb.keySet).toSeq.map(k =>
        1000000L * ca.getOrElse(k, 0L) / a.size +
          1000000L * cb.getOrElse(k, 0L) / b.size).max + 2L
    }
    for (p <- Seq(("A", "B"), ("A", "C"), ("B", "C"))) {
      val (a, b) = (byG(p._1), byG(p._2))
      val (na, nb, ks) = got(p)
      assert((na, nb) == ((a.size.toLong, b.size.toLong)), s"totals $p")
      assert(ks == cellsModel(a, b), s"cell model $p")
      val exact = exactModel(a, b)
      assert(ks <= exact && exact <= ks + bracketPpm(a, b),
        s"bracket $p: cells $ks exact $exact bound ${bracketPpm(a, b)}")
    }
  }

  test("ksStatFromCells: values hidden inside one cell read 0 — the contract's edge") {
    import graft.ops.{Profiler, Sketches}
    // 1024 and 1087 share cell (e=10, m=16): exact KS is 1e6, the
    // cell read is 0, and the documented bracket (sa+sb = 2e6) holds —
    // the resolution price the Scaladoc pins, not a wrong answer.
    val df = ((1 to 10).map(_ => ("A", 1024L)) ++
      (1 to 10).map(_ => ("B", 1087L))).toDF("g", "v")
    val got = Profiler.ksStatFromCells(
        Sketches.qsketchCells(df, "g", col("v"), subBits = 4), "g")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("A", "B", 10L, 10L, 0L)))
  }

  test("driftFromCells == BigInt share model; quantileShiftFromCells brackets exact quantiles") {
    import graft.ops.{Profiler, Sketches}
    val rnd = new scala.util.Random(20260818L)
    val fx = (1 to 240).map(_ => ("A", rnd.nextInt(3000).toLong)) ++
      (1 to 160).map(_ => ("B", rnd.nextInt(3000).toLong + 500))
    val df = fx.toDF("g", "v").repartition(4)
    val cells = Sketches.qsketchCells(df, "g", col("v"), subBits = 4)
    val byG = fx.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // L1 on floor-div cell shares
    val ca = byG("A").groupBy(cellOf).view.mapValues(_.size.toLong).toMap
    val cb = byG("B").groupBy(cellOf).view.mapValues(_.size.toLong).toMap
    val expL1 = (ca.keySet ++ cb.keySet).toSeq.map { k =>
      math.abs(1000000L * ca.getOrElse(k, 0L) / byG("A").size -
        1000000L * cb.getOrElse(k, 0L) / byG("B").size)
    }.sum
    val gotL1 = Profiler.driftFromCells(cells, "g")
      .as[(String, String, Long)].collect().toSeq
    assert(gotL1 == Seq(("A", "B", expL1)))
    // each side's est must contain the exact discrete quantile
    val shifts = Profiler.quantileShiftFromCells(cells, "g", Seq(50, 90), 4)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(shifts.length == 2)
    def exactQ(vs: Seq[Long], pct: Int): Long = {
      val s = vs.sorted
      s((math.ceil(s.size.toDouble * pct / 100).toInt - 1).max(0))
    }
    shifts.foreach { case (ga, gb, pct, estA, estB, shift, wMax) =>
      assert(shift == estB - estA)
      val (qa, qb) = (exactQ(byG(ga), pct.toInt), exactQ(byG(gb), pct.toInt))
      assert(estA <= qa && qa < estA + wMax, s"$ga p$pct: est $estA exact $qa")
      assert(estB <= qb && qb < estB + wMax, s"$gb p$pct: est $estB exact $qb")
    }
  }

  test("aucFromCells == BigInt midrank model; identity and separation read exact") {
    import graft.ops.{Profiler, Sketches}
    val rnd = new scala.util.Random(20260821L)
    val fx = (1 to 250).map(_ => ("A", rnd.nextInt(4000).toLong)) ++
      (1 to 180).map(_ => ("B", rnd.nextInt(4000).toLong + 700))
    val cells = Sketches.qsketchCells(fx.toDF("g", "v"), "g", col("v"), 4)
    val got = Profiler.aucFromCells(cells, "g")
      .as[(String, String, Long, Long, Long)].collect().head
    val ca = fx.filter(_._1 == "A").map(t => cellOf(t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = fx.filter(_._1 == "B").map(t => cellOf(t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = 250L; val nb = 180L
    var cumb = 0L; var u2 = BigInt(0)
    (ca.keySet ++ cb.keySet).toSeq.sorted.foreach { k =>
      val a = ca.getOrElse(k, 0L); val b = cb.getOrElse(k, 0L)
      cumb += b
      u2 += BigInt(a) * (2 * cumb - b)
    }
    val exp = (u2 * 1000000 / (BigInt(2) * na * nb)).toLong
    assert(got == (("A", "B", na, nb, exp)))
    // identical cell sets: no dominance -> exactly 500000
    val same = (1 to 40).flatMap(i => Seq(("A", i.toLong * 7), ("B", i.toLong * 7)))
    val sameGot = Profiler.aucFromCells(
        Sketches.qsketchCells(same.toDF("g", "v"), "g", col("v"), 4), "g")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(sameGot._5 == 500000L)
    // full separation across cells: A below B -> 0
    val split = (1 to 20).map(i => ("A", i.toLong)) ++
      (1 to 20).map(i => ("B", i.toLong + 100000))
    val splitGot = Profiler.aucFromCells(
        Sketches.qsketchCells(split.toDF("g", "v"), "g", col("v"), 4), "g")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(splitGot._5 == 0L)
  }

  test("chi2FromCells == BigInt floor model; identical groups read 0; bound raises") {
    import graft.ops.{Profiler, Sketches}
    val rnd = new scala.util.Random(20260822L)
    val fx = (1 to 300).map(_ => ("A", rnd.nextInt(3000).toLong)) ++
      (1 to 200).map(_ => ("B", rnd.nextInt(3000).toLong + 400))
    val cells = Sketches.qsketchCells(fx.toDF("g", "v"), "g", col("v"), 4)
    val got = Profiler.chi2FromCells(cells, "g")
      .as[(String, String, Long, Long, Long, Long)].collect().head
    val ca = fx.filter(_._1 == "A").map(t => cellOf(t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = fx.filter(_._1 == "B").map(t => cellOf(t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = 300L; val nb = 200L
    val keys = (ca.keySet ++ cb.keySet).toSeq
    val ss = keys.map { k =>
      val a = ca.getOrElse(k, 0L); val b = cb.getOrElse(k, 0L)
      val d = BigInt(a) * nb - BigInt(b) * na
      d * d / (a + b)
    }.sum
    val exp = (ss * 1000 / (BigInt(na) * nb)).toLong
    assert(got == (("A", "B", na, nb, keys.size.toLong - 1, exp)))
    assert(got._6 > 0L, "shifted fixture must register")
    // identical groups: every cell difference is 0
    val same = (1 to 50).flatMap(i => Seq(("A", i.toLong * 13), ("B", i.toLong * 13)))
    val sameGot = Profiler.chi2FromCells(
        Sketches.qsketchCells(same.toDF("g", "v"), "g", col("v"), 4), "g")
      .as[(String, String, Long, Long, Long, Long)].collect().head
    assert(sameGot._6 == 0L)
    // the 1e8 per-group bound raises loudly (constant value -> one cell)
    val over = spark.range(100000002L)
      .select(org.apache.spark.sql.functions.when(col("id") === 0L, "B")
        .otherwise("A").as("g"), org.apache.spark.sql.functions.lit(7L).as("v"))
    val e = intercept[Throwable] {
      Profiler.chi2FromCells(
        Sketches.qsketchCells(over, "g", col("v"), 4), "g").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("group-size bound"), s"got: $msgs")
  }

  test("bootstrapCi == the deterministic hash-Poisson model") {
    import graft.ops.Profiler
    val rnd = new scala.util.Random(20260825L)
    val reps = 50
    val fx = (1 to 2).flatMap(g => (1 to 120).map(i =>
      (s"g$g", (g * 1000 + i).toLong, rnd.nextInt(500).toLong - 30)))
    val got = Profiler.bootstrapCi(fx.toDF("g", "id", "v"), "g",
        col("id"), col("v"), reps)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect()
    def polyhash(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) { h = (h * 31 + s.codePointAt(i)) % 1000000007L; i += 1 }
      h
    }
    val cuts = Seq(367879443L, 735758887L, 919698609L, 981011849L, 996340160L)
    def weight(id: Long, rep: Int): Long = {
      val h = polyhash(s"$id#$rep")
      cuts.indexWhere(h < _) match { case -1 => 5L case w => w.toLong }
    }
    def floorDiv(a: BigInt, b: BigInt): Long =
      ((a - (((a % b) + b) % b)) / b).toLong
    for (g <- Seq("g1", "g2")) {
      val rows = fx.filter(_._1 == g)
      val means = (0 until reps).map { r =>
        val ws = rows.map(t => (weight(t._2, r), t._3))
        val n = ws.map(_._1).sum
        if (n == 0) 0L
        else floorDiv(ws.map(t => BigInt(t._1) * t._2).sum * 1000000, n)
      }.sorted
      val exp = (g, rows.size.toLong,
        floorDiv(BigInt(rows.map(_._3).sum) * 1000000, rows.size),
        means((reps * 5 + 99) / 100 - 1), means((reps * 95 + 99) / 100 - 1))
      assert(got.find(_._1 == g).get == exp, g)
      assert(exp._4 <= exp._5, "band ordered")
    }
  }

  test("dataCard: one-row summary reconciles with hand computation") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"), (2L, "a b c", "en", "s1"),      // exact dup pair
      (3L, "x y", "en", "s2"), (4L, "p q r s t", "es", "s2"),
      (5L, "m", "es", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Profiler.dataCard(docs, "doc_id", "text", "lang", "source")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val r = out.head
    // 5 docs, 3+3+2+5+1 = 14 tokens, 2 langs, 3 sources, 4 distinct
    // texts -> 800000 ppm; lengths sorted 1,2,3,3,5 -> median rank
    // ceil(250/100)=3 -> value 3; lang counts (3,2) on 5 ->
    // 1e6 - (9+4)*1e6/25 = 480000
    assert(r == ((5L, 14L, 2L, 3L, 800000L, 3L, 480000L)))
  }

  test("benfordPpm: string first digit, ppm shares, zeros excluded, absent digits absent") {
    val df = Seq(10L, 19L, 150L, 2L, 250L, 0L, -30L, 999L, 1L)
      .map(Tuple1(_)).toDF("v")
    val out = Profiler.benfordPpm(df, Seq("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    // 8 nonzero values; digits: 1×4 (10,19,150,1), 2×2 (2,250), 3×1 (-30), 9×1
    assert(out(1L) == ((4L, 500000L, 301030L, 198970L)))
    assert(out(2L) == ((2L, 250000L, 176091L, 73909L)))
    assert(out(3L) == ((1L, 125000L, 124939L, 61L)))
    assert(out(9L) == ((1L, 125000L, 45757L, 79243L)))
    assert(out.keySet == Set(1L, 2L, 3L, 9L), "absent digits have no row")
    // a genuinely log-spanning column hugs the law; digit 1 dominates
    val rnd = new scala.util.Random(67)
    val ben = (1 to 3000).map(_ =>
      Tuple1(math.floor(math.pow(10.0, rnd.nextDouble() * 5)).toLong))
      .toDF("v")
    val big = Profiler.benfordPpm(ben, Seq("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._6).toMap
    assert(big.size == 9 && big.values.forall(_ < 40000),
      s"log-uniform sample should sit within 4% of Benford: $big")
  }

  test("typeSniff: class counts, verdict priority, blanks and empty columns") {
    val df = Seq(
      ("1", "1.5", "2024-01-31", "31/01/2024", "true", "x", null: String),
      ("-42", "2,75", "2023-12-01", "01/12/2023", "no", "1", ""),
      ("7", "3", "bad", "13/13/9999", "T", "z", " "),
      (null: String, "0.0", "2022-05-05", "05/05/2022", "false", "7", null: String))
      .toDF("ci", "cd", "cdi", "cdb", "cb", "cm", "ce")
    val out = Profiler.typeSniff(df,
        Seq("ci", "cd", "cdi", "cdb", "cb", "cm", "ce"), thresholdPct = 75)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("ci") == (("ci", 4L, 1L, 3L, 0L, 0L, 0L, 0L, "int")))
    // "3" is int; ints pool into the decimal verdict
    assert(out("cd") == (("cd", 4L, 0L, 1L, 3L, 0L, 0L, 0L, "decimal")))
    // 3 of 4 non-blank = exactly the 75% threshold -> date_iso
    assert(out("cdi") == (("cdi", 4L, 0L, 0L, 0L, 3L, 0L, 0L, "date_iso")))
    // syntactic sniff: 13/13/9999 still matches the dd/mm/yyyy shape
    assert(out("cdb") == (("cdb", 4L, 0L, 0L, 0L, 0L, 4L, 0L, "date_br")))
    assert(out("cb") == (("cb", 4L, 0L, 0L, 0L, 0L, 0L, 4L, "bool")))
    assert(out("cm")._9 == "string")
    // blank-only column: trims to empty, verdict 'empty'
    assert(out("ce") == (("ce", 4L, 4L, 0L, 0L, 0L, 0L, 0L, "empty")))
  }

  test("madOutliers matches the brute-force model; robust to a garbage majority tail") {
    def brute(vals: Seq[Long], kTenths: Long): (Long, Long, Long, Long) = {
      def med(xs: Seq[Long]): Long = {
        val s = xs.sorted; s((((xs.size * 50 + 99) / 100) - 1).toInt)
      }
      val m = med(vals)
      val mad = med(vals.map(v => math.abs(v - m)))
      (m, mad, vals.size.toLong,
        vals.count(v => math.abs(v - m) * 10 > kTenths * mad).toLong)
    }
    val rnd = new scala.util.Random(61)
    val rows = (1 to 120).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val v = if (i % 17 == 0) 5000L + rnd.nextInt(100)   // spikes
              else 100L + rnd.nextInt(40)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val got = Profiler.madOutliers(df.repartition(7), "g", col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val byG = rows.groupBy(_._1)
    assert(got == byG.map { case (g, rs) =>
      val (m, mad, n, o) = brute(rs.map(_._2), 30L); g -> ((m, mad, n, o)) })
    // spikes are actually flagged
    assert(got.values.exists(_._4 > 0))
    // IQR's known failure: >25% contamination can hide in the quartiles
    // while MAD (50% breakdown) still centers on the clean mass
    val dirty = (1 to 60).map(i =>
      ("x", if (i <= 35) 100L else 9000L + i)) // 42% garbage
    val gm = Profiler.madOutliers(dirty.toDF("g", "v"), "g", col("v"))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(gm._2 == 100L && gm._5 == 25L, s"median ${gm._2}, out ${gm._5}")
  }

  test("piiDensityBySource: counts, doc flags and per-mtok rate roll up per source") {
    val docs = Seq(
      ("s1", "write to bob@example.com or call 555-1234 now"),   // 1 email 1 phone, 8 toks
      ("s1", "clean text here"),                                  // 3 toks
      ("s2", "no pii at all in this one")                         // 7 toks
    ).toDF("source", "text")
    val got = graft.ops.Profiler.piiDensityBySource(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 2L, 10L, 1L, 1L, 1L, 200000L),
      ("s2", 1L, 7L, 0L, 0L, 0L, 0L)))
  }

  test("trimmedMean: rank-clipped blocks, straddling mass, signed truncation") {
    // 1..10 once each, trim 10%: keep ranks 2..9 -> 2+..+9 = 44, mean 5
    val a = (1 to 10).map(v => ("a", v.toLong))
    // blocks straddle the 20% fences: -10 x3, 0 x4, 10 x3 -> keep 1+4+1
    val b = Seq.fill(3)(("b", -10L)) ++ Seq.fill(4)(("b", 0L)) ++
      Seq.fill(3)(("b", 10L))
    val got = graft.ops.Profiler.trimmedMean(
        (a ++ b).toDF("g", "v").repartition(5), "g", col("v"), trimPct = 10)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.head == ("a", 10L, 8L, 44L, 5L))
    // group b at 10%: lo=1, hi=9 -> kept 2+4+2, sum 0
    assert(got(1) == ("b", 10L, 8L, 0L, 0L))
    // negative sum truncates toward zero on both engines
    val c = (Seq.fill(4)(("c", -5L)) ++ Seq(("c", 1L))).toDF("g", "v")
    val gc = graft.ops.Profiler.trimmedMean(c, "g", col("v"), trimPct = 0)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(gc == ("c", 5L, 5L, -19L, -3L))
  }

  test("robustZ: median/MAD standardization per row, MAD-0 group reads 0") {
    // group g: values 1,2,3,4,100 -> median 3, deviations 2,1,0,1,97 -> MAD 1
    val g = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 100L))
      .map { case (id, v) => ("g", id, v) }
    // group k: over half the mass on 7 -> MAD 0 -> all z 0
    val k = Seq((11L, 7L), (12L, 7L), (13L, 7L), (14L, 9L))
      .map { case (id, v) => ("k", id, v) }
    val got = graft.ops.Profiler.robustZ((g ++ k).toDF("grp", "id", "v")
        .repartition(5), "grp", "id", col("v"))
      .orderBy("id").as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("g", 1L, 1L, 3L, 1L, -20L), ("g", 2L, 2L, 3L, 1L, -10L),
      ("g", 3L, 3L, 3L, 1L, 0L), ("g", 4L, 4L, 3L, 1L, 10L),
      ("g", 5L, 100L, 3L, 1L, 970L),
      ("k", 11L, 7L, 7L, 0L, 0L), ("k", 12L, 7L, 7L, 0L, 0L),
      ("k", 13L, 7L, 7L, 0L, 0L), ("k", 14L, 9L, 7L, 0L, 0L)))
  }

  test("quantileShift: exact per-side quantiles, signed shift, one-sided groups drop") {
    // group g: before 1..10, after 11..20 -> p50 shifts 5 -> 15
    val g = (1 to 10).map(v => ("g", v.toLong, false)) ++
      (11 to 20).map(v => ("g", v.toLong, true))
    // group only-before: must be absent from the output
    val ob = (1 to 5).map(v => ("ob", v.toLong, false))
    val got = Profiler.quantileShift((g ++ ob).toDF("grp", "v", "aft")
        .repartition(4), "grp", col("v"), col("aft"), pcts = Seq(50, 100))
      .orderBy("grp", "pct")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("g", 50L, 5L, 15L, 10L),
      ("g", 100L, 10L, 20L, 10L)))
  }

  private def entropyModelPpm(tok: String): Long = {
    val t = tok.take(256)
    val L = Profiler.log2Micro
    val h = t.groupBy(identity).values.map(_.length.toLong)
      .map(c => c * (L(t.length - 1) - L(c.toInt - 1))).sum
    h / t.length
  }

  test("entropyScan: hand fixture — uniform hex flags, constant runs and short/non-ASCII don't") {
    val docs = Seq(
      // 4x4 chars: H = 2 bits exactly; 'a'*20: H = 0; short words ignored
      (1L, "short words AAAABBBBCCCCDDDD aaaaaaaaaaaaaaaaaaaa"),
      // 16 distinct chars: H = log2(16) = 4 bits -> flagged at 3.0
      (2L, "0123456789abcdef plain text"),
      // 16 accented chars: printable-ASCII gate excludes the token
      (3L, "ÇÇÇÇÇÇÇÇÇÇÇÇÇÇÇÇ nothing else"),
      (4L, "no candidates here at all")
    ).toDF("doc_id", "text")
    val got = Profiler.entropyScan(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L), "docs 3 and 4 have nothing to scan")
    // H("AAAABBBBCCCCDDDD") = 2 bits, H('a'*20) = 0, H(16 distinct) = 4
    // bits — asserted through the pinned table (within a µbit of exact)
    val h2bit = entropyModelPpm("AAAABBBBCCCCDDDD")
    val h4bit = entropyModelPpm("0123456789abcdef")
    assert(math.abs(h2bit - 2000000L) <= 1 && math.abs(h4bit - 4000000L) <= 1)
    assert(got(1L) == ((1L, 2L, 0L, h2bit)))
    assert(got(2L) == ((2L, 1L, 1L, h4bit)))
  }

  test("entropyScan == per-token model over random printable tokens; 256-char cap honored") {
    val rnd = new scala.util.Random(7)
    val chars = (0x21 to 0x7e).map(_.toChar)
    val toks = (1 to 30).map(i =>
      (1 to (16 + rnd.nextInt(300))).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, s"pad $t pad") }
      .toDF("doc_id", "text")
    val got = Profiler.entropyScan(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    toks.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == entropyModelPpm(t), s"token $i (len ${t.length})")
    }
  }

  test("entropyScan: minLen outside the pinned table domain raises") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Profiler.entropyScan(docs, "doc_id", "text", minLen = 1)
    }
    intercept[IllegalArgumentException] {
      Profiler.entropyScan(docs, "doc_id", "text", minLen = 257)
    }
  }

  test("wassersteinFromCells == BigInt gap model; identity 0; pure shift reads exact") {
    import graft.ops.{Profiler, Sketches}
    val rnd = new scala.util.Random(20260830L)
    val fx = (1 to 260).map(_ => ("A", rnd.nextInt(5000).toLong)) ++
      (1 to 190).map(_ => ("B", rnd.nextInt(5000).toLong + 900)) ++
      (1 to 80).map(_ => ("C", (rnd.nextInt(90) * 41).toLong))
    val df = fx.toDF("g", "v").repartition(5)
    val got = Profiler.wassersteinFromCells(
        Sketches.qsketchCells(df, "g", col("v"), subBits = 4), "g")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val byG = fx.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def loOf(k: (Long, Long)): Long = k._2 << math.max(k._1 - 4L, 0L).toInt
    def model(a: Seq[Long], b: Seq[Long]): Long = {
      val ca = a.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(cellOf).view.mapValues(_.size.toLong).toMap
      val na = a.size.toLong; val nb = b.size.toLong
      val keys = (ca.keySet ++ cb.keySet).toSeq.sorted
      var cuma = 0L; var cumb = 0L; var s = BigInt(0)
      keys.zipWithIndex.foreach { case (k, i) =>
        cuma += ca.getOrElse(k, 0L); cumb += cb.getOrElse(k, 0L)
        val gap = if (i + 1 < keys.size) loOf(keys(i + 1)) - loOf(k) else 0L
        s += BigInt(gap) * (BigInt(cuma) * nb - BigInt(cumb) * na).abs
      }
      (s * 1000 / (BigInt(na) * nb)).toLong
    }
    for (p <- Seq(("A", "B"), ("A", "C"), ("B", "C"))) {
      val (a, b) = (byG(p._1), byG(p._2))
      val (na, nb, w1) = got(p)
      assert((na, nb) == ((a.size.toLong, b.size.toLong)), s"totals $p")
      assert(w1 == model(a, b), s"gap model $p")
      assert(w1 > 0L, s"shifted fixtures must register $p")
    }
    // identical cell sets: every CDF gap is 0
    val same = (1 to 40).flatMap(i => Seq(("A", i.toLong * 11), ("B", i.toLong * 11)))
    val sameGot = Profiler.wassersteinFromCells(
        Sketches.qsketchCells(same.toDF("g", "v"), "g", col("v"), 4), "g")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(sameGot._5 == 0L)
    // a pure location step between cell lower bounds is priced exactly:
    // all mass at 0 vs all mass at 8192 (both their cells' lo) -> 8192.000
    val shift = (1 to 15).map(_ => ("A", 0L)) ++ (1 to 15).map(_ => ("B", 8192L))
    val shiftGot = Profiler.wassersteinFromCells(
        Sketches.qsketchCells(shift.toDF("g", "v"), "g", col("v"), 4), "g")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(shiftGot._5 == 8192000L)
    // the 1e8 per-group bound raises loudly
    val over = spark.range(100000002L)
      .select(org.apache.spark.sql.functions.when(col("id") === 0L, "B")
        .otherwise("A").as("g"), org.apache.spark.sql.functions.lit(7L).as("v"))
    val e = intercept[Throwable] {
      Profiler.wassersteinFromCells(
        Sketches.qsketchCells(over, "g", col("v"), 4), "g").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("group-size bound"), s"got: $msgs")
  }
}
