package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV is exact below saturation") {
    val df = (1 to 10).flatMap(i => Seq(("a", s"v$i"), ("a", s"v$i")))
      .toDF("g", "v") // 10 distinct values, each twice
    val out = Sketches.kmvDistinct(df, "g", col("v"), k = 64)
      .as[(String, Long, Long)].head()
    assert(out == (("a", 10L, 10L)))
  }

  test("KMV estimate lands within the O(1/sqrt(k)) band at saturation") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value$i")).toDF("g", "v")
    val (_, kept, est) = Sketches.kmvDistinct(df, "g", col("v"), k = 64)
      .as[(String, Long, Long)].head()
    assert(kept == 64L)
    // 3/sqrt(64) = 37.5% — generous three-sigma band for one draw
    assert(math.abs(est.toDouble / n - 1.0) < 0.375,
      s"estimate $est too far from $n")
  }

  test("sketch is deterministic across partitionings") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"tok$i")).toDF("g", "v")
    val a = Sketches.kmvDistinct(df.repartition(1), "g", col("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val b = Sketches.kmvDistinct(df.repartition(13), "g", col("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("count-min: wide sketch is exact, narrow one only ever OVER-estimates") {
    val docs = (1 to 400).map(i => (i.toLong, s"alpha beta tok${i % 50}"))
      .toDF("doc_id", "text")
    // width 4096 ≫ 52 distinct tokens: collision-free, est == exact
    val wide = Sketches.countMinHeavyHitters(docs, "text", 3, 4096)
      .as[(String, Long, Long)].collect()
    assert(wide.nonEmpty && wide.forall { case (_, ex, est) => est == ex })
    // width 8 < 52 tokens: collisions guaranteed; min-over-rows must
    // still never drop below truth
    val narrow = Sketches.countMinHeavyHitters(docs, "text", 3, 8)
      .as[(String, Long, Long)].collect()
    assert(narrow.forall { case (_, ex, est) => est >= ex })
    assert(narrow.exists { case (_, ex, est) => est > ex })
  }

  test("pairwise KMV jaccard: exact below saturation, near truth above") {
    // BELOW saturation (< k distinct per corpus) the pooled sketch IS
    // the full union, so the estimate must be the exact jaccard.
    val small = ((1 to 30).map(i => ("x", s"v$i")) ++
      (11 to 40).map(i => ("y", s"v$i"))).toDF("g", "v")
    val exact = Sketches.kmvPairwiseJaccard(small, "g", col("v"), k = 64)
      .as[(String, String, Long, Long, Long)].collect()
    // |x∩y| = 20 (v11..v30), |x∪y| = 40 → 500000 ppm exactly
    assert(exact.toSeq == Seq(("x", "y", 40L, 20L, 500000L)))
    // ABOVE saturation: overlapping ranges with true jaccard 1/3; the
    // k=64 estimate must land within the sketch's error bar (~3/√k)
    val big = ((1 to 2000).map(i => ("x", s"v$i")) ++
      (1001 to 3000).map(i => ("y", s"v$i"))).toDF("g", "v")
    val est = Sketches.kmvPairwiseJaccard(big, "g", col("v"), k = 64)
      .as[(String, String, Long, Long, Long)].collect().head
    assert(est._3 == 64L)
    val ppm = est._5
    assert(math.abs(ppm - 333333L) < 375000L * 3 / 8, // 3/√64 = 0.375
      s"estimate $ppm ppm too far from 333333")
  }

  test("count-min cell matrix is bounded and mergeable (sum of halves = whole)") {
    val docs = (1 to 300).map(i => (i.toLong, s"w${i % 40} w${i % 17}"))
      .toDF("doc_id", "text")
    val cells = Sketches.countMinCells(docs, "text", 3, 16)
      .as[(Int, Long, Long)].collect()
    assert(cells.length <= 3 * 16)
    val half1 = Sketches.countMinCells(docs.filter(col("doc_id") <= 150), "text", 3, 16)
      .as[(Int, Long, Long)].collect().map { case (j, c, n) => (j, c) -> n }.toMap
    val half2 = Sketches.countMinCells(docs.filter(col("doc_id") > 150), "text", 3, 16)
      .as[(Int, Long, Long)].collect().map { case (j, c, n) => (j, c) -> n }.toMap
    val merged = (half1.keySet ++ half2.keySet).map(k =>
      k -> (half1.getOrElse(k, 0L) + half2.getOrElse(k, 0L))).toMap
    assert(merged == cells.map { case (j, c, n) => (j, c) -> n }.toMap)
  }

  test("HLL registers: bounded, deterministic, mergeable (max of halves = whole)") {
    val df = (1 to 3000).map(i => (s"g${i % 2}", s"user${i % 700}")).toDF("g", "v")
    val whole = Sketches.hllRegisters(df, "g", col("v"), p = 6)
      .as[(String, Long, Long)].collect()
    assert(whole.length <= 2 * 64)
    assert(whole.forall { case (_, b, r) => b >= 0 && b < 64 && r >= 1 && r <= 30 })
    // determinism across partitionings
    val re = Sketches.hllRegisters(df.repartition(13), "g", col("v"), p = 6)
      .as[(String, Long, Long)].collect()
    assert(whole.toSet == re.toSet)
    // merge = elementwise max of the halves' registers
    val h1 = Sketches.hllRegisters(df.limit(1500), "g", col("v"), p = 6)
      .as[(String, Long, Long)].collect().map { case (g, b, r) => (g, b) -> r }.toMap
    val h2 = Sketches.hllRegisters(df.except(df.limit(1500)), "g", col("v"), p = 6)
      .as[(String, Long, Long)].collect().map { case (g, b, r) => (g, b) -> r }.toMap
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> math.max(h1.getOrElse(k, 0L), h2.getOrElse(k, 0L))).toMap
    assert(merged == whole.map { case (g, b, r) => (g, b) -> r }.toMap)
  }

  test("HLL estimate lands within the ~1.04/sqrt(m) band") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"item$i")).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, "g", col("v"), p = 6)
    val (_, occ, est) = Sketches.hllEstimate(regs, "g", p = 6)
      .as[(String, Long, Long)].head()
    assert(occ == 64L) // all buckets hit at 20k >> 64
    // 1.04/sqrt(64) = 13% standard error; allow 3 sigma + bias slack
    assert(math.abs(est.toDouble / n - 1.0) < 0.45,
      s"HLL estimate $est too far from $n")
  }

  test("cmJoinCardinality: exact on small key sets, estimate never below exact") {
    // A: key counts a=3, b=2; B: a=1, b=4, c=9 -> exact 3*1 + 2*4 = 11
    val a = (Seq.fill(3)("a") ++ Seq.fill(2)("b")).toDF("k")
    val b = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(9)("c")).toDF("k")
    val r = Sketches.cmJoinCardinality(a, col("k"), b, col("k"))
      .as[(Long, Long, Long)].collect().head
    assert(r._1 == 11L)
    assert(r._2 >= r._1)
    assert(r._3 == (r._2 - r._1) * 1000000L / 11L)
    // disjoint keys: exact 0, err NULL
    val d = Seq("zz").toDF("k")
    val r2 = Sketches.cmJoinCardinality(a, col("k"), d, col("k"))
      .select(col("exact"), col("cm_est")).as[(Long, Long)].collect().head
    assert(r2._1 == 0L)
  }
}
