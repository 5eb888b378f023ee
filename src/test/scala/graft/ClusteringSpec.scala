package graft

import graft.ops.Clustering
import org.apache.spark.sql.functions.col

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("lloyd assignment: two clear clusters, lower-cid tiebreak, stable across layouts") {
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f),   // seed cid 0
      1L -> Array(0.0f, 1.0f),   // seed cid 1
      2L -> Array(0.9f, 0.1f),
      3L -> Array(0.1f, 0.9f),
      4L -> Array(0.8f, 0.2f),
      5L -> Array(0.5f, 0.5f))   // exactly between -> tie -> cid 0
    val df = vecs.toDF("vec_id", "embedding")
    val out = Clustering.lloydAssign(df, "vec_id", "embedding", 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 5L -> 0L, 1L -> 1L, 3L -> 1L))
    // cosine column present and sane
    val cos = Clustering.lloydAssign(df, "vec_id", "embedding", 2, 2)
      .select("cosine").as[Double].collect()
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    // partitioning must not change the model or the assignment
    val out2 = Clustering.lloydAssign(df.repartition(5), "vec_id", "embedding", 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out == out2)
    // non-contiguous, non-zero-based ids still seed k centroids
    val shifted = vecs.map { case (id, v) => (id * 100 + 7, v) }
      .toDF("vec_id", "embedding")
    val out3 = Clustering.lloydAssign(shifted, "vec_id", "embedding", 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out3 == out.map { case (id, cid) => (id * 100 + 7, cid * 100 + 7) })
  }

  test("farthest-point seeding spreads seeds instead of taking the first k ids") {
    // ids 0-3 all point x-ward; only id 9 points y-ward. First-k seeding
    // would pick two near-identical x seeds; farthest-point must pick
    // the lone y vector as the second seed.
    val df = (Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.99f, 0.01f),
      2L -> Array(0.98f, 0.02f), 3L -> Array(0.97f, 0.03f),
      9L -> Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val seeds = Clustering.farthestPointSeeds(df, "vec_id", "embedding", 2)
    assert(seeds.map(_._1) == Seq(0L, 9L))
    // and Lloyd from those seeds separates the two directions
    val out = Clustering.lloydAssignFrom(df, "vec_id", "embedding", seeds, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 9L -> 9L))
    // more seeds than distinct vectors: returns what exists, no crash
    val tiny = Clustering.farthestPointSeeds(df.limit(2), "vec_id", "embedding", 5)
    assert(tiny.size == 2)
  }

  test("second iteration re-assigns against updated centroids") {
    // seed 1 = (0,1) but every non-seed vector leans x-ward; after one
    // update centroid 0 moves toward the x-heavy mean while centroid 1
    // keeps only its seed — the assignment stays consistent and total
    val vecs = (2L to 20L).map(i => i -> Array(1.0f, i.toFloat / 40))
    val df = (Seq(0L -> Array(1.0f, 0.0f), 1L -> Array(0.0f, 1.0f)) ++ vecs)
      .toDF("vec_id", "embedding")
    val out = Clustering.lloydAssign(df, "vec_id", "embedding", 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out.size == 21)
    assert(out(1L) == 1L)                     // the y seed stays its own cluster
    assert((2L to 20L).forall(out(_) == 0L))  // all x-leaning vectors on cid 0
  }

  test("labelCohesionPpm: aligned label reads 1e6, opposed label collapses") {
    import graft.ops.Clustering
    val feats = Seq(
      (1, Array(1.0f, 0.0f)),   // label 1: two identical unit vectors
      (1, Array(1.0f, 0.0f)),
      (2, Array(1.0f, 0.0f)),   // label 2: opposed pair -> sum vector 0
      (2, Array(-1.0f, 0.0f)),
      (3, Array(0.0f, 0.0f)))   // label 3: all-zero -> NULL ppm
      .toDF("label", "embedding")
    val out = Clustering.labelCohesionPpm(feats, "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // label 1: comp sums (2000, 0) -> 4e6; rows 2*1e6; ppm = 4e6*1e6/(2*2e6)
    assert(out(1) == ((2L, 4000000L, 2000000L, 1000000L)))
    // label 2: sum vector zero, members nonzero -> 0 ppm. floor(-1.0*1e3) = -1000
    assert(out(2) == ((2L, 0L, 2000000L, 0L)))
    assert(out(3) == ((1L, 0L, 0L, -1L)))
  }

  test("groupCentroidSims: exact dots and norms of quantized centroid sums") {
    import graft.ops.Clustering
    val feats = Seq(
      (1, Array(1.0f, 0.0f)), (1, Array(1.0f, 0.0f)),  // sum (2000, 0)
      (2, Array(0.0f, 1.0f)),                            // sum (0, 1000)
      (3, Array(1.0f, 1.0f)))                            // sum (1000, 1000)
      .toDF("label", "embedding")
    val out = Clustering.groupCentroidSims(feats, "label", "embedding")
      .as[(Int, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out((1, 2)) == ((0L, 4000000L, 1000000L)))
    assert(out((1, 3)) == ((2000000L, 4000000L, 2000000L)))
    assert(out((2, 3)) == ((1000000L, 1000000L, 2000000L)))
  }

  test("adjustedRandPpm: brute-force model, perfect/degenerate/independent cases") {
    def model(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long) = {
      def t(xs: Iterable[Int]) = xs.map(x => BigInt(x) * (x - 1)).sum
      val n = rows.size
      val tij = t(rows.groupBy(identity).values.map(_.size))
      val ta = t(rows.groupBy(_._1).values.map(_.size))
      val tb = t(rows.groupBy(_._2).values.map(_.size))
      val tn = BigInt(n) * (n - 1)
      val num2 = 2 * (tn * tij - ta * tb)
      val den2 = tn * (ta + tb) - 2 * ta * tb
      val ppm = if (den2 == 0) BigInt(1000000)
        else if (num2 >= 0) num2 * 1000000 / den2
        else -((-num2) * 1000000 / den2)
      (n.toLong, (tij / 2).toLong, (ta / 2).toLong, (tb / 2).toLong, ppm.toLong)
    }
    val rnd = new scala.util.Random(59)
    val rows = (1 to 200).map(_ => (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(5)}"))
    val got = Clustering.adjustedRandPpm(
        rows.toDF("la", "lb").repartition(7), "la", "lb")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(model(rows)))
    // independent labelings hover near zero
    assert(math.abs(got.head._5) < 120000)
    // identical partitions (modulo renaming) score exactly 1e6
    val same = (1 to 50).map(i => (s"a${i % 3}", s"b${i % 3}"))
    val g2 = Clustering.adjustedRandPpm(same.toDF("la", "lb"), "la", "lb")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(g2._5 == 1000000L)
    // both-trivial partitions: den2 = 0 -> defined as 1e6
    val triv = (1 to 9).map(_ => ("x", "y"))
    val g3 = Clustering.adjustedRandPpm(triv.toDF("la", "lb"), "la", "lb")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(g3._5 == 1000000L)
  }

  test("silhouettePpm matches the brute-force integer model; one label scores 0") {
    val rnd = new scala.util.Random(41)
    // three loose gaussian-ish blobs in 8 dims
    val rows = (1L to 90L).map { i =>
      val lab = (i % 3).toInt
      val base = Array.tabulate(8)(d => if (d % 3 == lab) 1.0f else -0.5f)
      (i, lab, base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.6f))
    }
    val feats = rows.toDF("vec_id", "label", "embedding")
    val got = Clustering.silhouettePpm(feats.repartition(7), "label", "embedding")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // brute-force model with identical integer spellings
    val q = rows.map { case (_, l, v) =>
      (l.toLong, v.map(x => math.floor(x.toDouble * 1e3).toLong)) }
    val cents = q.groupBy(_._1).map { case (l, vs) =>
      l -> Array.tabulate(8)(d => vs.map(_._2(d)).sum / vs.size) }
    def d2(x: Array[Long], c: Array[Long]) =
      x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    val model = q.groupBy(_._1).map { case (l, vs) =>
      val sps = vs.map { case (_, x) =>
        val a = d2(x, cents(l))
        val b = cents.filter(_._1 != l).map(c => d2(x, c._2)).min
        if (math.max(a, b) == 0) 0L
        else if (b >= a) (b - a) * 1000000L / math.max(a, b)
        else -((a - b) * 1000000L / math.max(a, b))
      }
      val s = sps.sum
      l -> ((vs.size.toLong, if (s >= 0) s / vs.size else -((-s) / vs.size)))
    }
    assert(got == model)
    // well-separated blobs must actually score positive
    assert(got.values.forall(_._2 > 0))
    // a single label has no b: defined as 0
    val solo = Clustering.silhouettePpm(
      feats.filter(org.apache.spark.sql.functions.col("label") === 0),
      "label", "embedding")
      .as[(Long, Long, Long)].collect().toSeq
    assert(solo == Seq((0L, 30L, 0L)))
  }

  test("clusterPurityPpm: majority with deterministic ties, mixed vs clean clusters") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "en"), (1L, "en"), (1L, "en"), (1L, "fr"),   // clean-ish: 3/4
      (2L, "de"), (2L, "fr"),                            // tie -> 'de' (label asc)
      (3L, "es"), (3L, "es")                             // pure
    ).toDF("cid", "lang")
    val got = graft.ops.Clustering.clusterPurityPpm(rows.repartition(3),
        "cid", "lang")
      .orderBy("cluster_id")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, "en", 3L, 750000L),
      (2L, 2L, "de", 1L, 500000L),
      (3L, 2L, "es", 2L, 1000000L)))
  }

  test("gridDensityClusters == brute grid model; sparse reads -1; invCell pinned to powers of two") {
    import graft.ops.Clustering
    val rnd = new scala.util.Random(20260832L)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)) ++
      // a far-away tight blob: an isolated dense cell = its own cluster
      (301 to 306).map(i => (i.toLong, 50.03, 50.07))
    val got = Clustering.gridDensityClusters(pts.toDF("id", "x", "y"), "id",
        col("x"), col("y"), invCell = 4, minPts = 4L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // brute model: cells, density, union-find over 8-adjacency
    def cellOf2(v: Double): Long = math.floor(v * 4).toLong
    val cells = pts.groupBy(p => (cellOf2(p._2), cellOf2(p._3)))
    val dense = cells.filter(_._2.size >= 4).keySet
    def pack(c: (Long, Long)): Long = ((c._1 + 1048576L) << 21) + (c._2 + 1048576L)
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    dense.foreach(c => parent(pack(c)) = pack(c))
    for (a <- dense; b <- dense
         if a != b && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1) {
      val (ra, rb) = (find(pack(a)), find(pack(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pts.foreach { case (id, x, y) =>
      val c = (cellOf2(x), cellOf2(y))
      val expCluster = if (dense(c)) find(pack(c)) else -1L
      assert(got(id) == ((c._1, c._2, expCluster)), s"point $id")
    }
    assert(got.values.map(_._3).toSet.size >= 3,
      "fixture should produce several clusters plus noise")
    assert(got(301L)._3 == pack((cellOf2(50.03), cellOf2(50.07))),
      "isolated dense cell is its own cluster")
    // non-power-of-two grid raises
    val e = intercept[IllegalArgumentException] {
      Clustering.gridDensityClusters(pts.toDF("id", "x", "y"), "id",
        col("x"), col("y"), invCell = 3, minPts = 4L)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
