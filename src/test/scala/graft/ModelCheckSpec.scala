package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Packing, TextDedup}

/** Model checks: the three trickiest operators compared against
  * brute-force in-memory reference models on SEEDED random fixtures —
  * the operators' clever parts (PPJoin prefix filter, two-pass prefix
  * sum, pointer doubling) must be invisible in the results. Seeds are
  * fixed so failures reproduce.
  */
class ModelCheckSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = 1000000007L
  private def polyhash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = (h * 31 + s.codePointAt(i)) % Mod; i += 1 }
    h
  }

  test("ngramJaccardPairs == brute-force model on random duplicate-heavy corpora") {
    val rnd = new Random(20260813L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 3).foreach { trial =>
      // duplicate-heavy: some texts repeat verbatim, lengths 0-9
      val texts = (1 to 60).map { _ =>
        (0 until rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (rnd.nextBoolean()) t else texts(rnd.nextInt(texts.size)))
      }
      val threshold = 0.4 + 0.2 * rnd.nextDouble()
      val maxDf = 8L
      // ---- model: per distinct text (min-id rep), distinct shingle
      // hashes; stop-df over distinct texts; pairwise exact jaccard;
      // expand reps to members; within-clique pairs are 1.0 when the
      // rep keeps >= 1 shingle
      val byText = docs.filter(_._2.split(" ").count(_.nonEmpty) >= 3)
        .groupBy(_._2).map { case (t, ms) => (t, ms.map(_._1).min, ms.map(_._1).sorted) }.toSeq
      val shingleSets = byText.map { case (t, rep, _) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        rep -> toks.sliding(3).map(w => polyhash(w.mkString(" "))).toSet
      }.toMap
      val dfCount = shingleSets.values.toSeq.flatten.groupBy(identity)
        .map { case (sh, os) => sh -> os.size.toLong }
      val kept = shingleSets.map { case (r, ss) => r -> ss.filter(dfCount(_) <= maxDf) }
      val repPairs = for {
        Seq((ra, sa), (rb, sb)) <- kept.toSeq.sortBy(_._1).combinations(2).toSeq
        inter = (sa & sb).size
        if sa.nonEmpty && sb.nonEmpty
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= threshold
      } yield (ra, rb, j)
      val members = byText.flatMap { case (_, rep, ms) => ms.map(_ -> rep) }
      val cross = for {
        (ra, rb, j) <- repPairs
        a <- members.filter(_._2 == ra).map(_._1)
        b <- members.filter(_._2 == rb).map(_._1)
      } yield (math.min(a, b), math.max(a, b), j)
      val within = for {
        (_, rep, ms) <- byText if kept(rep).nonEmpty
        Seq(a, b) <- ms.combinations(2).toSeq
      } yield (a, b, 1.0d)
      val model = (cross ++ within).toSet
      // ---- operator
      val got = TextDedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", 3, threshold, maxDf)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == model,
        s"trial $trial t=$threshold: missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  test("packSequences == sequential scan model on random token counts") {
    val rnd = new Random(7L)
    (1 to 3).foreach { trial =>
      val docs = (1 to 200).map(i => (i.toLong, rnd.nextInt(40).toLong))
      val budget = 16L + rnd.nextInt(50)
      // model: lay out in id order, cut every `budget`
      var off = 0L
      val model = docs.filter(_._2 > 0).sortBy(_._1).flatMap { case (id, tok) =>
        val start = off; off += tok
        (start / budget to (off - 1) / budget).map { seq =>
          (seq, id, math.min(off, (seq + 1) * budget) - math.max(start, seq * budget))
        }
      }.toSet
      val got = Packing.packSequences(
          docs.toDF("doc_id", "tok").repartition(1 + rnd.nextInt(8)),
          "doc_id", col("tok"), budget)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == model, s"trial $trial budget=$budget")
    }
  }

  test("minhashCandidates == signature model on random corpora") {
    val rnd = new Random(424242L)
    val vocab = Vector("x", "y", "z", "w", "v")
    (1 to 3).foreach { trial =>
      val docs = (1 to 40).map { i =>
        (i.toLong, (0 until (3 + rnd.nextInt(8)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // model: 16 affine minima over trigram-shingle hashes, 4 bands of
      // 4 folded with (acc*1000003 + x) mod p, pairs sharing any bucket
      val sigs = docs.flatMap { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        if (toks.length < 3) None
        else {
          val hs = toks.sliding(3).map(w => polyhash(w.mkString(" "))).toSeq
          Some(id -> (0 until 16).map(j =>
            hs.map(h => ((2L * j + 3) * h + (5L * j + 7)) % Mod).min))
        }
      }
      def buckets(sig: Seq[Long]): Seq[Long] = (0 until 4).map(b =>
        sig.slice(b * 4, b * 4 + 4).foldLeft(0L)((a, x) => (a * 1000003L + x) % Mod))
      val model = (for {
        Seq((ia, sa), (ib, sb)) <- sigs.combinations(2)
        if buckets(sa).zip(buckets(sb)).exists { case (x, y) => x == y }
        est = (0 until 16).count(i => sa(i) == sb(i)).toDouble / 16
      } yield (math.min(ia, ib), math.max(ia, ib), est)).toSet
      val got = TextDedup.minhashCandidates(docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == model, s"trial $trial: missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  test("simhashPairs == tf-weighted fingerprint model (pigeonhole is lossless)") {
    val rnd = new Random(31337L)
    val vocab = Vector("aa", "ab", "ba", "bb")
    (1 to 3).foreach { trial =>
      val docs = (1 to 50).map { i =>
        (i.toLong, (0 until rnd.nextInt(6))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      def fp(t: String): Long = {
        val counters = new Array[Long](30)
        t.split(" ").filter(_.nonEmpty).foreach { tok =>
          val h = polyhash(tok)
          (0 until 30).foreach(b =>
            if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1)
        }
        (0 until 30).foldLeft(0L)((acc, b) => if (counters(b) > 0) acc | (1L << b) else acc)
      }
      // pigeonhole over 2 bands is lossless at hamming <= 1, so the
      // model is simply ALL pairs within the hamming radius
      val fps = docs.map { case (id, t) => id -> fp(t) }
      val model = (for {
        Seq((ia, fa), (ib, fb)) <- fps.combinations(2)
        d = java.lang.Long.bitCount(fa ^ fb).toLong if d <= 1
      } yield (math.min(ia, ib), math.max(ia, ib), d)).toSet
      val got = TextDedup.simhashPairs(docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == model, s"trial $trial: missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  test("integer PageRank == BigInt model on random graphs") {
    val rnd = new Random(271828L)
    (1 to 3).foreach { trial =>
      val n = 30
      val edges = (1 to 60).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val S = graft.ops.GraphRank.Scale
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> BigInt(S / nodes.size)).toMap
      val base = BigInt(15L * (S / nodes.size) / 100L)
      (1 to 3).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
          r(src) / outdeg(src) }.sum).toMap
        r = nodes.map(v => v -> (base + BigInt(85) * in.getOrElse(v, BigInt(0)) / 100)).toMap
      }
      val model = r.map { case (k, v) => k -> v.toLong }
      val got = graft.ops.GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 3)
        .as[(Long, Long)].collect().toMap
      assert(got == model, s"trial $trial: ${(model.toSet -- got.toSet).take(3)}")

      // redistribute-to-all variant: same arithmetic + per-iteration
      // dangling mass D folded in as (85 · (ins + D div n)) div 100
      var r2 = nodes.map(_ -> BigInt(S / nodes.size)).toMap
      (1 to 3).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
          r2(src) / outdeg(src) }.sum).toMap
        val d = nodes.filterNot(outdeg.contains).map(r2).sum
        r2 = nodes.map(v => v ->
          (base + BigInt(85) * (in.getOrElse(v, BigInt(0)) + d / nodes.size) / 100)).toMap
      }
      val model2 = r2.map { case (k, v) => k -> v.toLong }
      val got2 = graft.ops.GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 3,
          redistributeDangling = true)
        .as[(Long, Long)].collect().toMap
      assert(got2 == model2, s"trial $trial redistribute: ${(model2.toSet -- got2.toSet).take(3)}")

      // personalized variant: teleport mass only on the seed set
      // (every 4th node, intersected with the graph); same quanta
      val seeds = nodes.filter(_ % 4 == 0)
      if (seeds.nonEmpty) {
        val baseS = BigInt(15L * (S / seeds.size) / 100L)
        var r3 = nodes.map(v =>
          v -> (if (seeds.contains(v)) BigInt(S / seeds.size) else BigInt(0))).toMap
        (1 to 3).foreach { _ =>
          val in = edges.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
            r3(src) / outdeg(src) }.sum).toMap
          r3 = nodes.map(v => v ->
            ((if (seeds.contains(v)) baseS else BigInt(0)) +
              BigInt(85) * in.getOrElse(v, BigInt(0)) / 100)).toMap
        }
        val model3 = r3.map { case (k, v) => k -> v.toLong }
        // seed frame includes ids OUTSIDE the graph: they must not count
        val seedDf = (seeds ++ Seq(9999L)).toDF("seed")
        val got3 = graft.ops.GraphRank.personalizedPageRank(
            edges.toDF("src", "dst"), "src", "dst", seedDf, "seed", 3)
          .as[(Long, Long)].collect().toMap
        assert(got3 == model3, s"trial $trial personalized: ${(model3.toSet -- got3.toSet).take(3)}")
      }
    }
  }

  test("integer HITS == BigInt model on random graphs") {
    val rnd = new Random(314159L)
    (1 to 3).foreach { trial =>
      val n = 25
      val edges = (1 to 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      def renorm(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
        val m = raw.values.max
        nodes.map(v => v -> raw.getOrElse(v, BigInt(0)) * 1000000 / m).toMap
      }
      var hub = nodes.map(_ -> BigInt(1000000)).toMap
      var auth = Map.empty[Long, BigInt]
      (1 to 2).foreach { _ =>
        auth = renorm(edges.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap)
        hub = renorm(edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap)
      }
      val model = nodes.map(v => v -> ((hub(v).toLong, auth(v).toLong))).toMap
      val got = graft.ops.GraphRank.hits(edges.toDF("src", "dst"), "src", "dst", 2)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == model, s"trial $trial: ${(model.toSet -- got.toSet).take(3)}")
    }
  }

  test("allPairsCosine == brute-force gated-cosine model on random corpora") {
    val rnd = new Random(2718L)
    (1 to 3).foreach { trial =>
      val vocab = (1 to 12).map(i => s"t$i")
      val rows = (1 to 80).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(12))).mkString(" "))
      }
      val (tau, maxDf) = (700L, 40L)
      val tfs = rows.map { case (id, text) =>
        id -> text.split(" ").filter(_.nonEmpty).groupBy(identity)
          .view.mapValues(_.length.toLong).toMap
      }.toMap
      val dfm = tfs.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong)
      val kept = dfm.filter { case (_, d) => d >= 2 && d <= maxDf }.keySet.toSet
      val gated = tfs.view.mapValues(_.filter(kv => kept(kv._1))).toMap
      val model = (for {
        a <- rows.map(_._1); b <- rows.map(_._1) if a < b
        va = gated(a); vb = gated(b)
        dot = va.keySet.intersect(vb.keySet).toSeq.map(t => va(t) * vb(t)).sum
        n2a = va.values.map(v => v * v).sum; n2b = vb.values.map(v => v * v).sum
        if dot > 0 &&
          BigInt(dot) * dot * 1000000 >= BigInt(tau) * tau * n2a * n2b
      } yield (a, b, dot, n2a, n2b)).toSet
      val got = graft.ops.TermStats.allPairsCosine(
          rows.toDF("doc_id", "text"), "doc_id", "text", tau, maxDf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == model, s"trial $trial: ${(model -- got).take(3)} / ${(got -- model).take(3)}")
    }
  }

  test("frontier BFS == queue BFS model on random directed graphs") {
    val rnd = new Random(4242L)
    (1 to 3).foreach { trial =>
      val n = 30
      val edges = (1 to 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val seedSet = Seq(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong).distinct
      val maxHops = 3
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val inGraph = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      var dist = seedSet.filter(inGraph).map(_ -> 0L).toMap
      var frontier = dist.keySet
      (1 to maxHops).foreach { k =>
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)) -- dist.keySet
        dist = dist ++ next.map(_ -> k.toLong)
        frontier = next
      }
      val got = graft.ops.GraphRank.hopDistance(edges.toDF("src", "dst"),
          "src", "dst", seedSet.toDF("seed"), "seed", maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got == dist, s"trial $trial")
    }
  }

  test("randomWalks == sequential hash-walk model on random graphs") {
    val rnd = new Random(8675309L)
    (1 to 3).foreach { trial =>
      val n = 20
      val edges = (1 to 60).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val (wpn, len) = (2, 3)
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val M = 1000003L
      val model = nodes.flatMap { v0 =>
        (0 until wpn).flatMap { i =>
          val wid = v0 * wpn + i
          var v = v0
          var rows = Vector((wid, 0L, v0))
          var t = 1L
          var alive = true
          while (t <= len && alive) {
            adj.get(v) match {
              case Some(nbrs) =>
                val pick = ((v % M) * 8191L + (wid % M) * 127L + t * 524287L) % M % nbrs.size
                v = nbrs(pick.toInt)
                rows :+= ((wid, t, v)); t += 1
              case None => alive = false
            }
          }
          rows
        }
      }.toSet
      val got = graft.ops.GraphRank.randomWalks(edges.toDF("src", "dst"),
          "src", "dst", wpn, len)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == model, s"trial $trial: ${(model -- got).take(3)} / ${(got -- model).take(3)}")
    }
  }

  test("pointer-doubling CC == union-find model on random graphs") {
    val rnd = new Random(99L)
    (1 to 3).foreach { trial =>
      val n = 80
      val edges = (1 to 100).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find model
      val parent = Array.tabulate(n.toLong.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val model = nodes.map { v =>
        // min node id in the component that actually appears in edges
        val root = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == root).min
      }.toMap
      // both paths must match the model: the small-graph union-find
      // (default threshold) and the distributed pointer doubling (0)
      val local = ConnectedComponents.labels(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val dist = ConnectedComponents.labelsWithRounds(edges.toDF("a", "b"), 50,
        localThreshold = 0)._1.as[(Long, Long)].collect().toMap
      assert(local == model, s"trial $trial local")
      assert(dist == model, s"trial $trial distributed")
    }
  }

  // ---- overflow-bound red paths (VERDICT r8 task 8) --------------------
  // The DECIMAL(38,0) family documents loud magnitude bounds; each case
  // proves the raise actually FIRES just past its bound (not a silent
  // wrap), and — where cheap — that the boundary value itself passes.

  private def raisedMessage(body: => Unit): String = {
    val e = intercept[Throwable](body)
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
  }

  test("corrSignedR2Ppm raises past the 3e15 |num| bound, passes below") {
    // x = y = {0, 2e9}: num = n·Σxx − (Σx)² = 4e18 > 3e15 (moments stay
    // inside long: 2·4e18 < Long.MaxValue)
    val hot = Seq((1L, 0L), (1L, 2000000000L)).toDF("g", "x")
    val msg = raisedMessage(
      graft.ops.Behavior.corrSignedR2Ppm(hot, "g", col("x"), col("x")).collect())
    assert(msg.contains("signed-R2 magnitude bound"), s"got: $msg")
    // in-bound control: num = 1e12 — the guard must NOT fire
    val cool = Seq((1L, 0L), (1L, 1000000L)).toDF("g", "x")
    val ok = graft.ops.Behavior.corrSignedR2Ppm(cool, "g", col("x"), col("x"))
      .collect()
    assert(ok.length == 1 && ok(0).getLong(2) == 1000000L) // perfect corr
  }

  test("Spectral magnitude require fires on an over-scale embedding") {
    val dims = 4
    val bound = Long.MaxValue / graft.ops.Spectral.Scale / dims
    // element 3e6 quantizes to 3e12 > the dims=4 bound (~2.3e12)
    val hot = Seq((0L, Array.fill(dims)(3e6.toFloat)),
        (1L, Array.fill(dims)(0.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      graft.ops.Spectral.topComponentScores(hot, "vec_id", "embedding", 1)
        .collect())
    assert(e.getMessage.contains("overflow") &&
      e.getMessage.contains(bound.toString), s"got: ${e.getMessage}")
    // just-below control: element under the pre-quantization bound runs
    val cool = Seq((0L, Array.fill(dims)(1e6.toFloat)),
        (1L, Array.fill(dims)(0.5f)))
      .toDF("vec_id", "embedding")
    assert(graft.ops.Spectral.topComponentScores(cool, "vec_id", "embedding", 1)
      .count() == 2)
  }

  test("adjustedRandPpm raises at 5e7+1 rows, silent at exactly 5e7") {
    val over = spark.range(50000001L)
      .select(lit(0L).as("la"), lit(0L).as("lb"))
    val msg = raisedMessage(
      graft.ops.Clustering.adjustedRandPpm(over, "la", "lb").collect())
    assert(msg.contains("ARI magnitude bound"), s"got: $msg")
    val at = spark.range(50000000L)
      .select(lit(0L).as("la"), lit(0L).as("lb"))
    val ok = graft.ops.Clustering.adjustedRandPpm(at, "la", "lb").collect()
    // single-cell table: den2 = 0 → defined ARI of 1e6, no raise
    assert(ok.length == 1 && ok(0).getAs[Long]("ari_ppm") == 1000000L)
  }

  test("spearmanGradePpm raises past the 3e6 per-group row bound") {
    val over = spark.range(3000001L)
      .select(lit(1L).as("g"), col("id").as("x"), col("id").as("y"))
    val msg = raisedMessage(
      graft.ops.Behavior.spearmanGradePpm(over, "g", col("x"), col("y"))
        .collect())
    assert(msg.contains("group-size bound"), s"got: $msg")
  }

  test("domainMarkersPpm raises past 5e7 total occurrences") {
    // 25e6+1 docs × 2 tokens = 5e7+2 occurrences, one hot token per side
    val over = spark.range(25000001L)
      .select((col("id") % 2 === 0).as("is_target"),
        lit("tok tok").as("text"))
    val msg = raisedMessage(
      graft.ops.TermStats.domainMarkersPpm(over, "text", "is_target",
        minCount = 1, topK = 5).collect())
    assert(msg.contains("phi2 magnitude bound"), s"got: $msg")
  }

  test("selfScrub id cap: raises at 2^40, passes just below") {
    val over = Seq(((1L << 40), "a b c d e")).toDF("doc_id", "text")
    val msg = raisedMessage(
      graft.ops.TextDedup.selfScrub(over, "doc_id", "text", 5).collect())
    assert(msg.contains("doc id out of [0, 2^40)"), s"got: $msg")
    val at = Seq(((1L << 40) - 1, "a b c d e")).toDF("doc_id", "text")
    val ok = graft.ops.TextDedup.selfScrub(at, "doc_id", "text", 5).collect()
    assert(ok.length == 1 && ok(0).getAs[Long]("n_kept") == 5L)
  }

  test("selfScrub token cap: a 2^22-token document raises loudly") {
    // the occ encoding gives each doc 2^22 position slots; a document
    // at the cap would collide into its neighbor's slots — raise, not
    // a silently wrong first-occurrence order
    val text = new StringBuilder
    (0 until (1 << 22)).foreach(i => text.append("a "))
    val over = Seq((1L, text.result().trim)).toDF("doc_id", "text")
    val msg = raisedMessage(
      graft.ops.TextDedup.selfScrub(over, "doc_id", "text", 5).collect())
    assert(msg.contains("2^22-token cap"), s"got: $msg")
  }

  test("krippendorffAlphaPpm raises when a unit exceeds maxRaters, passes at it") {
    val over = ((1 to 13).map(i => ("u1", i.toLong % 2)) ++
      Seq(("u2", 0L), ("u2", 1L))).toDF("unit", "v")
    val msg = raisedMessage(
      graft.ops.EvalMetrics.krippendorffAlphaPpm(over, "unit", "v").collect())
    assert(msg.contains("exceeds maxRaters=12"), s"got: $msg")
    val at = ((1 to 12).map(i => ("u1", i.toLong % 2)) ++
      Seq(("u2", 0L), ("u2", 1L))).toDF("unit", "v")
    val ok = graft.ops.EvalMetrics.krippendorffAlphaPpm(at, "unit", "v").collect()
    assert(ok.length == 1)
  }

  test("packSequences raises past the 2^40 token magnitude cap, packs at it") {
    // past the cap the count IS the corruption: enumerating its
    // sequence fan-out would hang, so the operator must raise instead
    val over = Seq((1L, (1L << 40) + 1)).toDF("doc_id", "tok")
    val msg = raisedMessage(
      graft.ops.Packing.packSequences(over, "doc_id", col("tok"), 1L << 35)
        .collect())
    assert(msg.contains("2^40 magnitude cap"), s"got: $msg")
    val at = Seq((1L, 1L << 40)).toDF("doc_id", "tok")
    val ok = graft.ops.Packing.packSequences(at, "doc_id", col("tok"), 1L << 35)
      .collect()
    assert(ok.length == 32, "2^40 tokens at 2^35 budget span 32 sequences")
  }

  test("kendallGradePpm raises past the 1e8 per-group row bound") {
    // constant grades keep the volume path cheap (map-side combine to
    // one cell) while n_points still crosses the bound
    val over = spark.range(100000001L)
      .select(lit(1L).as("g"), lit(0L).as("x"), lit(0L).as("y"))
    val msg = raisedMessage(
      graft.ops.Behavior.kendallGradePpm(over, "g", col("x"), col("y"))
        .collect())
    assert(msg.contains("group-size bound"), s"got: $msg")
  }

  test("selfScrub == keep-first brute force on random duplicate-heavy corpora") {
    val rnd = new Random(20260815L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val n = 3
    (1 to 3).foreach { trial =>
      // duplicate-heavy: small vocab forces cross-doc AND within-doc
      // window repeats; a third of docs clone another verbatim
      val texts = (0 until 40).map(_ => (0 until rnd.nextInt(14))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (rnd.nextInt(3) == 0) texts(rnd.nextInt(texts.size)) else t)
      }
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toVector }
      val occ = toks.flatMap { case (id, ts) =>
        if (ts.size >= n) (1 to ts.size - n + 1)
          .map(p => (ts.slice(p - 1, p - 1 + n).mkString(" "), id, p))
        else Nil
      }
      val marked = occ.groupBy(_._1).values
        .flatMap(os => if (os.size > 1) os.sortBy(o => (o._2, o._3)).tail else Nil)
        .toSeq.groupBy(_._2).map { case (id, os) => id -> os.map(_._3).toSet }
      val model = toks.collect { case (id, ts) if ts.nonEmpty =>
        val hits = marked.getOrElse(id, Set.empty[Int])
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !hits.exists(p => p <= i + 1 && i + 1 < p + n) => t }
        (id, ts.size.toLong, kept.size.toLong,
          if (kept.isEmpty) 0L else polyhash(kept.mkString(" ")))
      }.toSet
      val got = TextDedup.selfScrub(
          docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == model, s"trial $trial")
    }
  }
}
