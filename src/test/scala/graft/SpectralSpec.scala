package graft

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.ops.Spectral

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("scores align with the dominant axis on an anisotropic cloud") {
    // 20 vectors stretched along dim 0, noise elsewhere: the top
    // component is (±)e0, so |score| must order by |x0|.
    val rnd = new Random(5L)
    val rows = (1 to 20).map { i =>
      val x0 = (i - 10).toFloat * 2f
      (i.toLong, Array(x0, rnd.nextFloat() * 0.1f, rnd.nextFloat() * 0.1f))
    }
    val out = Spectral.topComponentScores(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2)
      .as[(Long, Long)].collect().toMap
    val byAxis = rows.sortBy { case (_, v) => -math.abs(v(0)) }.map(_._1)
    val byScore = out.toSeq.sortBy { case (_, s) => -math.abs(s) }.map(_._1)
    assert(byAxis.take(3).toSet == byScore.take(3).toSet,
      s"top-|x0| ids ${byAxis.take(3)} vs top-|score| ids ${byScore.take(3)}")
  }

  test("empty corpus and overflow-scale magnitudes fail with named preconditions") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Spectral.topComponentScores(empty, "vec_id", "embedding", 1)
    }
    assert(e1.getMessage.contains("non-empty"))
    // |element| = 10^7 quantizes to 10^13; at dims=2 the long dot bound
    // (Long.MaxValue / 10^6 / 2 ≈ 4.6·10^12) is exceeded → named error,
    // not silently corrupt scores.
    val huge = Seq((1L, Array(1e7f, -1e7f)), (2L, Array(5e6f, 5e6f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Spectral.topComponentScores(huge, "vec_id", "embedding", 1)
    }
    assert(e2.getMessage.contains("overflow"))
  }

  test("high-dims exploded aggregate == in-memory integer model (same math)") {
    // dims above WideAggLimit take the posexplode spelling — it must
    // produce the IDENTICAL integer result as the wide-column path and
    // the plain BigInt model.
    val dims = Spectral.WideAggLimit + 28
    val rnd = new Random(41L)
    val rows = (1 to 25).map(i =>
      (i.toLong, Array.fill(dims)((rnd.nextFloat() - 0.5f) * 2f)))
    val S = 1000000L
    val qe = rows.map { case (id, v) => id -> v.map(x => math.floor(x.toDouble * S).toLong) }
    var vv = Array.fill(dims)(BigInt(S))
    (1 to 2).foreach { _ =>
      val dots = qe.map { case (id, q) =>
        id -> (0 until dims).map(i => BigInt(q(i)) * vv(i)).sum }.toMap
      val w = (0 until dims).map(i => qe.map { case (id, q) => dots(id) * q(i) }.sum)
      val m = w.map(_.abs).max
      vv = w.map(x => x * S / m).toArray
    }
    val model = qe.map { case (id, q) =>
      id -> (0 until dims).map(i => BigInt(q(i)) * vv(i)).sum.toLong }.toMap
    val got = Spectral.topComponentScores(rows.toDF("vec_id", "embedding").repartition(5),
      "vec_id", "embedding", 2).as[(Long, Long)].collect().toMap
    assert(got == model)
  }

  test("bit-identical across partitionings == in-memory integer model") {
    val rnd = new Random(77L)
    val rows = (1 to 30).map(i =>
      (i.toLong, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f)))
    // model: same quantized arithmetic in plain BigInt
    val S = 1000000L
    val qe = rows.map { case (id, v) => id -> v.map(x => math.floor(x.toDouble * S).toLong) }
    var vv = Array.fill(4)(BigInt(S))
    (1 to 2).foreach { _ =>
      val dots = qe.map { case (id, q) =>
        id -> (0 until 4).map(i => BigInt(q(i)) * vv(i)).sum }.toMap
      val w = (0 until 4).map(i => qe.map { case (id, q) => dots(id) * q(i) }.sum)
      val m = w.map(_.abs).max
      vv = w.map(x => x * S / m).toArray
    }
    val model = qe.map { case (id, q) =>
      id -> (0 until 4).map(i => BigInt(q(i)) * vv(i)).sum.toLong }.toMap
    val one = Spectral.topComponentScores(rows.toDF("vec_id", "embedding").coalesce(1),
      "vec_id", "embedding", 2).as[(Long, Long)].collect().toMap
    val many = Spectral.topComponentScores(rows.toDF("vec_id", "embedding").repartition(7),
      "vec_id", "embedding", 2).as[(Long, Long)].collect().toMap
    assert(one == model && many == model)
  }

  test("anisotropyPpm: identical, opposite, orthogonal and degenerate corpora") {
    def run(vs: Seq[Seq[Double]]): (Long, Long, Long, Long) =
      Spectral.anisotropyPpm(vs.map(Tuple1(_)).toDF("embedding"), "embedding")
        .as[(Long, Long, Long, Long)].collect().head
    // two copies of e1: every pair dot = norm^2 -> ratio exactly 1e6
    assert(run(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0))) == (2L, 2L, 1000000L, 1000000L))
    // opposite vectors: mean pair dot = -norm^2 -> -1e6
    assert(run(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))) == (2L, 2L, -1000000L, -1000000L))
    // orthogonal: S = T -> both read 0
    assert(run(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))) == (2L, 2L, 0L, 0L))
    // single vector: no pairs, both 0 by definition
    assert(run(Seq(Seq(1.0, 0.0))) == (1L, 2L, 0L, 0L))
  }
}
