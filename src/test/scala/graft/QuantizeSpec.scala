package graft

import graft.ops.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: symmetric per-vector scale, zero-vector guard, reconstructable") {
    val vecs = Seq(
      (1L, Array(2.0f, -4.0f)),  // scale = 127/4 = 31.75
      (2L, Array(0.0f, 0.0f)),   // zero vector -> scale 0, codes 0
      (3L, Array(1.0f))).toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs, "vec_id", "embedding")
      .as[(Long, Seq[Byte], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Seq[Byte](63, -127), 31.75)))  // floor(2*31.75), floor(-4*31.75)
    assert(out(2L) == ((Seq[Byte](0, 0), 0.0)))
    assert(out(3L) == ((Seq[Byte](127), 127.0)))
    // reconstruction: q/scale within one quantum of the original
    val (q1, s1) = out(1L)
    assert(math.abs(q1(0) / s1 - 2.0) <= 1.0 / s1)
    assert(math.abs(q1(1) / s1 - (-4.0)) <= 1.0 / s1)
  }
}
