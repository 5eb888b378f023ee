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

  test("pqCodes: nearest codebook subvector wins, ties to the smaller code") {
    import graft.ops.Quantize
    // dims=4, m=2, ksub=2: codebook = vectors 0 and 1
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (1L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.1f, 0.1f, 0.1f, 0.1f)),   // sub0 -> code 0, sub1 -> code 1
      (3L, Array(0.9f, 0.9f, 0.9f, 0.9f)))   // sub0 -> code 1, sub1 -> code 0
      .toDF("vec_id", "embedding")
    val out = Quantize.pqCodes(vecs, "vec_id", "embedding", m = 2, ksub = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 0L), (0L, 1L, 0L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 0L), (2L, 1L, 1L),
      (3L, 0L, 1L), (3L, 1L, 0L)))
    // exact tie (equidistant): smaller code wins
    val tie = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val t = Quantize.pqCodes(tie, "vec_id", "embedding", m = 1, ksub = 2)
      .as[(Long, Long, Long)].collect().filter(_._1 == 2L).head
    assert(t == ((2L, 0L, 0L)))
  }

  test("pqAdcTopK: table-lookup distances rank the obvious neighbor first") {
    import graft.ops.Quantize
    // dims=4, m=2, ksub=2; corpus clusters around the two codebook vecs
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (1L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.05f, 0.0f, 1.0f, 0.9f)),   // near vec 0
      (3L, Array(0.9f, 1.0f, 0.1f, 0.0f)))    // near vec 1
      .toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val out = Quantize.pqAdcTopK(vecs, vecs.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 1, m = 2, ksub = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // ADC distance of a same-code vector is the query-to-centroid
    // distance: query 0's nearest compressed neighbor is vec 2 (codes
    // (0,0)), query 1's is vec 3 (codes (1,1))
    assert(out == Map(0L -> 2L, 1L -> 3L))
  }
}
