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
}
