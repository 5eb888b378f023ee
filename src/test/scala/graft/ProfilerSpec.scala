package graft

import org.apache.spark.sql.functions._

import graft.ops.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("discrete quantiles pick the ceil(n·p/100)-ranked row per group") {
    // group a: values 1..10 → p50 = row 5, p90 = row 9, p100 = row 10
    val df = (1 to 10).map(v => ("a", v.toLong, v.toLong)) .toDF("g", "id", "v")
    val out = Profiler.discreteQuantiles(df, "g", col("v"), col("id"),
        Seq(50, 90, 100))
      .orderBy("pct").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 50L, 5L), ("a", 90L, 9L), ("a", 100L, 10L)))
  }

  test("quantiles are layout-independent under value ties") {
    // all values equal: any row satisfies the value order; the tiebreak
    // must make the CHOSEN row (hence any carried columns) stable
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toLong, 7L)).toDF("g", "id", "v")
    val a = Profiler.discreteQuantiles(df.repartition(3), "g", col("v"), col("id"), Seq(50))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val b = Profiler.discreteQuantiles(df.repartition(17), "g", col("v"), col("id"), Seq(50))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.forall(_._3 == 7L))
  }

  test("a single row answers every percentile with its own value") {
    val df = Seq(("a", 1L, 42L)).toDF("g", "id", "v")
    val out = Profiler.discreteQuantiles(df, "g", col("v"), col("id"), Seq(1, 50, 99))
    assert(out.select("value").as[Long].collect().toSeq == Seq(42L, 42L, 42L))
  }
}
