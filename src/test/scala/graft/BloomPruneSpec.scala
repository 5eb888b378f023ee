package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val big = (1 to 2000).map(i => (i.toLong, s"key$i")).toDF("id", "k")
  private val keys = (1 to 2000).filter(_ % 37 == 0)
    .map(i => s"key$i").toDF("bk")

  test("pruned semi join == plain semi join (false positives removed)") {
    val got = BloomPrune.prunedSemiJoin(big, keys, col("k"), col("bk"))
      .select("id").as[Long].collect().toSet
    val exp = (1 to 2000).filter(_ % 37 == 0).map(_.toLong).toSet
    assert(got == exp)
  }

  test("bloom probe passes every present key (no false negatives) and prunes hard") {
    val (total, survivors) = BloomPrune.pruneDiag(big, keys, col("k"), col("bk"))
    assert(total == 2000L)
    // every true match must survive the probe
    assert(survivors >= 54L) // 2000/37 = 54 true matches
    // with m=65536 bits, k=2, 54 keys: false-positive rate ~ (108/65536)^2
    // — essentially zero at this size; allow a loose factor anyway
    assert(survivors <= 200L, s"bloom pruned too little: $survivors/2000 survive")
  }

  test("tiny bitmap still exact, just prunes less") {
    val got = BloomPrune.prunedSemiJoin(big, keys, col("k"), col("bk"),
        mBits = 64, k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == (1 to 2000).filter(_ % 37 == 0).map(_.toLong).toSet)
  }

  test("empty key set matches nothing") {
    val got = BloomPrune.prunedSemiJoin(big, keys.filter(col("bk") === "nope"),
      col("k"), col("bk"))
    assert(got.count() == 0L)
  }
}
