package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

class SkewExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join, spread over salt buckets") {
    val facts = (1 to 1000).map(i => (if (i % 10 == 0) 1 else i, s"f$i"))
      .toDF("key", "payload") // key 1 is hot
    val dims = Seq((1, "hot"), (2, "cold"), (500, "mid")).toDF("key", "name")
    val plain = facts.join(dims, "key").select("key", "payload", "name")
      .as[(Int, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(facts, dims, "key", 8,
        Seq(col("payload")))
      .select("key", "payload", "name")
      .as[(Int, String, String)].collect().toSet
    assert(salted == plain)
    // i=1 plus every multiple of 10 maps to the hot key
    assert(plain.count(_._1 == 1) == 101)
  }

  test("SparkSessionExtensions injects graft functions into SQL") {
    // force a NEW session over the same SparkContext: with an active
    // session, getOrCreate would return it unchanged. withExtensions is
    // the public injector hook (spark.sql.extensions is a STATIC conf —
    // settable only at context launch; in production it goes on
    // spark-submit, here the builder hook drives the same class).
    // Never stop() the new session — the context is shared.
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftSparkExtensions())
        .getOrCreate()
      val row = s2.sql(
        """SELECT normalize_text('Código do Item') AS n,
          |       graft_polyhash('abc') AS h,
          |       graft_dot(array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT)),
          |                 array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d
          |""".stripMargin).head()
      assert(row.getString(0) == "CODIGO_DO_ITEM")
      assert(row.getLong(1) == 96354L)
      assert(row.getDouble(2) == 1.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
