package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst keeps the first row under a total order") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (2, 9, "z")).toDF("k", "ord", "v")
    val out = Relational.dedupKeepFirst(df, Seq("k"), Seq(col("ord").asc))
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 2 -> "z"))
  }

  test("appendIgnore: ON CONFLICT DO NOTHING semantics + re-run idempotence") {
    val existing = Seq((1, "old"), (2, "old")).toDF("pk", "v")
    val incoming = Seq((2, "new"), (3, "new")).toDF("pk", "v")
    val out = Relational.appendIgnore(existing, incoming, Seq("pk"))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "old", 2 -> "old", 3 -> "new"))
    val again = Relational.appendIgnore(
      Relational.appendIgnore(existing, incoming, Seq("pk")), incoming, Seq("pk"))
    assert(again.count() == 3)
  }

  test("upsert: incoming wins, absent kept, tiebreak orders multi-row batches") {
    val existing = Seq((1, "old"), (2, "old")).toDF("pk", "v")
    val incoming = Seq((2, "b"), (2, "a"), (3, "c")).toDF("pk", "v")
    val out = Relational.upsert(existing, incoming, Seq("pk"), Seq(col("v").asc))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "old", 2 -> "a", 3 -> "c"))
  }

  test("replacePeriod swaps exactly the predicated slice") {
    val table = Seq((1, "jan"), (2, "feb")).toDF("m", "v")
    val repl = Seq((1, "JAN2")).toDF("m", "v")
    val out = Relational.replacePeriod(table, repl, col("m") === 1)
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "JAN2", 2 -> "feb"))
  }

  test("unionView tags each side with the discriminator") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, "y")).toDF("id", "name")
    val out = Relational.unionView(Seq((a, "A"), (b, "B")), "tipo")
      .select("id", "tipo").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "A", 2 -> "B"))
  }

  test("enrichWithFallback: details win, template fills the gaps") {
    val base = Seq(1, 2).toDF("codigo")
    val lookup = Seq((1, "real")).toDF("codigo", "nome")
    val out = Relational.enrichWithFallback(base, lookup, Seq("codigo"),
        Seq(("descricao", col("nome"),
          concat(lit("DESCONHECIDO_"), col("codigo").cast("string")))))
      .select("codigo", "descricao").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "real", 2 -> "DESCONHECIDO_2"))
  }

  test("scd2Intervals: half-open chain per key, tie-broken, open tail null") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-02 00:00:00")),
      (3L, 10L, ts("2024-01-02 00:00:00")), // tie: event_id orders it
      (4L, 20L, ts("2024-03-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Relational.scd2Intervals(df, Seq("user_id"), col("ts"), col("event_id"))
      .select("event_id", "valid_from", "valid_to")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")))))
    assert(out(2L) == ((ts("2024-01-02 00:00:00"), Some(ts("2024-01-02 00:00:00")))))
    assert(out(3L) == ((ts("2024-01-02 00:00:00"), None))) // chain tail
    assert(out(4L) == ((ts("2024-03-01 00:00:00"), None))) // other key
  }

  test("snapshotDiff: insert/delete/update classified, unchanged dropped") {
    val olds = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val news = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("k", "v")
    val out = Relational.snapshotDiff(olds, news, Seq("k"), Seq("v"))
      .select("k", "change_type", "old_v", "new_v")
      .as[(Long, String, Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> (("delete", Some("a"), None)),
      3L -> (("update", Some("c"), Some("c2"))),
      4L -> (("insert", None, Some("d")))))
  }

  test("snapshotDiff: NULL<->value transitions are updates, NULL==NULL is unchanged") {
    val olds = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val news = Seq((1L, Some("now")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val out = Relational.snapshotDiff(olds, news, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "update", 2L -> "update")) // 3 = unchanged, dropped
  }
}
