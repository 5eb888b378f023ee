package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.store.TableStore
import graft.streaming.StreamingLoad
import graft.streaming.StreamingLoad.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file stream + foreachBatch reuses the append-ignore load (idempotent)") {
    val staging = tmpDir("graft_stream_staging")
    val store = new TableStore(spark, tmpDir("graft_stream_wh"))
    val schema = "item_codigo INT, tipo_item STRING, data_referencia DATE, " +
      "tipo_manutencao STRING, descricao_item STRING"
    val q = StreamingLoad.fileLoadStream(spark, staging,
        org.apache.spark.sql.types.StructType.fromDDL(schema),
        store, "manutencoes_historico")
      .option("checkpointLocation", tmpDir("graft_stream_ckpt"))
      .start()
    try {
      Files.write(Paths.get(staging, "batch1.csv"),
        ("item_codigo;tipo_item;data_referencia;tipo_manutencao;descricao_item\n" +
          "1;INSUMO;2025-01-01;ALTERACAO;A\n2;INSUMO;2025-01-01;ALTERACAO;B\n").getBytes)
      q.processAllAvailable()
      assert(store.read("manutencoes_historico").count() == 2)
      // re-delivered + one new row: conflict policy absorbs the dups
      Files.write(Paths.get(staging, "batch2.csv"),
        ("item_codigo;tipo_item;data_referencia;tipo_manutencao;descricao_item\n" +
          "1;INSUMO;2025-01-01;ALTERACAO;A\n3;INSUMO;2025-02-01;ALTERACAO;C\n").getBytes)
      q.processAllAvailable()
      assert(store.read("manutencoes_historico").count() == 3)
    } finally q.stop()
  }

  test("watermarked hourly aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingLoad.eventsHourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(h: Int, m: Int, t: String, v: Double) =
        Event(1L, Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00"), t, v)
      mem.addData(ev(10, 5, "view", 1.0), ev(10, 40, "view", 2.0), ev(11, 10, "click", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close hours 10 and 11
      mem.addData(ev(15, 0, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("hourly_test")
        .select($"hour".cast("string"), $"event_type", $"n", $"total")
        .as[(String, String, Long, Double)].collect().toSet
      assert(out.contains(("2025-01-01 10:00:00", "view", 2L, 3.0)))
      assert(out.contains(("2025-01-01 11:00:00", "click", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup: first arrival wins, state bounded by the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingLoad.dedupStream(
        mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (1L, "alpha", t("2025-01-01 10:00:00")),
        (2L, "alpha", t("2025-01-01 10:00:30")), // dup within batch
        (3L, "beta", t("2025-01-01 10:01:00")))
      q.processAllAvailable()
      mem.addData((4L, "alpha", t("2025-01-01 10:02:00"))) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"only first arrivals should pass, got $ids")
    } finally q.stop()
  }

  test("sessionization with custom keyed state emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingLoad.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append).start()
    try {
      // two bursts 2h apart -> first burst closes when the second arrives
      mem.addData(
        Event(7L, Timestamp.valueOf("2025-01-01 10:00:00"), "view", 1.0),
        Event(7L, Timestamp.valueOf("2025-01-01 10:05:00"), "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(7L, Timestamp.valueOf("2025-01-01 12:00:00"), "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("sessions_test")
        .select($"user_id", $"start".cast("string"), $"n_events", $"total")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(out.contains((7L, "2025-01-01 10:00:00", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming transitions equal the batch lag window across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import StreamingLoad.TransEvent
    val evs = (1 to 60).map { i =>
      TransEvent(i.toLong % 5, new Timestamp(1700000000000L + i * 60000L),
        s"t${i % 3}", i.toLong)
    }
    val mem = MemoryStream[TransEvent]
    val q = StreamingLoad.transitionsStream(mem.toDS())
      .writeStream.format("memory").queryName("trans_test")
      .outputMode(OutputMode.Append).start()
    try {
      // per-user ts-ordered arrival, split mid-stream: the cross-batch
      // transition (last event of batch 1 → first of batch 2 per user)
      // must still be emitted exactly once
      mem.addData(evs.take(25): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(25): _*)
      q.processAllAvailable()
      val stream = spark.table("trans_test")
        .groupBy("from_type", "to_type").count()
        .as[(String, String, Long)].collect().toSet
      val batch = graft.ops.Behavior.transitionMatrixPpm(
          evs.toDF(), "user_id", "event_type", "ts", "event_id")
        .select(col("from_type"), col("to_type"), col("n_trans"))
        .as[(String, String, Long)].collect().toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("streaming KMV sketch converges to the batch sketch, state stays bottom-k") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(String, String)]
    val q = StreamingLoad.kmvStream(mem.toDF().toDF("g", "v"), "g", "v", k = 16)
      .writeStream.format("memory").queryName("kmv_test")
      .outputMode(OutputMode.Update).start()
    try {
      // values arrive across two triggers, interleaved and duplicated
      mem.addData((1 to 300).map(i => ("a", s"tok$i")): _*)
      q.processAllAvailable()
      mem.addData((150 to 500).map(i => ("a", s"tok$i")): _*)
      q.processAllAvailable()
      val emitted = spark.table("kmv_test").as[(String, Long, Long)].collect().toSeq
      // the final trigger's emission is the sketch of the UNION — it
      // must equal the batch sketch over the same values
      val batch = graft.ops.Sketches.kmvDistinct(
          (1 to 500).map(i => ("a", s"tok$i")).toDF("g", "v"), "g", col("v"), k = 16)
        .as[(String, Long, Long)].head()
      assert(emitted.contains(batch), s"stream $emitted missing batch $batch")
      assert(emitted.forall(_._2 <= 16L)) // state capped at k throughout
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch registers across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(String, String)]
    val q = StreamingLoad.hllStream(mem.toDF().toDF("g", "v"), "g", "v", p = 6)
      .writeStream.format("memory").queryName("hll_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1 to 400).map(i => ("a", s"user$i")): _*)
      q.processAllAvailable()
      mem.addData((200 to 900).map(i => ("a", s"user$i")): _*)
      q.processAllAvailable()
      // last emission per bucket = register over the union of batches
      val finalRegs = spark.table("hll_test")
        .groupBy($"group", $"bucket")
        .agg(org.apache.spark.sql.functions.max($"register").as("register"))
        .as[(String, Long, Long)].collect().toSet
      val batch = graft.ops.Sketches.hllRegisters(
          (1 to 900).map(i => ("a", s"user$i")).toDF("g", "v"), "g", col("v"), p = 6)
        .as[(String, Long, Long)].collect().toSet
      assert(finalRegs == batch)
      assert(finalRegs.size <= 64) // state bounded at 2^p per group
    } finally q.stop()
  }

  test("streaming qsketch cells converge to the batch sketch across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(String, Long)]
    val q = StreamingLoad.qsketchStream(mem.toDF().toDF("g", "v"), "g", "v",
        subBits = 4)
      .writeStream.format("memory").queryName("qsketch_test")
      .outputMode(OutputMode.Update).start()
    try {
      // values arrive across two triggers with overlap, ties, and a zero
      mem.addData((0 to 600).map(i => ("a", (i.toLong * i) % 100000L)): _*)
      q.processAllAvailable()
      mem.addData((300 to 1000).map(i => ("a", (i.toLong * i) % 100000L)): _*)
      q.processAllAvailable()
      // last emission per cell = count over the union of batches
      val finalCells = spark.table("qsketch_test")
        .groupBy($"group", $"e", $"m")
        .agg(org.apache.spark.sql.functions.max($"cnt").as("cnt"))
        .as[(String, Long, Long, Long)].collect().toSet
      val batch = graft.ops.Sketches.qsketchCells(
          ((0 to 600) ++ (300 to 1000)).map(i => ("a", (i.toLong * i) % 100000L))
            .toDF("g", "v"), "g", col("v"), subBits = 4)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(finalCells == batch)
      // state bounded: ≤ 1 + 2^4 + 16 cells per exponent 4..16 (v < 10^5)
      assert(finalCells.size <= 1 + 16 + 16 * 13)
      // quantiles read off the streamed cells match the batch read side
      val streamQ = graft.ops.Sketches.qsketchQuantiles(
          spark.table("qsketch_test").groupBy($"group", $"e", $"m")
            .agg(org.apache.spark.sql.functions.max($"cnt").as("cnt"))
            .withColumnRenamed("group", "g"),
          "g", Seq(50, 99), subBits = 4)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val batchQ = graft.ops.Sketches.qsketchQuantiles(
          graft.ops.Sketches.qsketchCells(
            ((0 to 600) ++ (300 to 1000)).map(i => ("a", (i.toLong * i) % 100000L))
              .toDF("g", "v"), "g", col("v"), subBits = 4),
          "g", Seq(50, 99), subBits = 4)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(streamQ == batchQ)
    } finally q.stop()
  }

  test("streaming drift vs a pinned baseline equals the batch cell drift") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260819L)
    val baseRows = (1 to 400).map(_ => ("a", rnd.nextInt(2000).toLong)) ++
      (1 to 300).map(_ => ("b", rnd.nextInt(800).toLong))
    val liveRows = (1 to 350).map(_ => ("a", rnd.nextInt(2000).toLong + 300)) ++
      (1 to 250).map(_ => ("b", rnd.nextInt(800).toLong)) ++
      (1 to 60).map(_ => ("c", rnd.nextInt(500).toLong)) // no baseline
    val baseline = graft.ops.Sketches.qsketchCells(
      baseRows.toDF("g", "v"), "g", col("v"), subBits = 4).localCheckpoint()
    val mem = MemoryStream[(String, Long)]
    val q = StreamingLoad.driftStream(mem.toDF().toDF("g", "v"), "g", "v",
        baseline, subBits = 4)
      .writeStream.format("memory").queryName("drift_test")
      .outputMode(OutputMode.Update).start()
    try {
      // three uneven trigger cuts
      mem.addData(liveRows.take(200): _*); q.processAllAvailable()
      mem.addData(liveRows.slice(200, 480): _*); q.processAllAvailable()
      mem.addData(liveRows.drop(480): _*); q.processAllAvailable()
      // last emission per group (n_live grows monotonically per group)
      val last = spark.table("drift_test")
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"group")
            .orderBy($"n_live".desc)))
        .filter($"rn" === 1).drop("rn")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      // batch twins: baseline as "a...", live union as "b..." so
      // g_a = baseline side in the pairwise frames
      def two(g: String) = baseline.filter(col("g") === g)
        .select(org.apache.spark.sql.functions.lit("base").as("g"),
          col("e"), col("m"), col("cnt"))
        .unionByName(graft.ops.Sketches.qsketchCells(
          liveRows.filter(_._1 == g).toDF("g", "v"), "g", col("v"), 4)
          .select(org.apache.spark.sql.functions.lit("live").as("g"),
            col("e"), col("m"), col("cnt")))
      for (g <- Seq("a", "b")) {
        val ks = graft.ops.Profiler.ksStatFromCells(two(g), "g")
          .as[(String, String, Long, Long, Long)].collect().head
        val l1 = graft.ops.Profiler.driftFromCells(two(g), "g")
          .as[(String, String, Long)].collect().head
        assert(last(g) == ((ks._3, ks._4, ks._5, l1._3)),
          s"group $g: stream ${last(g)} vs batch (${ks._3},${ks._4},${ks._5},${l1._3})")
      }
      // group with no baseline reads total drift by contract
      assert(last("c")._1 == 0L && last("c")._3 == 1000000L)
      assert(last("c")._4 <= 1000000L && last("c")._4 > 990000L)
    } finally q.stop()
  }

  test("stream-static incremental dedup equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val corpus = (1 to 30).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon token$i end")).toDF("doc_id", "text")
    val bandIdx = graft.ops.TextDedup.corpusBandIndex(corpus, "doc_id", "text")
      .cache() // the static side every micro-batch joins against
    // new docs: truncations of corpus docs → genuine near-dup candidates
    val newDocs = (1 to 30 by 3).map(i =>
      (1000L + i, s"alpha beta gamma delta epsilon token$i"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingLoad.dedupAgainstCorpusStream(
        mem.toDF().toDF("doc_id", "text"), bandIdx, "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(newDocs.take(5): _*)
      q.processAllAvailable()
      mem.addData(newDocs.drop(5): _*)
      q.processAllAvailable()
      val streamed = spark.table("dedup_stream")
        .as[(Long, Long, Double)].collect().toSet // per-band dups collapse here
      val batch = graft.ops.TextDedup.minhashCandidatesAgainst(
          newDocs.toDF("doc_id", "text"), corpus, "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(batch.nonEmpty) // the fixture must actually produce candidates
    } finally { q.stop(); bandIdx.unpersist() }
  }

  test("streaming histogram cells equal the batch cells over all triggers") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(String, Long)]
    // histogramCells is a plain select + keyed count — stream-safe as
    // is; state is |occupied bins| per group, the operator's design
    // claim, and Update mode re-emits cells as they grow.
    val q = graft.ops.Profiler.histogramCells(
        mem.toDF().toDF("g", "v"), "g", col("v"), 8L)
      .writeStream.format("memory").queryName("hist_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1 to 400).map(i => ("a", (i % 61).toLong)): _*)
      q.processAllAvailable()
      mem.addData((1 to 300).map(i => ("b", (i % 23).toLong)) ++
        (1 to 100).map(i => ("a", (i % 61).toLong)): _*)
      q.processAllAvailable()
      val streamed = spark.table("hist_test").as[(String, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.map(_._3).max }
      val batch = graft.ops.Profiler.histogramCells(
          ((1 to 400).map(i => ("a", (i % 61).toLong)) ++
           (1 to 300).map(i => ("b", (i % 23).toLong)) ++
           (1 to 100).map(i => ("a", (i % 61).toLong))).toDF("g", "v"),
          "g", col("v"), 8L)
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("incremental dedup: two sequential steps equal one combined step") {
    import org.apache.spark.sql.functions.{col, greatest, least}
    // corpus + two arrivals, with duplicates WITHIN b2 and ACROSS b1/b2:
    // a cross-arrival duplicate surfaces as within-batch in the combined
    // run but as new-vs-corpus in the sequential run (b1 indexed by
    // then) — orientation-normalized pair sets must coincide.
    val corpus = (1 to 20).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon token$i end")).toDF("doc_id", "text")
    val b1 = (1 to 10).map(i =>
      (100L + i, s"alpha beta gamma delta epsilon token$i")).toDF("doc_id", "text")
    val b2 = ((11 to 20).map(i =>
        (200L + i, s"alpha beta gamma delta epsilon token$i")) ++
      Seq((301L, "alpha beta gamma delta epsilon token3"), // dup of b1's 103
          (302L, "alpha beta gamma delta epsilon token15"))) // dup of b2's 215
      .toDF("doc_id", "text")
    def norm(pairs: org.apache.spark.sql.DataFrame) = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"), col("est_jaccard"))
      .distinct().as[(Long, Long, Double)].collect().toSet
    val idx0 = graft.ops.TextDedup.corpusBandIndex(corpus, "doc_id", "text")
    val s1 = graft.ops.TextDedup.incrementalDedupStep(b1, idx0, "doc_id", "text")
    val s2 = graft.ops.TextDedup.incrementalDedupStep(b2, s1.index, "doc_id", "text")
    val combined = graft.ops.TextDedup.incrementalDedupStep(
      b1.unionByName(b2), idx0, "doc_id", "text")
    val sequential = norm(s1.pairs) ++ norm(s2.pairs)
    assert(sequential == norm(combined.pairs),
      s"sequential $sequential != combined ${norm(combined.pairs)}")
    // the fixture must exercise every pair class
    assert(s2.pairs.filter(col("pair_src") === "batch").count() > 0)
    assert(s2.pairs.filter(col("pair_src") === "corpus").count() > 0)
    // and the grown indexes must agree row-for-row
    val idxSeq = s2.index.select("id", "band", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    val idxCmb = combined.index.select("id", "band", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    assert(idxSeq == idxCmb)
  }

  test("streaming count-min matrix equals the batch sketch over all batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(Long, String)]
    val q = StreamingLoad.countMinStream(
        mem.toDF().toDF("doc_id", "text"), "text", depth = 3, width = 16)
      .writeStream.format("memory").queryName("cm_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1 to 120).map(i => (i.toLong, s"w${i % 9} w${i % 5}")): _*)
      q.processAllAvailable()
      mem.addData((121 to 250).map(i => (i.toLong, s"w${i % 9} w${i % 7}")): _*)
      q.processAllAvailable()
      // latest emission per (j, cell) must equal the batch matrix over
      // the union of both batches (counter merge is order-free)
      val streamed = spark.table("cm_test").as[(Int, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.map(_._3).max }
      val batch = graft.ops.Sketches.countMinCells(
          ((1 to 120).map(i => (i.toLong, s"w${i % 9} w${i % 5}")) ++
           (121 to 250).map(i => (i.toLong, s"w${i % 9} w${i % 7}")))
            .toDF("doc_id", "text"), "text", 3, 16)
        .as[(Int, Long, Long)].collect()
        .map { case (j, c, n) => (j, c) -> n }.toMap
      assert(streamed == batch, s"stream matrix != batch matrix")
      assert(streamed.size <= 3 * 16) // bounded state
    } finally q.stop()
  }

  test("streaming digest over split batches equals the batch digest") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val rows = (1 to 400).map(i => (i.toLong, i * 11L % 101))
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingLoad.digestStream(mem.toDF().toDF("a", "b"),
        pmod(col("a"), lit(3L)), Seq(col("a"), col("b")))
      .writeStream.format("memory").queryName("digest_test")
      .outputMode(OutputMode.Update).start()
    try {
      // arbitrary batch cut + shuffled arrival order inside each batch
      val (first, second) = scala.util.Random.shuffle(rows).splitAt(157)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      val batch = graft.ops.Profiler.datasetDigest(rows.toDF("a", "b"),
          pmod(col("a"), lit(3L)), Seq(col("a"), col("b")))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      // the LAST emission per shard is the digest of the union
      val last = spark.table("digest_test")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (_, emits) => emits.maxBy(_._2) }.toSet
      assert(last == batch, s"stream $last != batch $batch")
    } finally q.stop()
  }

  test("streaming contract checks over split batches equal the batch sweep") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, length}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 300L).map(i =>
      (i, if (i % 7 == 0) "" else "x" * (i % 5).toInt, (i % 5))).toSeq
    val mem = MemoryStream[(Long, String, Long)]
    val checks = Seq(
      "len_matches" -> (col("_3") =!= length(col("_2"))),
      "nonempty" -> (length(col("_2")) === 0))
    val q = StreamingLoad.contractStream(mem.toDF(), checks)
      .writeStream.format("memory").queryName("contract_test")
      .outputMode(OutputMode.Update).start()
    try {
      val (first, second) = scala.util.Random.shuffle(rows).splitAt(113)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      val batch = graft.ops.Profiler.contractChecks(rows.toDF("_1", "_2", "_3"), checks)
        .as[(String, Long, Long, Long)].collect().toSet
      val last = spark.table("contract_test")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (_, emits) => emits.maxBy(_._2) }.toSet
      assert(last == batch, s"stream $last != batch $batch")
    } finally q.stop()
  }

  test("benford stream == batch digit counts across arbitrary batch cuts") {
    val rnd = new scala.util.Random(83)
    val rows = (1 to 400).map(_ =>
      (math.floor(math.pow(10.0, rnd.nextDouble() * 4)).toLong,
        rnd.nextInt(50).toLong - 10))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingLoad.benfordStream(mem.toDF().toDF("a", "b"), Seq("a", "b"))
      .writeStream.format("memory").queryName("benford_test")
      .outputMode(OutputMode.Update).start()
    try {
      val (first, second) = scala.util.Random.shuffle(rows).splitAt(137)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      val batch = graft.ops.Profiler.benfordPpm(rows.toDF("a", "b"), Seq("a", "b"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
      val last = spark.table("benford_test")
        .as[(String, Seq[Long], Long)].collect()
        .groupBy(_._1).map { case (_, emits) => emits.maxBy(_._3) }
        .map(o => o._1 -> o._2.zipWithIndex
          .collect { case (n, i) if n > 0 => (i + 1L) -> n }.toMap)
        .toMap
      assert(last == batch, s"stream $last != batch $batch")
    } finally q.stop()
  }

  test("streaming calibration bins equal the batch op across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (50000L, 0L), (150000L, 0L), (850000L, 1L), (850000L, 0L),
      (1000000L, 1L), (120000L, 1L), (870000L, 1L))
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingLoad.calibrationStream(mem.toDF()
        .toDF("score", "label"), "score", "label", bins = 10)
      .writeStream.format("memory").queryName("calib_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      // latest update per bin (the one with the largest count — counts
      // are strictly monotone per bin) == the batch result over all rows
      val got = spark.table("calib_test")
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map(_._2.maxBy(_._2)).toSeq.sortBy(_._1)
      val batch = graft.ops.EvalMetrics.calibrationBins(
          rows.toDF("score", "label"),
          org.apache.spark.sql.functions.col("score"),
          org.apache.spark.sql.functions.col("label"), bins = 10)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming PII density equals the batch rollup across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      ("s1", "write to bob@example.com or call 555-1234 now"),
      ("s1", "clean text here"),
      ("s2", "no pii at all in this one"),
      ("s1", "second mail x@y.io arrives later"))
    val mem = MemoryStream[(String, String)]
    val q = StreamingLoad.piiDensityStream(mem.toDF()
        .toDF("source", "text"), "source", "text")
      .writeStream.format("memory").queryName("pii_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("pii_test")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map(_._2.maxBy(_._2)).toSeq.sortBy(_._1)
      val batch = graft.ops.Profiler.piiDensityBySource(
          docs.toDF("source", "text"), "source", "text")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
        .toSeq.sortBy(_._1)
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming CUSUM equals the batch statistic at every trigger cut") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260826L)
    // group a shifts +8 at t=40, group b stays centered
    val series = for (g <- Seq("a", "b"); t <- 0 until 60) yield
      (g, t.toLong,
        (rnd.nextInt(15) - 7 + (if (g == "a" && t >= 40) 8 else 0)).toLong)
    val ordered = series.sortBy(_._2) // interleave groups, t ascending
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingLoad.cusumStream(mem.toDF().toDF("g", "t", "v"),
        "g", "t", "v", ref = 0L, threshold = 40L)
      .writeStream.format("memory").queryName("cusum_test")
      .outputMode(OutputMode.Update).start()
    try {
      val cuts = Seq(40, 90, 120) // uneven trigger cuts (rows, 2 groups)
      var off = 0
      val batch = graft.ops.Behavior.cusumSeries(series.toDF("g", "t", "v"),
          "g", "t", col("v"), ref = 0L, threshold = 40L)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r).toMap
      for (cut <- cuts) {
        mem.addData(ordered.slice(off, cut): _*); off = cut
        q.processAllAvailable()
        // the latest emission per group must equal the batch row at
        // that group's last ingested t
        val got = spark.table("cusum_test")
          .as[(String, Long, Long, Long, Long, Long)].collect()
          .groupBy(_._1).map(_._2.maxBy(_._2))
        got.foreach { r => assert(r == batch((r._1, r._2)), s"cut $cut: $r") }
      }
      val lastA = spark.table("cusum_test")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .filter(_._1 == "a").maxBy(_._2)
      assert(lastA._6 == 1L, "the shifted group must be in alarm at close")
    } finally q.stop()
  }

  test("streaming CUSUM raises loudly on out-of-order arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingLoad.cusumStream(mem.toDF().toDF("g", "t", "v"),
        "g", "t", "v", ref = 0L, threshold = 10L)
      .writeStream.format("memory").queryName("cusum_ooo_test")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("a", 5L, 1L)); q.processAllAvailable()
      mem.addData(("a", 4L, 1L)) // behind the watermark of its group
      val e = intercept[Throwable] { q.processAllAvailable() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("non-increasing point"), s"got: $msgs")
    } finally q.stop()
  }
}
