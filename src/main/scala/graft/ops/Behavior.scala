package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral / longitudinal analytics over an event stream table —
  * the engagement-measurement surface a data platform runs next to its
  * corpus pipeline (reference keeps per-run event logs but has no
  * longitudinal queries; beyond-reference, SURVEY §7.6).
  *
  * Scale discipline shared by all three operators: every stage is
  * either a scan-pushed filter, an equi-join on the user key, or a
  * map-side-combinable aggregate on a tiny key — no windows, no
  * driver-side state, no cross joins. Dates are compared as epoch-day
  * integers (UTC session) so results are engine- and layout-portable.
  */
object Behavior {

  /** X92: time-grid resampling with forward fill — regularize each
    * key's irregular event series onto a fixed `stepSec` grid: one row
    * per (key, grid bucket) across the key's observed span, carrying
    * the latest observation at-or-before the bucket plus a staleness
    * age. The feature-store primitive that turns raw logs into the
    * aligned time series a training pipeline joins on (and the dense
    * sibling of W2's forward-fill, which only fills existing rows).
    *
    * Deterministic "last in bucket": max over struct(event-time µs,
    * `tieCol`, value) — lexicographic, so any (ts, tie)-unique input
    * resamples identically on every engine/layout; the value itself
    * rides untouched (doubles are never summed or averaged — bit-exact
    * by construction).
    *
    * Shape: one aggregate to (key, bucket) — map-side combinable, the
    * only pass over event volume; a per-key span aggregate; the dense
    * grid is explode(sequence(lo, hi)) — grid rows = span/step per
    * key, the caller-bounded output size; then ONE per-key window for
    * the running last. The window's input is the GRID (bounded), never
    * the raw events — the q56 compaction discipline.
    *
    * @return (key, bucket, grid value `v`, `stale` = buckets since the
    *         carried observation, 0 where observed)
    */
  def resampleForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                          tieCol: String, valCol: String,
                          stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive: $stepSec")
    import org.apache.spark.sql.expressions.Window
    val stepUs = stepSec * 1000000L
    val obs = events
      // cast: event tables read as TIMESTAMP_NTZ; under the UTC session
      // this is exactly DuckDB's epoch_us on the same naive value
      .select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as("__u"),
        struct(unix_micros(col(tsCol).cast("timestamp")).as("u"),
          col(tieCol).as("t"), col(valCol).as("v")).as("__o"))
      .select(col("key"), expr(s"__u div $stepUs").as("bucket"), col("__o"))
      .groupBy("key", "bucket").agg(max(col("__o")).as("__m"))
      .select(col("key"), col("bucket"), col("__m").getField("v").as("__v"))
      .localCheckpoint(eager = false) // forked: span agg + grid join
    val grid = obs.groupBy("key")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("__ob",
        when(col("__v").isNotNull, col("bucket")))
      .select(col("key"), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(w).as("v"),
        (col("bucket") - last(col("__ob"), ignoreNulls = true).over(w)).as("stale"))
  }

  /** X102: frequent item pairs with support/confidence/lift — the
    * association-rule primitive (Agrawal & Srikant VLDB'94, the
    * 2-itemset level that carries nearly all of Apriori's practical
    * value): which items co-occur in a basket beyond chance. The
    * co-occurrence miner of a behavioral pipeline (co-purchase, co-view,
    * co-error), and the graph-builder feeding X44/X72/X75's edge ops.
    *
    * All three metrics in exact ppm: support = n_ab·10⁶ div N,
    * confidence = n_ab·10⁶ div n_a, lift = (n_ab·N·10⁶) div (n_a·n_b)
    * — the lift numerator widened to DECIMAL(38,0) (n_ab·N alone can
    * pass 2⁶³ at web scale); everything else in Long; truncation
    * toward zero on the non-negative operands, so every engine agrees.
    *
    * Shape: presence-distinct per basket (one shuffle), then the
    * basket-keyed self-join — Σ basket_size² work, bounded by the
    * basket grain, never |items|²; the `minCount` gate filters BEFORE
    * metric arithmetic. Item counts attach by equi-join (item side is
    * vocabulary-sized and unbounded — left to AQE, the TF-IDF
    * discipline). N is one bounded driver count (the [[graft.ops
    * .GraphRank]] pattern).
    *
    * @return (item_a < item_b, n_ab, support_ppm, conf_ppm, lift_ppm);
    *         conf is P(b|a) for the (a, b) orientation
    */
  def frequentPairsPpm(df: DataFrame, basketCol: String, itemCol: String,
                       minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    // ONE basket-keyed collect_set shuffle (map-side combinable)
    // replaces the old distinct + per-basket pair self-join (guide
    // §2.3 "aggregate before you shuffle"): basket count, per-item
    // basket counts and the i<j pair expansion all read the grouped
    // frame. Null semantics preserved exactly: a null basket still
    // counts toward N (its own group here, as distinct kept one row),
    // but never pairs (the old equi-join never matched it — filtered
    // before expansion); null items never pair nor survive the
    // item_a/item_b equi-joins on either spelling.
    val grouped = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .groupBy(col("basket"))
      .agg(array_sort(collect_set(col("item"))).as("__items"))
      .localCheckpoint() // forked: N count + item counts + pair expansion
    val n = grouped.count()
    require(n > 0, "frequentPairsPpm needs at least one basket")
    val itemCounts = grouped
      .select(explode(col("__items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_i"))
      .localCheckpoint(eager = false) // forked: joined twice below
    graft.ops.GraphRank.pairsFromSets(
        grouped.filter(col("basket").isNotNull), "__items")
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .join(itemCounts.select(col("item").as("item_a"), col("n_i").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("item").as("item_b"), col("n_i").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        expr(s"(n_ab * 1000000) DIV ${n}L").as("support_ppm"),
        expr("(n_ab * 1000000) DIV n_a").as("conf_ppm"),
        expr(s"(cast(n_ab as decimal(38,0)) * ${n}L * 1000000) div (cast(n_a as decimal(38,0)) * n_b)")
          .as("lift_ppm"))
  }

  /** Ordered conversion funnel: how many users performed `steps(0)`,
    * then `steps(1)` within `windowHours` AFTER their first qualifying
    * `steps(0)`, and so on — each stage anchored at the user's EARLIEST
    * qualifying event of the previous stage (the classic product-funnel
    * semantics: first touch, strict ordering, bounded window).
    *
    * Dataflow: stage i is one scan with the event-type filter pushed to
    * parquet, equi-joined on the user key against the (user, anchor-ts)
    * frame of stage i−1 with the time window as a residual predicate,
    * then a min-ts aggregate — map-side combinable, shuffle bounded by
    * the stage's own matching events. Each stage frame is
    * localCheckpoint'ed (lazily) because stage i+1 AND the stage's own
    * count both read it.
    *
    * @return one row per stage: (step 1-based, event_type, n_users) —
    *         n_users is monotonically non-increasing by construction.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String], windowHours: Int): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowHours >= 1, "funnel window must be at least one hour")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    var reached = ev.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("rts"))
      .localCheckpoint(eager = false)
    def stageCount(i: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(name).as("event_type"),
          col("n_users"))
    val counts = scala.collection.mutable.ArrayBuffer(
      stageCount(1, steps.head, reached))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      reached = ev.filter(col("t") === st).as("e")
        .join(reached.as("r"), col("e.u") === col("r.u") &&
          col("e.ts") > col("r.rts") &&
          col("e.ts") <= col("r.rts") + expr(s"INTERVAL $windowHours HOURS"))
        .groupBy(col("e.u").as("u")).agg(min(col("e.ts")).as("rts"))
        .localCheckpoint(eager = false)
      counts += stageCount(i + 2, st, reached)
    }
    counts.reduce(_ unionByName _)
  }

  /** Cohort retention triangle at day grain: users are cohorted by the
    * epoch day of their FIRST `eventType` event, activity is any later
    * `eventType` day, and each (cohort_day, day_offset) cell counts the
    * distinct users from that cohort active at that offset.
    *
    * One filtered pass builds (user, epoch_day); the first-day frame is
    * a min aggregate on the user key; the join back is user-keyed; the
    * distinct + count shuffles only (user, cohort, offset) triples of
    * ACTIVE days — at 100 TB the cell grid is |cohorts|·|offsets|,
    * independent of event volume.
    *
    * @return (cohort_day, day_offset, n_users); offset 0 row of each
    *         cohort is its size.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, eventType: String): DataFrame = {
    val p = events.filter(col(typeCol) === eventType)
      .select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long").as("d"))
      .localCheckpoint(eager = false) // read twice: first-day + activity
    val f = p.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    p.join(f, Seq("u"))
      .select(col("u"), col("cohort_day"),
        (col("d") - col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group ordinary-least-squares trend of row counts against an
    * integer x (e.g. epoch day): slope in ppm, integer-exact.
    *
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the (x, count)
    * points of each group; emitted as
    * `sign(num) · ((|num| · 10⁶) div den)` so the truncating integer
    * division is identical in Spark (`DIV`, truncates toward zero on
    * the non-negative operand) and DuckDB (`//`). A degenerate group
    * (all points at one x) yields slope 0 rather than a division error.
    *
    * Two aggregates, both map-side combinable: (group, x) counts, then
    * per-group moment sums. Long arithmetic is exact while
    * |num| ≤ 9.2·10¹² (×10⁶ headroom under Long.MaxValue) — epoch-day
    * x (~2·10⁴) admits per-cell counts up to ~10⁷ at n=365 points;
    * beyond that, re-base x to days-since-window-start before calling.
    *
    * @return (groupCol, n_points, slope_ppm)
    */
  /** X142: purged temporal split with embargo (the time-series
    * leakage-safe split, López de Prado 2018 ch.7 — the temporal twin
    * of X124's near-dup-cluster split): test = everything at/after the
    * cutoff; a train-side event is PURGED when it falls within
    * `embargoSec` of its OWN key's first test event — the per-key gap
    * that stops features computed on late-train rows from leaking
    * test-adjacent information (a global gap either over-purges quiet
    * keys or under-purges active ones; the purge must be per key).
    * Keys with no test events keep their full train history.
    *
    * One scan + one |keys|-row min aggregate joined back (AQE
    * strategy); timestamps compare at second grain via the engine-
    * portable epoch truncation every temporal op here uses.
    *
    * @return input key/ts plus (split ∈ train|test|purged)
    */
  def temporalSplit(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, cutoffSec: Long,
                    embargoSec: Long): DataFrame = {
    require(embargoSec >= 0, s"negative embargo: $embargoSec")
    val base = events.select(col(keyCol).as("key"), col(idCol).as("id"),
        floor(unix_timestamp(col(tsCol))).cast("long").as("sec"))
      .localCheckpoint(eager = false) // forked: first-test agg + labeling
    val firstTest = base.filter(col("sec") >= cutoffSec)
      .groupBy(col("key")).agg(min(col("sec")).as("__t0"))
    base.join(firstTest, Seq("key"), "left")
      .select(col("key"), col("id"), col("sec"),
        when(col("sec") >= cutoffSec, lit("test"))
          .when(col("__t0").isNotNull &&
            col("sec") > col("__t0") - embargoSec, lit("purged"))
          .otherwise(lit("train")).as("split"))
  }

  /** X135: signed R² (Pearson correlation without the square root) in
    * exact ppm — the metric-drift detector: does a measure move with
    * time / with another measure, per group? Pearson's r needs a sqrt;
    * reporting sign(num)·r² keeps the decision content (direction +
    * strength, |r| = √(|value|/10⁶) when a human wants it) and stays
    * bit-exact in any engine:
    *
    *   r²_signed = sign(num) · 10⁶·num² div (denx·deny),
    *   num = nΣxy − ΣxΣy, denx = nΣx² − (Σx)², deny = nΣy² − (Σy)²
    *
    * One map-side-combinable moment aggregate over row volume, then a
    * |groups|-row projection; constant-x or constant-y groups (den 0)
    * read 0. Long moments carry [[trendSlopePpm]]'s documented
    * overflow precondition (re-base x/y toward their group means when
    * magnitudes threaten 10¹⁸); num² runs in DECIMAL(38,0), exact
    * while |num| < 3·10¹⁵ — enforced loudly, not silently.
    *
    * @return (group, n_points, r2_signed_ppm)
    */
  def corrSignedR2Ppm(df: DataFrame, groupCol: String, xExpr: Column,
                      yExpr: Column): DataFrame = {
    df.select(col(groupCol), xExpr.cast("long").as("x"),
        yExpr.cast("long").as("y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_points"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("y")).as("__sxy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"))
      .select(col(groupCol), col("n_points"),
        (col("n_points") * col("__sxy") - col("__sx") * col("__sy")).as("__num"),
        (col("n_points") * col("__sxx") - col("__sx") * col("__sx")).as("__dx"),
        (col("n_points") * col("__syy") - col("__sy") * col("__sy")).as("__dy"))
      .select(col(groupCol), col("n_points"),
        when(abs(col("__num")) > 3000000000000000L, raise_error(lit(
          "signed-R2 magnitude bound: re-base x/y (|num| must stay below 3e15)")))
          .when(col("__dx") === 0 || col("__dy") === 0, lit(0L))
          .otherwise(expr("sign(__num)").cast("long") *
            expr("(cast(__num as decimal(38,0)) * __num * 1000000) div " +
              "(cast(__dx as decimal(38,0)) * __dy)").cast("long"))
          .as("r2_signed_ppm"))
  }

  def trendSlopePpm(df: DataFrame, groupCol: String, xExpr: Column): DataFrame = {
    val dc = df.select(col(groupCol), xExpr.cast("long").as("x"))
      .groupBy(col(groupCol), col("x")).agg(count(lit(1)).as("y"))
    dc.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_points"), sum(col("x")).as("__sx"),
        sum(col("y")).as("__sy"), sum(col("x") * col("y")).as("__sxy"),
        sum(col("x") * col("x")).as("__sxx"))
      .select(col(groupCol), col("n_points"),
        (col("n_points") * col("__sxy") - col("__sx") * col("__sy")).as("__num"),
        (col("n_points") * col("__sxx") - col("__sx") * col("__sx")).as("__den"))
      .select(col(groupCol), col("n_points"),
        when(col("__den") === 0, lit(0L))
          .when(col("__num") >= 0, expr("(__num * 1000000) DIV __den"))
          .otherwise(-expr("((-__num) * 1000000) DIV __den"))
          .as("slope_ppm"))
  }

  /** X170: conversion attribution — first-touch / last-touch / linear
    * credit of each conversion's value to the touch events that
    * preceded it inside a lookback window: the revenue-attribution
    * triple every growth team reconciles, next to [[funnel]] (which
    * counts) and [[transitionMatrixPpm]] (which sequences). Values are
    * 10³-quantized longs; linear credit is v div n per touch with the
    * remainder assigned to the LAST touch (documented, oracle-mirrored
    * — no float splitting). Conversions with no in-window touch roll
    * up under the `(unattributed)` row so credit always sums to the
    * converted total.
    *
    * Shape: conversions and touches are two scan-pushed filters of the
    * same stream; candidates come from the user-key equi-join with the
    * window range predicate (the as-of/X34 shape — never a cross
    * join); per-conversion argmin/argmax are window-free struct
    * min/max; the rollup key is |touch types|-sized and map-side
    * combinable.
    *
    * @return (event_type, n_conversions, first_touch_q, last_touch_q,
    *         linear_q) — one row per crediting touch type.
    *         `n_conversions` is the LAST-touch conversion count: the
    *         number of conversions whose final in-window touch is this
    *         type. A type that appears only as first touch therefore
    *         reports n_conversions = 0 beside a nonzero first_touch_q
    *         — read first/last/linear columns for the credit, not the
    *         count (deterministic, oracle-mirrored).
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String, valueExpr: Column,
                  conversionType: String, lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, s"non-positive lookback: $lookbackSec")
    val base = events.select(col(userCol).as("__u"),
        floor(unix_timestamp(col(tsCol))).cast("long").as("__sec"),
        col(tieCol).as("__tie"), col(typeCol).as("__t"),
        valueExpr.cast("long").as("__v"))
      .localCheckpoint(eager = false) // forked: conversions + touches
    val conv = base.filter(col("__t") === conversionType)
      .select(col("__u"), col("__sec").as("__cs"), col("__tie").as("__ct"),
        col("__v"))
    val touch = base.filter(col("__t") =!= conversionType)
      .select(col("__u"), col("__sec").as("__ts"), col("__tie").as("__tt"),
        col("__t"))
    val paired = conv.join(touch, Seq("__u"), "left")
      .withColumn("__in", col("__ts").isNotNull &&
        col("__ts") >= col("__cs") - lookbackSec &&
        (col("__ts") < col("__cs") ||
          (col("__ts") === col("__cs") && col("__tt") < col("__ct"))))
    // per conversion: touch count + first/last touch identity
    val perConv = paired.groupBy(col("__u"), col("__cs"), col("__ct"),
        col("__v"))
      .agg(sum(when(col("__in"), 1L).otherwise(0L)).as("__n"),
        min(when(col("__in"),
          struct(col("__ts"), col("__tt"), col("__t")))).as("__first"),
        max(when(col("__in"),
          struct(col("__ts"), col("__tt"), col("__t")))).as("__last"))
      .localCheckpoint(eager = false) // forked: 3 credit rollups + unattributed
    val unattributed = perConv.filter(col("__n") === 0)
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_conversions"),
        coalesce(sum(col("__v")), lit(0L)).as("__tot"))
      .select(lit("(unattributed)").as("event_type"), col("n_conversions"),
        col("__tot").as("first_touch_q"), col("__tot").as("last_touch_q"),
        col("__tot").as("linear_q"))
    val firstCredit = perConv.filter(col("__n") > 0)
      .groupBy(col("__first.__t").as("event_type"))
      .agg(sum(col("__v")).as("first_touch_q"))
    val lastCredit = perConv.filter(col("__n") > 0)
      .groupBy(col("__last.__t").as("event_type"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("__v")).as("last_touch_q"),
        // linear remainder rides with the last touch
        sum(col("__v") - expr("(__v div __n) * __n")).as("__rem"))
    // linear base: every in-window touch earns v div n
    val linearCredit = paired.filter(col("__in"))
      .join(perConv.select(col("__u"), col("__cs"), col("__ct"), col("__n")),
        Seq("__u", "__cs", "__ct"))
      .groupBy(col("__t").as("event_type"))
      .agg(sum(expr("__v div __n")).as("__lin"))
    firstCredit
      .join(lastCredit, Seq("event_type"), "full_outer")
      .join(linearCredit, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n_conversions"), lit(0L)).as("n_conversions"),
        coalesce(col("first_touch_q"), lit(0L)).as("first_touch_q"),
        coalesce(col("last_touch_q"), lit(0L)).as("last_touch_q"),
        (coalesce(col("__lin"), lit(0L)) + coalesce(col("__rem"), lit(0L)))
          .as("linear_q"))
      .unionByName(unattributed.filter(col("n_conversions") > 0))
  }

  /** X173: conversion-lag quantiles — how long before a conversion its
    * FIRST in-window touch happened, as exact per-touch-type
    * percentiles: the time-to-convert distribution [[attribution]]'s
    * credit totals hide (two channels can earn equal credit with
    * 5-minute vs 5-day lags — different products). Pairing is
    * [[attribution]]'s user-key join + struct-min first touch; the
    * quantiles are [[Profiler.discreteQuantiles]]' q56 compaction, so
    * rank windows read |distinct lags| per type, never conversions.
    *
    * @return (event_type, pct, value) — value in seconds
    */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String, conversionType: String,
                    lookbackSec: Long, pcts: Seq[Int]): DataFrame = {
    require(lookbackSec > 0, s"non-positive lookback: $lookbackSec")
    val base = events.select(col(userCol).as("__u"),
        floor(unix_timestamp(col(tsCol))).cast("long").as("__sec"),
        col(tieCol).as("__tie"), col(typeCol).as("__t"))
      .localCheckpoint(eager = false) // forked: conversions + touches
    val conv = base.filter(col("__t") === conversionType)
      .select(col("__u"), col("__sec").as("__cs"), col("__tie").as("__ct"))
    val touch = base.filter(col("__t") =!= conversionType)
      .select(col("__u"), col("__sec").as("__ts"), col("__tie").as("__tt"),
        col("__t"))
    val firstTouch = conv.join(touch, Seq("__u"))
      .filter(col("__ts") >= col("__cs") - lookbackSec &&
        (col("__ts") < col("__cs") ||
          (col("__ts") === col("__cs") && col("__tt") < col("__ct"))))
      .groupBy(col("__u"), col("__cs"), col("__ct"))
      .agg(min(struct(col("__ts"), col("__tt"), col("__t"))).as("__f"))
      .select(col("__f.__t").as("event_type"),
        (col("__cs") - col("__f.__ts")).as("__lag"))
    Profiler.discreteQuantiles(firstTouch, "event_type", col("__lag"), pcts)
  }

  /** X171: rate-spike audit — which (type, time-bucket) cells run hot
    * against their type's own uniform Poisson baseline: the feed-health
    * check that catches replayed batches, bot bursts and duplicated
    * ingestion BEFORE they skew every downstream rate. Spike iff
    * n > λ + k·√λ with λ = total/buckets, spelled without the square
    * root by cross-multiplication:
    *
    *   (n·nb − tot)² · 100 > k² · tot · nb     (and n·nb > tot)
    *
    * with k in tenths — exact integers end to end. The baseline span
    * is the type's own observed [min, max] bucket range, so quiet
    * types aren't judged against loud ones. One map-side-combinable
    * (type, bucket) count + a |types|-row baseline join. Spike-only by
    * construction (missing buckets produce no row to flag).
    *
    * @return (event_type, bucket, n, expected_milli, spike)
    */
  def rateSpikes(events: DataFrame, typeCol: String, tsCol: String,
                 bucketSec: Long, kTenths: Long): DataFrame = {
    require(bucketSec > 0 && kTenths >= 0,
      s"bad spike parameters: bucket $bucketSec, k $kTenths")
    val cnt = events.select(col(typeCol).as("event_type"),
        floor(unix_timestamp(col(tsCol))).cast("long").as("__sec"))
      // sign-split FLOOR bucket: pre-1970 epochs bucket exactly as the
      // oracle's flooring `//`, not Spark's truncating div
      .select(col("event_type"), expr(
        s"""CASE WHEN __sec >= 0 THEN __sec div $bucketSec
           |ELSE -(((-__sec) + $bucketSec - 1) div $bucketSec) END""".stripMargin)
        .as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // forked: baseline + labeling
    val baseline = cnt.groupBy(col("event_type"))
      .agg(sum(col("n")).as("__tot"),
        (max(col("bucket")) - min(col("bucket")) + 1).as("__nb"))
    cnt.join(baseline, Seq("event_type"))
      .select(col("event_type"), col("bucket"), col("n"),
        expr("(__tot * 1000) div __nb").as("expected_milli"),
        (col("n") * col("__nb") > col("__tot") &&
          expr("""(cast(n as decimal(38,0)) * __nb - __tot)
                 | * (cast(n as decimal(38,0)) * __nb - __tot) * 100""".stripMargin)
            > expr(s"cast($kTenths as decimal(38,0)) * $kTenths * __tot * __nb"))
          .cast("long").as("spike"))
  }

  /** X202: CUSUM changepoint statistic (Page, Biometrika 1954) — the
    * SEQUENTIAL drift alarm next to the distributional tier (X55 L1,
    * X197/X198 KS, X174/X200 quantile shift): those ask "are these two
    * snapshots different?"; CUSUM watches ONE ordered series and asks
    * "when did this metric's level shift?" — small sustained shifts
    * accumulate where X171's per-bucket spike test (which sees each
    * bucket alone) stays silent.
    *
    * Exact integers via the prefix identity: the textbook recurrence
    * S_t = max(0, S_{t−1} + (v_t − ref)) equals cum_t − min(0,
    * min_{j≤t} cum_j) with cum the running sum of deviations — so both
    * one-sided statistics (upward s_pos, downward s_neg) are two
    * cumulative windows, no recursion, engine-exact. No post-alarm
    * reset: rows after the first alarm mark the continuing excursion
    * (restart monitoring by re-running from the changepoint if
    * estimation is wanted).
    *
    * Input contract: a PRE-AGGREGATED series (one row per (group, t) —
    * duplicate timestamps raise loudly; window-sum order over ties is
    * layout-dependent, and a silently order-dependent alarm is the one
    * thing a monitor must never be). The window therefore reads
    * |series points| per group — the q56 compaction discipline (a
    * billion raw events compact to their time-bucket counts BEFORE
    * this operator).
    *
    * @param ref       reference level (target mean + allowance, the
    *                  Page k); deviations are v − ref
    * @param threshold alarm when either one-sided statistic exceeds it
    * @return (`groupCol`, t, v, s_pos, s_neg, alarm) — one row per point
    */
  def cusumSeries(series: DataFrame, groupCol: String, tCol: String,
                  valueExpr: Column, ref: Long, threshold: Long): DataFrame = {
    require(threshold > 0, s"alarm threshold must be positive: $threshold")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(groupCol).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDup = Window.partitionBy(col(groupCol), col("t"))
    series.select(col(groupCol), col(tCol).cast("long").as("t"),
        valueExpr.cast("long").as("v"))
      .withColumn("v",
        when(count(lit(1)).over(wDup) > 1, raise_error(concat(
          lit("cusumSeries: duplicate series point at t="), col("t").cast("string"),
          lit(" — pre-aggregate to one row per (group, t)"))))
          .otherwise(col("v")))
      .withColumn("__cum", sum(col("v") - lit(ref)).over(wCum))
      .withColumn("__mn", least(lit(0L), min(col("__cum")).over(wCum)))
      .withColumn("__mx", greatest(lit(0L), max(col("__cum")).over(wCum)))
      .select(col(groupCol), col("t"), col("v"),
        (col("__cum") - col("__mn")).as("s_pos"),
        (col("__mx") - col("__cum")).as("s_neg"),
        (col("__cum") - col("__mn") > threshold ||
          col("__mx") - col("__cum") > threshold).cast("long").as("alarm"))
  }

  /** X206: Theil–Sen robust trend (Theil 1950, Sen JASA 1968) — the
    * median of all pairwise slopes, the outlier-proof complement to
    * [[trendSlopePpm]]'s OLS: one corrupted monitoring point (a backfill
    * spike, a partial-day bucket) drags a least-squares slope
    * arbitrarily while the pairwise median ignores up to ~29% gross
    * corruption. Slope in ppm via sign-split FLOOR division (engine-
    * exact for negative trends); intercept = median of
    * (v·10⁶ − slope_ppm·t) at the median slope — both medians are the
    * lower median, the deterministic rank ⌈P/2⌉ pick.
    *
    * Input contract matches [[cusumSeries]]: a PRE-AGGREGATED series,
    * one row per (group, t) — duplicate points raise loudly. The pair
    * self-join materializes P·(P−1)/2 rows per group, so the series
    * length is bounded loudly at `maxPoints` (default 2000 → ≤ ~2M
    * pairs per group, a single task's comfortable workload); a longer
    * series must compact to a coarser grid first — the q56 discipline
    * applied to the time axis. Median picks run on the compacted
    * (group, slope) domain, never the raw pair volume.
    *
    * @return (`groupCol`, n_points, n_pairs, slope_ppm, intercept_ppm)
    */
  def theilSenSlope(series: DataFrame, groupCol: String, tCol: String,
                    valueExpr: Column, maxPoints: Int = 2000): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2: $maxPoints")
    import org.apache.spark.sql.expressions.Window
    val wDup = Window.partitionBy(col("__g"), col("t"))
    val wN = Window.partitionBy(col("__g"))
    val pts = series.select(col(groupCol).as("__g"),
        col(tCol).cast("long").as("t"), valueExpr.cast("long").as("v"))
      .withColumn("v",
        when(count(lit(1)).over(wDup) > 1, raise_error(concat(
          lit("theilSenSlope: duplicate series point at t="),
          col("t").cast("string"),
          lit(" — pre-aggregate to one row per (group, t)"))))
          .otherwise(col("v")))
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__n",
        when(col("__n") > maxPoints, raise_error(concat(
          lit(s"theilSenSlope series bound: maxPoints=$maxPoints keeps the "
            + "pair join quadratic-in-a-constant — compact the series to a "
            + "coarser grid for group "), col("__g").cast("string"))))
          .otherwise(col("__n")))
      .localCheckpoint(eager = false) // forked: pair join (both sides) + intercept
    // sign-split floor: num div den rounds toward -inf like the oracle's //
    def floorDiv(num: String, den: String): String =
      s"CASE WHEN ($num) >= 0 THEN ($num) div ($den) " +
        s"ELSE -((-($num) + ($den) - 1) div ($den)) END"
    val pairs = pts.select(col("__g"), col("t").as("__ta"), col("v").as("__va"))
      .join(pts.select(col("__g"), col("t").as("__tb"), col("v").as("__vb"),
        col("__n")), Seq("__g"))
      .filter(col("__ta") < col("__tb"))
      .select(col("__g"), col("__n"),
        expr(floorDiv("(__vb - __va) * 1000000", "__tb - __ta")).as("__s"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    // lower-median rank pick on the compacted slope domain (q56 idiom)
    val slope = pairs.groupBy(col("__g"), col("__n"), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__p", sum(col("__c")).over(wAll))
      .filter(col("__cum") >= expr("(__p + 1) div 2") &&
        col("__cum") - col("__c") < expr("(__p + 1) div 2"))
      .select(col("__g"), col("__n").as("n_points"), col("__p").as("n_pairs"),
        col("__s").as("slope_ppm"))
    val wCumI = Window.partitionBy(col("__g")).orderBy(col("__i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slope.join(pts.select(col("__g"), col("t"), col("v")), Seq("__g"))
      .select(col("__g"), col("n_points"), col("n_pairs"), col("slope_ppm"),
        (col("v") * 1000000L - col("slope_ppm") * col("t")).as("__i"))
      .groupBy(col("__g"), col("n_points"), col("n_pairs"), col("slope_ppm"),
        col("__i"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCumI))
      .filter(col("__cum") >= expr("(n_points + 1) div 2") &&
        col("__cum") - col("__c") < expr("(n_points + 1) div 2"))
      .select(col("__g").as(groupCol), col("n_points"), col("n_pairs"),
        col("slope_ppm"), col("__i").as("intercept_ppm"))
  }

  /** X148: grade correlation — Spearman's rank correlation in the one
    * spelling whose arithmetic survives corpus scale. Average ranks are
    * quantized to `grades` = B quantile buckets (the rank's grade), and
    * Pearson's signed R² then runs on the grades: plain Spearman's
    * moment products grow as n⁴ and leave exact integer range around
    * n ≈ 5·10⁴ rows per group, while grades cap every value at B, so
    * the arithmetic stays exact in DECIMAL(38,0) to n = 3·10⁶ per
    * group (enforced loudly) — and the statistic is still a DEFINED
    * estimator (the grade/quantile correlation), not a float
    * approximation that drifts between engines.
    *
    * Ranks come from the q56 compaction: per-(group, value) counts,
    * rank windows over |distinct values| rows only — never raw row
    * volume; the doubled average rank r2 = 2·cum − cnt + 1 keeps ties
    * integral, and grade = B·(r2 − 1) div (2n) ∈ [0, B).
    *
    * The final ratio is the two-step floor division
    * ((num² div dx)·10⁶) div dy — spelled identically in the oracle —
    * because the one-step num²·10⁶ would re-shrink the exact range by
    * 10³. Constant-x or constant-y groups (den 0) read 0.
    *
    * Dataflow: two compact rank tables join back onto row volume by
    * (group, value) equality (AQE-planned), then ONE map-side-
    * combinable moment aggregate per group. Windows never see row
    * volume.
    *
    * @return (group, n_points, spearman_r2_signed_ppm)
    */
  def spearmanGradePpm(df: DataFrame, groupCol: String, xExpr: Column,
                       yExpr: Column, grades: Int = 1000): DataFrame = {
    require(grades >= 2, s"need at least 2 grades: $grades")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("__g"),
      xExpr.cast("long").as("__x"), yExpr.cast("long").as("__y"))
      .localCheckpoint(eager = false) // forked: two rank tables + join-back
    def gradeTable(c: String, out: String) = {
      val wCum = Window.partitionBy("__g").orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("__g")
      base.groupBy(col("__g"), col(c)).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(wCum))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .select(col("__g"), col(c),
          expr(s"($grades * (2 * __cum - __c)) div (2 * __n)").as(out))
    }
    base.join(gradeTable("__x", "__gx"), Seq("__g", "__x"))
      .join(gradeTable("__y", "__gy"), Seq("__g", "__y"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("__gx")).as("__sx"), sum(col("__gy")).as("__sy"),
        sum(col("__gx") * col("__gy")).as("__sxy"),
        sum(col("__gx") * col("__gx")).as("__sxx"),
        sum(col("__gy") * col("__gy")).as("__syy"))
      .select(col("__g"), col("n_points"),
        expr("cast(n_points as decimal(38,0)) * __sxy - cast(__sx as decimal(38,0)) * __sy").as("__num"),
        expr("cast(n_points as decimal(38,0)) * __sxx - cast(__sx as decimal(38,0)) * __sx").as("__dx"),
        expr("cast(n_points as decimal(38,0)) * __syy - cast(__sy as decimal(38,0)) * __sy").as("__dy"))
      .select(col("__g").as(groupCol), col("n_points"),
        when(col("n_points") > 3000000L, raise_error(lit(
          "spearmanGradePpm group-size bound: 3e6 rows per group keeps " +
            "num^2 inside DECIMAL(38,0) — sample the group first")))
          .when(col("__dx") === 0 || col("__dy") === 0, lit(0L))
          .otherwise(expr("sign(__num)").cast("long") *
            // the inner div re-enters DECIMAL(38,0) before the 10⁶
            // scale-up: `div` lands in LONG, and (num² div dx) ≤ dy can
            // sit near 10¹³ — ·10⁶ would overflow a long silently.
            expr("(cast((__num * __num) div __dx as decimal(38,0)) * 1000000) div __dy")
              .cast("long"))
          .as("spearman_r2_signed_ppm"))
  }

  /** X189: graded Kendall τ-b — the CONCORDANCE rank correlation next
    * to X136's graded Spearman: Spearman asks "do the ranks move
    * together linearly", Kendall asks the ordinal question directly —
    * of all comparable pairs, how many agree in direction minus how
    * many disagree. It is the statistic behind ranking-eval agreement
    * (judge-vs-judge, model-vs-human preference orderings) because a
    * single far outlier moves it by exactly its pair count, not its
    * magnitude.
    *
    * Same scale discipline as Spearman: values collapse to `grades`
    * quantile grades first (the q56 compaction + doubled-rank grade,
    * ties kept), so the per-group state is a ≤ grades² contingency
    * grid regardless of corpus size — and on that grid C−D is EXACT
    * via two bounded window sweeps (suffix-sum over gx within each
    * gy row, then suffix/prefix over gy within each gx column: the
    * strictly-greater and greater-x-smaller-y quadrant counts per
    * cell). No pair self-join, no per-row window — every window
    * partition holds ≤ `grades` rows by construction. Tie terms come
    * from the grid marginals; τ-b² rides the doubled denominators
    * d = n(n−1) − Σt(t−1) so no halving ever truncates, reported as
    * the signed square sign(C−D)·(4(C−D)²·10⁶) div (dx·dy) in exact
    * ppm (two-step DIV, DECIMAL(38,0) — the X135 convention).
    *
    * @return (groupCol, n_points, kendall_tau2_signed_ppm)
    */
  def kendallGradePpm(df: DataFrame, groupCol: String, xExpr: Column,
                      yExpr: Column, grades: Int = 100): DataFrame = {
    require(grades >= 2, s"need at least 2 grades: $grades")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("__g"),
      xExpr.cast("long").as("__x"), yExpr.cast("long").as("__y"))
      .localCheckpoint(eager = false) // forked: two grade tables + join-back
    def gradeTable(c: String, out: String) = {
      val wCum = Window.partitionBy("__g").orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("__g")
      base.groupBy(col("__g"), col(c)).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(wCum))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .select(col("__g"), col(c),
          expr(s"($grades * (2 * __cum - __c)) div (2 * __n)").as(out))
    }
    val cells = base
      .join(gradeTable("__x", "__gx"), Seq("__g", "__x"))
      .join(gradeTable("__y", "__gy"), Seq("__g", "__y"))
      .groupBy(col("__g"), col("__gx"), col("__gy"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(eager = false) // forked: dense grid + marginals
    // The suffix-sum sweep is only exact on a DENSE grid: the gy-column
    // window must see a row for EVERY (gx, gy') the group occupies, or
    // quadrant mass at absent cells is silently dropped. Densify to the
    // group's |gx-values|·|gy-values| grid (≤ grades² rows per group by
    // construction — the bounded-state contract survives).
    val dense = cells.select(col("__g"), col("__gx")).distinct()
      .join(cells.select(col("__g"), col("__gy")).distinct(), Seq("__g"))
      .join(cells, Seq("__g", "__gx", "__gy"), "left")
      .na.fill(0L, Seq("__c"))
    // Quadrant sweep: __sgt = mass strictly right in this gy row; then
    // summing it strictly above / strictly below the gy column gives
    // the concordant / discordant quadrant per cell. Partitions hold
    // ≤ grades rows (distinct gx per (g, gy), distinct gy per (g, gx)).
    val wRight = Window.partitionBy("__g", "__gy").orderBy(col("__gx"))
      .rowsBetween(1, Window.unboundedFollowing)
    val wUp = Window.partitionBy("__g", "__gx").orderBy(col("__gy"))
      .rowsBetween(1, Window.unboundedFollowing)
    val wDown = Window.partitionBy("__g", "__gx").orderBy(col("__gy"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val num = dense
      .withColumn("__sgt", coalesce(sum(col("__c")).over(wRight), lit(0L)))
      .withColumn("__spp", coalesce(sum(col("__sgt")).over(wUp), lit(0L)))
      .withColumn("__spm", coalesce(sum(col("__sgt")).over(wDown), lit(0L)))
      .groupBy(col("__g"))
      .agg((sum(expr("cast(__c as decimal(38,0)) * __spp"))
        - sum(expr("cast(__c as decimal(38,0)) * __spm"))).as("__num"))
    def tieTerm(c: String, out: String) = cells
      .groupBy(col("__g"), col(c)).agg(sum(col("__c")).as("__t"))
      .groupBy(col("__g"))
      .agg(sum(expr("cast(__t as decimal(38,0)) * (__t - 1)")).as(out))
    val tot = cells.groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_points"))
    tot.join(num, Seq("__g"))
      .join(tieTerm("__gx", "__tx"), Seq("__g"))
      .join(tieTerm("__gy", "__ty"), Seq("__g"))
      .select(col("__g"), col("n_points"), col("__num"),
        (expr("cast(n_points as decimal(38,0)) * (n_points - 1)")
          - col("__tx")).as("__dx"),
        (expr("cast(n_points as decimal(38,0)) * (n_points - 1)")
          - col("__ty")).as("__dy"))
      .select(col("__g").as(groupCol), col("n_points"),
        when(col("n_points") > 100000000L, raise_error(lit(
          "kendallGradePpm group-size bound: 1e8 rows per group keeps " +
            "4·num² inside DECIMAL(38,0) — sample the group first")))
          .when(col("__dx") === 0 || col("__dy") === 0, lit(0L))
          .otherwise(expr("sign(__num)").cast("long") *
            // two-step DIV (the X136 discipline): 4num² div dx lands
            // ≤ dy ≈ n², so the 10⁶ scale-up re-enters DECIMAL(38,0).
            expr("(cast((__num * __num * 4) div __dx as decimal(38,0)) * 1000000) div __dy")
              .cast("long"))
          .as("kendall_tau2_signed_ppm"))
  }

  /** X84: first-order Markov transition matrix over per-user event
    * sequences — the behavioral fingerprint (which action follows
    * which) that powers next-step prediction baselines, bot detection
    * (improbable transition chains), and sequence-model training data
    * QA. Probabilities are row-normalized per source state, ppm floor
    * DIV — engine-exact.
    *
    * Ordering is total: events sort by (ts, `tieCol`) within each user,
    * so ties at one timestamp can never flip pairs between layouts —
    * the same determinism rule every window in the repo follows.
    *
    * Dataflow: ONE shuffle of the event stream on the user key feeds
    * the lag window (a user's history is a bounded partition task —
    * the X14 sessionization shape); transitions then collapse onto the
    * tiny (from, to) state-pair key with map-side partial aggregation,
    * and the row totals join on |states| rows. Event volume never
    * shuffles twice.
    *
    * @return (from_type, to_type, n_trans, prob_ppm)
    */
  def transitionMatrixPpm(events: DataFrame, userCol: String,
                          typeCol: String, tsCol: String,
                          tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__u").orderBy(col("__ts").asc, col("__tie").asc)
    val trans = events
      .select(col(userCol).as("__u"), col(typeCol).as("to_type"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    // row totals as a window over the ALREADY-AGGREGATED pair frame
    // (≤ |states|² rows): a totals self-join would re-run the whole
    // event-volume lag window for its second branch — the plan guard
    // pins the event stream to exactly one exchange.
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    trans
      .withColumn("__tot", sum(col("n_trans")).over(wTot))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr("(n_trans * 1000000) DIV __tot").as("prob_ppm"))
  }

  /** X112: recency-decayed activity score — per key, event counts
    * bucketed on a fixed time grid and summed under exponential decay
    * with a one-bucket half-life: `score = Σ_b cnt_b div 2^age_b`,
    * age = buckets between b and the corpus' LATEST bucket. The
    * freshness-weighting every ranking / mixture / sampling stage wants
    * ("active sources matter more"), bit-exact on any engine because
    * halving is a truncating power-of-two division — no float decay
    * factor, no log. Ages ≥ 63 contribute exactly 0 (the shift
    * saturates), so arbitrarily old history can't overflow or wiggle
    * the result.
    *
    * Shape: one map-side-combinable (key, bucket) count — the only
    * pass over event volume; a one-row global-max aggregate joined
    * broadcast; a per-key fold over its occupied buckets. No window
    * over raw events.
    *
    * @return (key, n_events, n_buckets, score)
    */
  def decayedActivity(events: DataFrame, keyCol: String, tsCol: String,
                      stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive: $stepSec")
    val stepUs = stepSec * 1000000L
    val cnt = events
      .select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as("__u"))
      .select(col("key"), expr(s"__u div $stepUs").as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // forked: global max + score fold
    val top = cnt.agg(max(col("bucket")).as("__top"))
    cnt.crossJoin(broadcast(top))
      .select(col("key"), col("cnt"),
        (col("__top") - col("bucket")).as("__age"))
      .groupBy("key")
      .agg(sum(col("cnt")).as("n_events"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("__age") >= 63, lit(0L)).otherwise(
          expr("cnt div (cast(1 as bigint) << cast(__age as int))")))
          .as("score"))
  }
}
