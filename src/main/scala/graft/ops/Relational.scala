package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational building blocks of the engine, mirroring the reference's
  * dedup / conflict-policy / ranking semantics (SURVEY.md §2.3-§2.5) as
  * declarative Spark programs.
  *
  * Determinism note: the reference relies on pandas' implicit row order
  * (`drop_duplicates` keep-first — processor.py:256-258,294-296). Under
  * Spark parallelism there is no implicit order, so every "first" here is
  * made explicit with a total ordering (SURVEY.md §7.4).
  */
object Relational {

  /** A1-A4: dedup by key, keeping the first row under `order` (explicit
    * replacement for pandas keep-first). `order` must be total within a
    * key group for a deterministic result.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1/A6: latest row per key (ROW_NUMBER ... ORDER BY ts DESC, tiebreak). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    dedupKeepFirst(df, keys, order)

  /** S9: `INSERT ... ON CONFLICT DO NOTHING` on Parquet-backed tables:
    * keep all existing rows, append only incoming rows whose PK is absent.
    * The anti-join shuffles on the PK; at scale the existing side is the
    * large one, so incoming (a monthly batch) is the build side.
    */
  def appendIgnore(existing: DataFrame, incoming: DataFrame, pk: Seq[String]): DataFrame =
    existing.unionByName(incoming.join(existing.select(pk.map(col): _*).distinct(), pk, "left_anti"))

  /** S10: `INSERT ... ON CONFLICT DO UPDATE` (incoming wins on PK clash):
    * expressed as union + windowed latest-wins dedup with an explicit
    * source priority, so re-running the same batch is idempotent.
    *
    * `tiebreak` makes the surviving row deterministic when `incoming`
    * itself carries multiple rows per PK (appended after the source
    * priority in the window order). Callers with PK-unique batches may
    * omit it.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, pk: Seq[String],
             tiebreak: Seq[Column] = Nil): DataFrame = {
    val tagged = incoming.withColumn("__src", lit(0))
      .unionByName(existing.withColumn("__src", lit(1)))
    dedupKeepFirst(tagged, pk, col("__src").asc +: tiebreak).drop("__src")
  }

  /** S11: replace-period — drop all rows of `table` in the key-range
    * defined by `periodPredicate` and substitute `replacement`. On a real
    * partitioned table this is dynamic partition overwrite; as a dataflow
    * it is the filter-union below.
    */
  def replacePeriod(table: DataFrame, replacement: DataFrame, periodPredicate: Column): DataFrame =
    table.filter(!periodPredicate).unionByName(replacement)

  /** SO2: UNION ALL view with a literal discriminator column per side. */
  def unionView(sides: Seq[(DataFrame, String)], discriminator: String): DataFrame =
    sides.map { case (df, tag) => df.withColumn(discriminator, lit(tag)) }
      .reduce(_ unionByName _)

  /** SCD2 interval builder: turn an event/change stream into validity
    * intervals per key — each row opens at its own timestamp and closes
    * at the NEXT row's (half-open [from, to); the current row stays
    * open with a null `valid_to`). The slowly-changing-dimension
    * history table every warehouse derives from a change feed.
    *
    * One shuffle on the key; `lead` over (ts, tiebreak) — the tiebreak
    * makes interval boundaries layout-independent when timestamps tie.
    */
  def scd2Intervals(df: DataFrame, keys: Seq[String], ts: Column,
                    tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts.asc, tiebreak.asc)
    df.withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
  }

  /** J3: left-join enrichment with template fallback for missing rows
    * (placeholder repair, etl_pipeline.py:300-336). `fallbacks` maps an
    * output column to (joined source column, fallback expression).
    */
  def enrichWithFallback(
      base: DataFrame, lookup: DataFrame, keys: Seq[String],
      fallbacks: Seq[(String, Column, Column)]): DataFrame = {
    val joined = base.join(lookup, keys, "left")
    fallbacks.foldLeft(joined) { case (df, (out, src, fb)) =>
      df.withColumn(out, coalesce(src, fb))
    }
  }

  /** X64: snapshot CDC diff — the monthly-refresh changelog. Given two
    * snapshots of the same keyed table (the reference refreshes its
    * whole catalog each month — downloader.py's period loop — so "what
    * changed since last month" is the natural incremental product),
    * emit one row per changed key, classified `insert` / `delete` /
    * `update`, with the old and new images of every compared column.
    *
    * Shape at scale: ONE full-outer sort-merge join on the key — each
    * side shuffles exactly once, no window, no driver state. Unchanged
    * keys (the overwhelming majority of a monthly refresh) are dropped
    * by a post-join filter, so the output is |changes|, not |table|.
    * Null-safe comparison (`<=>`) keeps NULL→value and value→NULL
    * transitions classified as updates, not unchanged.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compare.nonEmpty, "snapshotDiff needs at least one compared column")
    val l = oldSnap.select(keys.map(col) ++
      compare.map(c => col(c).as(s"old_$c")) :+ lit(1L).as("__inold"): _*)
    val r = newSnap.select(keys.map(col) ++
      compare.map(c => col(c).as(s"new_$c")) :+ lit(1L).as("__innew"): _*)
    l.join(r, keys, "full_outer")
      .withColumn("change_type",
        when(col("__inold").isNull, lit("insert"))
          .when(col("__innew").isNull, lit("delete"))
          .when(compare.map(c => col(s"old_$c") <=> col(s"new_$c"))
            .reduce(_ && _), lit("unchanged"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "unchanged")
      .drop("__inold", "__innew")
  }
}
