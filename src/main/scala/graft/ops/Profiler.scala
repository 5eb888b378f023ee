package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution profiling for corpus audits: per-group discrete
  * quantiles (the "what does p99 doc length look like per language"
  * question every curation run starts with).
  *
  * DISCRETE quantiles (a value that occurs in the data, chosen by rank
  * arithmetic), not interpolated ones: interpolation is float math with
  * engine-specific association, while the rank formula
  * `ceil(n·p/100)` is pure integers — the same row is chosen by any
  * engine, which makes the result oracle-checkable bit-for-bit.
  *
  * Physical shape: ONE sort-window pass per group attaches (rank, n);
  * the requested percentiles then explode per row (|pcts| copies) and a
  * codegen'd filter keeps the matching ranks. No per-percentile
  * re-aggregation, no driver-side state. Heavy groups sort once —
  * the same cost profile as any ranked window at 100 TB.
  */
object Profiler {

  /** @param tieCol deterministic tiebreak for equal values (row choice
    *               at a quantile boundary must not depend on layout).
    * @param pcts   integer percentiles in (0, 100].
    * @return (group, pct, value) — one row per group × percentile.
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, valueCol: Column,
                        tieCol: Column, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      "percentiles must lie in (0, 100]")
    val w = Window.partitionBy(groupCol).orderBy(col("value").asc, col("__tie").asc)
    val all = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(groupCol), valueCol.as("value"), tieCol.as("__tie"))
      .withColumn("__rnk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(all))
      .select(col(groupCol), col("value"), col("__rnk"), col("__n"),
        explode(lit(pcts.toArray)).as("pct"))
      // ceil(n·p/100) in integers: (n·p + 99) DIV 100
      .filter(col("__rnk") === expr("(__n * pct + 99) DIV 100"))
      .select(col(groupCol), col("pct").cast("long").as("pct"), col("value"))
  }
}
