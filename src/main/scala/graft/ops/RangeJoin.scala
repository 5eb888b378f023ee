package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range) join — the operator family Spark's built-in
  * joins only express as an inequality join, which Catalyst can neither
  * hash- nor sort-merge: `l.ts <= r.ts AND r.ts < l.ts + w` alone
  * compiles to BroadcastNestedLoopJoin (O(|L|·|R|) comparisons), a
  * scale-killer.
  *
  * The bin trick restores an equi-join: with bin width equal to the
  * window length `w`, any right row inside `[ts, ts+w)` lives in the
  * left row's bin or the next one. Expanding each left row to those two
  * bins (a constant 2× fan-out) and equi-joining on (key, bin) bounds
  * candidates by bin co-residency; the exact range predicate then
  * filters residually. Shuffle volume is O(2|L| + |R|) on a fixed-width
  * (key, bin) key — hot keys split further by AQE like any other
  * equi-join skew.
  */
object RangeJoin {

  /** For every left row, count right rows with the same `keyCol` whose
    * `tsCol` falls in `[l.ts, l.ts + windowSec)`, and sum a right value
    * column over the same window (exact: summed as DECIMAL(18,6), the
    * engine-wide money type, so partial-merge order can't perturb it).
    *
    * @param left  (idCol, keyCol, tsCol) — one output row per input row
    * @param right (keyCol, tsCol, valCol)
    * @return left's id/key/ts plus (n_in_window, sum_in_window)
    */
  def countInWindow(left: DataFrame, right: DataFrame,
                    idCol: String, keyCol: String, tsCol: String,
                    valCol: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, "window must be positive")
    val lb = left.select(col(idCol), col(keyCol), col(tsCol),
      (unix_timestamp(col(tsCol)) / windowSec).cast("long").as("__lbin"),
      unix_timestamp(col(tsCol)).as("__lts"))
      .localCheckpoint() // forked: the probe expansion + the final left join
    // each left interval spans at most 2 bins (length w, width-w bins)
    val probes = lb.select(col(idCol), col(keyCol), col(tsCol), col("__lts"),
      explode(array(col("__lbin"), col("__lbin") + 1)).as("__bin"))
    val rb = right.select(col(keyCol).as("__rkey"),
      (unix_timestamp(col(tsCol)) / windowSec).cast("long").as("__bin"),
      unix_timestamp(col(tsCol)).as("__rts"),
      col(valCol).cast(graft.model.Schemas.money).as("__rval"))
    val hits = probes
      .join(rb, probes(keyCol) === rb("__rkey") && probes("__bin") === rb("__bin"))
      .filter(col("__rts") >= col("__lts") && col("__rts") < col("__lts") + windowSec)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("__rval")).cast("double").as("sum_in_window"))
    lb.select(col(idCol), col(keyCol), col(tsCol))
      .join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("n_in_window")).na.fill(0.0, Seq("sum_in_window"))
  }

  /** X86: interval×interval overlap join — all (left, right) pairs with
    * the same key whose half-open second intervals [start, end)
    * intersect, with the exact overlap length. The session-vs-session /
    * maintenance-window-vs-outage temporal join; the naive spelling is
    * the same nested-loop scale-killer as [[countInWindow]]'s.
    *
    * Same bin trick, generalized: every interval explodes to the bins
    * it covers (fan-out = ⌈len/binSec⌉ per row — the caller's bin width
    * trades fan-out against candidate volume), candidates equi-join on
    * (key, bin), the exact predicate filters residually. The pair
    * DEDUP is positional, not a `distinct`: a pair sharing k bins is
    * emitted only in the FIRST shared bin — the one holding the
    * overlap's start, `floor(max(s_a, s_b) / binSec)`, which both
    * sides cover by construction — so no shuffle-wide dedup runs.
    * Floor-DIV binning assumes non-negative epochs (the engine-wide
    * timestamp precondition).
    *
    * Empty intervals (end ≤ start) match nothing and are dropped at
    * the scan. Overlap length uses the half-open convention:
    * `least(e_a, e_b) − greatest(s_a, s_b)` > 0 always.
    *
    * @return (id_a, id_b, `keyCol`, overlap_sec)
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftIdCol: String, rightIdCol: String, keyCol: String,
                  startCol: String, endCol: String, binSec: Long): DataFrame = {
    require(binSec > 0, "bin width must be positive")
    def prep(df: DataFrame, idCol: String, out: String): DataFrame = df
      .select(col(idCol).as(out), col(keyCol).as("__k"),
        unix_timestamp(col(startCol)).as(s"__s_$out"),
        unix_timestamp(col(endCol)).as(s"__e_$out"))
      .filter(col(s"__e_$out") > col(s"__s_$out"))
      .withColumn("__bin", explode(sequence(
        expr(s"__s_$out DIV $binSec"), expr(s"(__e_$out - 1) DIV $binSec"))))
    prep(left, leftIdCol, "id_a")
      .join(prep(right, rightIdCol, "id_b"), Seq("__k", "__bin"))
      .filter(col("__s_id_a") < col("__e_id_b") &&
        col("__s_id_b") < col("__e_id_a") &&
        col("__bin") === greatest(expr(s"__s_id_a DIV $binSec"),
          expr(s"__s_id_b DIV $binSec")))
      .select(col("id_a"), col("id_b"), col("__k").as(keyCol),
        (least(col("__e_id_a"), col("__e_id_b")) -
          greatest(col("__s_id_a"), col("__s_id_b"))).as("overlap_sec"))
  }
}
