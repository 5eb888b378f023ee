package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — "for each left row, the most recent right row
  * at or before it" — the point-in-time lookup every event pipeline
  * needs (attribution: the error a click followed; feature stores: the
  * last metric reading before a label timestamp). Spark has no built-in
  * as-of operator; the naive spelling is a key-equality join with a
  * time-inequality predicate, which explodes to |left_k|·|right_k| rows
  * per key before a rank prunes it — quadratic in per-key density, the
  * classic range-join blowup.
  *
  * This implementation is the union-scan formulation instead: tag both
  * inputs, union them, and run ONE running `last(payload, ignoreNulls)`
  * window over each key's time-sorted rows. Right rows deposit their
  * payload; left rows read the latest deposit. Cost is a single shuffle
  * on the key plus one sort — O(|left| + |right|) rows end to end, no
  * pair fan-out, and AQE/skew handling applies to the one exchange.
  * (Same plan shape as q20's forward-fill: as-of join IS forward-fill
  * across two tagged sources.)
  */
object AsOfJoin {

  /** For every `left` row, attach `payload` of the last `right` row with
    * the same key and `right.rightTime <= left.leftTime` (nulls when no
    * right row precedes). Right-side ties at the same (key, time)
    * resolve to the row with the GREATEST `tiebreak` — deterministic on
    * any cluster layout.
    *
    * Payload columns come back as one struct snapshot of a single right
    * row (`asof_<name>`): independent per-column `last()` calls could
    * mix values from different right rows when payloads hold nulls.
    *
    * Key/time column types must already agree between the two inputs
    * (cast at the call site); output carries every `left` column
    * unchanged plus the `asof_*` payload.
    */
  def lastAtOrBefore(left: DataFrame, leftKey: String, leftTime: String,
                     right: DataFrame, rightKey: String, rightTime: String,
                     tiebreak: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val lCols = left.columns.toSeq
    val pType = StructType(payload.map(p => right.schema(p)))
    // src 0 = right, 1 = left: at equal timestamps the right row sorts
    // FIRST, so an exactly-coincident reading is visible (<=, not <).
    val lhs = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__src") +:
        lit(null).cast(right.schema(tiebreak).dataType).as("__tb") +:
        lit(null).cast(pType).as("__p") +:
        lCols.map(col): _*)
    val rhs = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__src") +:
        col(tiebreak).as("__tb") +:
        struct(payload.map(col): _*).as("__p") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // Left rows never deposit (__p is null under ignoreNulls), so their
    // relative order within a tie group cannot affect any output row.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__src").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.unionByName(rhs)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(lCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(s"asof_$p")): _*)
  }
}
