package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** The reference's signature reshape: wide→long melt over UF (state)
  * columns (`/root/reference/autosinapi/core/processor.py:134-158`,
  * SURVEY §2.6 U1/U2). A UF value column is recognized purely
  * structurally — any 2-letter all-alphabetic column name
  * (processor.py:139-141, P10).
  *
  * Spark-first: `Dataset.unpivot` compiles to a single Expand node — one
  * pass over the input, no shuffle, stays inside whole-stage codegen.
  */
object UnpivotUf {

  /** P10: structural UF-column predicate over a column list. */
  def ufColumns(cols: Seq[String]): Seq[String] =
    cols.filter(c => c.length == 2 && c.forall(_.isLetter))

  /** U1: melt UF columns to (idVars..., uf, valueName).
    *
    * Semantics cloned from `_unpivot_data` (processor.py:134-158):
    *  - empty UF set → empty frame with the correct schema
    *    (processor.py:142-147), not an error;
    *  - null raw values dropped AFTER the melt (processor.py:154);
    *  - comma-decimal repair then numeric coercion — failures become
    *    null and are KEPT (errors="coerce", processor.py:155-157).
    */
  def unpivot(df: DataFrame, idVars: Seq[String], valueName: String): DataFrame = {
    val ufs = ufColumns(df.columns.toSeq.diff(idVars))
    if (ufs.isEmpty) {
      val schema = StructType(
        idVars.map(c => df.schema(c)) ++
          Seq(StructField("uf", StringType), StructField(valueName, Schemas.money)))
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[Row], schema)
    } else {
      df.unpivot(idVars.map(col).toArray, ufs.map(col).toArray, "uf", "__raw")
        .na.drop(Seq("__raw"))
        .withColumn(valueName, graft.functions.Coerce.toMoney(col("__raw")))
        .drop("__raw")
    }
  }

  /** U2: cost-sheet selective melt (processor.py:394-405) — from fused
    * `{UF}_CUSTO...` columns, keep those whose name contains `marker`
    * with a 2-letter alphabetic prefix, project idVars + those renamed
    * to the bare UF, then U1.
    */
  def unpivotFused(df: DataFrame, idVars: Seq[String], valueName: String,
                   marker: String = "CUSTO"): DataFrame = {
    val fused = df.columns.toSeq.collect {
      case c if c.length > 3 && c.charAt(2) == '_' &&
        c.take(2).forall(_.isLetter) && c.contains(marker) => c.take(2) -> c
    }
    val projected = df.select((idVars.map(col) ++ fused.map {
      case (uf, c) => col(c).as(uf)
    }): _*)
    unpivot(projected, idVars, valueName)
  }
}
