package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType}

import graft.model.Schemas

/** Coerce-don't-fail casts — the reference's `errors="coerce"` semantics
  * (SURVEY §1.2), which Spark 4's default ANSI mode would otherwise turn
  * into runtime errors. Centralized so every parse site in the engine
  * behaves identically regardless of the session's ansi setting.
  */
object Coerce {

  /** `pd.to_numeric(errors="coerce").astype("Int64")`: null on failure. */
  def toInt(c: Column): Column = c.try_cast(org.apache.spark.sql.types.IntegerType)

  /** Comma-decimal repair then exact NUMERIC parse, null on failure
    * (processor.py:240-243, F3). */
  def toMoney(c: Column): Column =
    regexp_replace(c.cast("string"), ",", ".").try_cast(Schemas.money)

  /** `pd.to_datetime(errors="coerce", format=fmt).dt.date` (F6):
    * null on failure — and strict about the shape (try_to_timestamp
    * rejects e.g. month 13 rather than wrapping). */
  def toDate(c: Column, fmt: String): Column =
    try_to_timestamp(c, lit(fmt)).cast(DateType)

  /** Generic null-on-failure cast. */
  def to(c: Column, dt: DataType): Column = c.try_cast(dt)
}
