package graft.ingest

import org.apache.spark.sql.DataFrame

import graft.functions.TextNorm

/** Dynamic header discovery + column-name normalization — the driver-side
  * metadata program of the reference
  * (`/root/reference/autosinapi/core/processor.py:70-132`):
  * scan the first ≤20 rows of a headerless sheet, normalize every cell,
  * and pick the first row where ALL keywords appear (P1); then normalize
  * and standardize the column names (P2/P3).
  *
  * Header selection is metadata over a bounded prefix (HEADER_SEARCH_LIMIT
  * = 20 rows), so it runs on the driver — the distributed scan only starts
  * below the located header (see [[Staging]]).
  */
object HeaderLocator {

  /** P1: first row index (within `limit`) whose normalized cells contain
    * every normalized keyword as a substring of the joined row string
    * (processor.py:86-114). None = header not found — callers surface the
    * reference's error path (processor.py:175-178).
    */
  def locate(rows: Seq[Seq[String]], keywords: Seq[String], limit: Int = 20): Option[Int] = {
    val kws = keywords.map(TextNorm.normalizeCell)
    rows.take(limit).zipWithIndex.collectFirst {
      case (cells, i)
        if {
          val rowStr = cells.map(c => TextNorm.normalizeCell(Option(c).getOrElse(""))).mkString("_")
          kws.forall(rowStr.contains)
        } => i
    }
  }

  /** P2: normalize all column names (accent-strip + upper + `_`), made
    * unique with a positional suffix on clashes — pandas tolerates
    * duplicate column labels (processor.py:116-132), Spark does not.
    */
  def normalizedColumns(raw: Seq[String]): Seq[String] = {
    val base = raw.map(c => TextNorm.normalizeHeader(Option(c).getOrElse("")))
    val seen = scala.collection.mutable.Map.empty[String, Int]
    base.map { c =>
      val n = seen.getOrElse(c, 0)
      seen(c) = n + 1
      if (n == 0) c else s"${c}_$n"
    }
  }

  /** P3: rename through a config map, only for columns present
    * (processor.py:160-166, config.py:58-61). */
  def standardizeIds(df: DataFrame, idMap: Map[String, String]): DataFrame = {
    val present = idMap.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** W2 driver half: the two-row cost header
    * (processor.py:366-378). `ufRow` is the row ABOVE the keyword header:
    * keep only 2-letter alphabetic cells (F11), forward-fill across the
    * row, then fuse `{UF}_{subcol}` with the keyword row's names.
    */
  def fuseTwoRowHeader(ufRow: Seq[String], subRow: Seq[String]): Seq[String] = {
    val cleaned = ufRow.map { c =>
      val t = Option(c).getOrElse("").trim
      if (t.length == 2 && t.forall(_.isLetter)) Some(t.toUpperCase(java.util.Locale.ROOT)) else None
    }
    val ffilled = cleaned.scanLeft(Option.empty[String]) {
      case (prev, cur) => cur.orElse(prev)
    }.drop(1)
    normalizedColumns(
      subRow.zip(ffilled).map {
        case (sub, Some(uf)) => s"${uf}_${Option(sub).getOrElse("")}"
        case (sub, None)     => Option(sub).getOrElse("")
      })
  }
}
