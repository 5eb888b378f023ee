package graft.functions

import java.text.Normalizer

/** Text normalization semantics of the reference engine
  * (`/root/reference/autosinapi/core/processor.py:70-132`), reimplemented
  * as pure JVM string functions so they can be used from both driver-side
  * metadata code (header/column handling) and the codegen'd Catalyst
  * expression [[NormalizeTextExpr]].
  *
  * Two regimes exist in the reference and are deliberately NOT unified:
  *  - `cell`   (processor.py:73-84):  trim -> NFD-strip-marks -> upper ->
  *    each ' ' and '\n' to '_' -> drop [^A-Z0-9_]
  *  - `header` (processor.py:116-132): trim -> NFD-strip-marks -> upper ->
  *    runs of [\s\n]+ to a single '_' -> drop [^A-Z0-9_]
  */
object TextNorm {
  private def stripMarks(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Cell-mode normalization (single-space replacement).
    * Locale.ROOT: Python's str.upper() is locale-independent; the default
    * JVM locale (e.g. Turkish dotted-I) would silently diverge.
    */
  def normalizeCell(s: String): String = {
    val base = stripMarks(s.trim).toUpperCase(java.util.Locale.ROOT)
      .replace(' ', '_').replace('\n', '_')
    base.replaceAll("[^A-Z0-9_]", "")
  }

  /** Header/column-mode normalization (whitespace runs collapse).
    * `(?U)\s+` matches Unicode whitespace (NBSP, thin space, ...) like
    * Python's `re.sub(r"[\s\n]+", ...)` does; Java's plain `\s` is
    * ASCII-only and would drop e.g. U+00A0 instead of mapping it to '_'.
    */
  def normalizeHeader(s: String): String = {
    val base = stripMarks(s.trim).toUpperCase(java.util.Locale.ROOT)
      .replaceAll("(?U)\\s+", "_")
    base.replaceAll("[^A-Z0-9_]", "")
  }

  def normalize(s: String, header: Boolean): String =
    if (header) normalizeHeader(s) else normalizeCell(s)
}
