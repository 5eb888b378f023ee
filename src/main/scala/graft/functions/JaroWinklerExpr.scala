package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Integer-exact Jaro–Winkler similarity in ppm (Jaro, JASA 1989;
  * Winkler, ASA Proc. 1990 — the census record-linkage comparator).
  * The classic definition, computed as an exact rational and floored
  * to ppm so the score is bit-identical on any engine:
  *
  *   jaro = (m/|a| + m/|b| + (m − t)/m) / 3, with the standard match
  *   window ⌊max/2⌋ − 1 and t = ⌊transposed matches / 2⌋ — the FLOORED
  *   count (the rapidfuzz convention DuckDB ships; the classic paper
  *   keeps the half, differing on odd counts — pinned in spec);
  *   jw = jaro + 0.1·L·(1 − jaro) for the common prefix L ≤ 4,
  *   boosted only when jaro > 0.7 (Winkler's threshold).
  *
  * Everything stays in BigInt rationals until the single final floor.
  * Operates on UTF-16
  * code units (= code points on the BMP; ASCII in the fixtures), and
  * raises loudly past 10k chars — the all-pairs verify stage this
  * expression exists for reads BLOCKED short keys (names, titles),
  * not documents.
  */
object JaroWinkler {
  def ppm(a: UTF8String, b: UTF8String): Long = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    require(l1 <= 10000 && l2 <= 10000,
      s"graft_jaro_winkler: strings past 10k chars ($l1, $l2) — block first")
    if (l1 == 0 && l2 == 0) return 1000000L
    if (l1 == 0 || l2 == 0) return 0L
    if (s1 == s2) return 1000000L
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // transposed positions: walk both matched subsequences in order
    var trans2 = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) trans2 += 1
        j += 1
      }
      i += 1
    }
    // floored transposition count (the rapidfuzz/DuckDB convention the
    // oracle computes — NOT the classic half-kept t), then
    // jaro = jn/jd exactly: (m/l1 + m/l2 + (m - t)/m) / 3
    val t = trans2 / 2
    val jn = BigInt(1L * m * m) * l2 + BigInt(1L * m * m) * l1 +
      BigInt(m.toLong - t) * l1 * l2
    val jd = BigInt(3L) * m * l1 * l2
    // common prefix, capped at 4
    var L = 0
    while (L < 4 && L < l1 && L < l2 && s1.charAt(L) == s2.charAt(L)) L += 1
    // Winkler boost only past jaro > 0.7
    val (n, d) =
      if (L > 0 && jn * 10 > jd * 7) ((BigInt(10 - L) * jn + BigInt(L) * jd), jd * 10)
      else (jn, jd)
    (n * 1000000 / d).toLong
  }
}

/** `graft_jaro_winkler(a, b)` — codegen'd scalar wrapper over
  * [[JaroWinkler.ppm]]; NULL if either side is NULL. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.ppm(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.ppm($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
